"""`.par` runtime-parameter file reader (Nek5000/reference INI schema).

Parses the reference's case files (sections GENERAL / PROBLEMTYPE / PRESSURE
/ VELOCITY / TEMPERATURE, case-insensitive keys, `userParamXX` passthrough —
SURVEY section 5 config tier 2) and maps them onto a FlowConfig, so reference
cases can be driven with their original configuration files.

Nek conventions honored: negative viscosity/conductivity means 1/|value|
(Reynolds/Peclet number input); stopAt = numSteps|endTime; timeStepper=bdfN.
"""

from __future__ import annotations

import configparser
import dataclasses
from typing import Any

from ..models.navier_stokes import FlowConfig


def parse_par(path: str) -> dict[str, dict[str, str]]:
    cp = configparser.ConfigParser(inline_comment_prefixes=("#", ";"))
    cp.optionxform = str.lower  # case-insensitive keys
    with open(path) as f:
        cp.read_string(f.read())
    return {sec.lower(): {k.lower(): v.strip() for k, v in cp[sec].items()} for sec in cp.sections()}


def _coef(value: str) -> float:
    """Nek sign convention: negative input means reciprocal."""
    v = float(value)
    return 1.0 / abs(v) if v < 0 else v


@dataclasses.dataclass
class ParCase:
    """Parsed case parameters (config + run-control the config doesn't own)."""

    config: FlowConfig
    nsteps: int | None
    end_time: float | None
    start_from: str | None
    user_params: dict[int, float]
    n_perturbations: int
    equation: str
    target_cfl: float | None
    write_interval: float | None


def load_par(path: str, **overrides: Any) -> ParCase:
    par = parse_par(path)
    gen = par.get("general", {})
    vel = par.get("velocity", {})
    pres = par.get("pressure", {})
    temp = par.get("temperature", {})
    prob = par.get("problemtype", {})

    nscal = 1 if temp else 0
    kwargs: dict[str, Any] = dict(
        viscosity=_coef(vel.get("viscosity", "1.0")),
        rho=float(vel.get("density", "1.0")),
        dt=float(gen.get("dt", "1e-3")),
        vtol=float(vel.get("residualtol", "1e-8")),
        ptol=float(pres.get("residualtol", "1e-6")),
        nscal=nscal,
    )
    if nscal:
        kwargs["conductivity"] = (_coef(temp.get("conductivity", "1.0")),)
        kwargs["ttol"] = float(temp.get("residualtol", "1e-8"))
    ts = gen.get("timestepper", "bdf3").lower()
    if ts.startswith("bdf"):
        kwargs["torder"] = int(ts[3:])
    kwargs.update(overrides)
    cfg = FlowConfig(**kwargs)

    user = {}
    for k, v in gen.items():
        if k.startswith("userparam"):
            user[int(k[len("userparam"):])] = float(v)

    stop_at = gen.get("stopat", "numsteps").lower()
    nsteps = int(float(gen["numsteps"])) if "numsteps" in gen and stop_at == "numsteps" else None
    end_time = float(gen["endtime"]) if "endtime" in gen and stop_at == "endtime" else None
    start = gen.get("startfrom", "0")
    start_from = None if start in ("0", "") else start

    return ParCase(
        config=cfg,
        nsteps=nsteps,
        end_time=end_time,
        start_from=start_from,
        user_params=user,
        n_perturbations=int(prob.get("numberofperturbations", "0") or 0),
        equation=prob.get("equation", "incompns").lower(),
        target_cfl=float(gen["targetcfl"]) if "targetcfl" in gen else None,
        write_interval=float(gen["writeinterval"]) if "writeinterval" in gen else None,
    )
