"""Field I/O: checkpoint/restart and result outposting.

Replaces the reference stack's `.f0000x` field files + `load_fld`/`outpost`
(SURVEY section 5 checkpoint tier 1; neklab_utils.f90:305-361) with
compressed npz archives carrying the fields, coordinates, and metadata.
File naming mirrors the reference's 3-char-prefix + counter convention:
<prefix><case>0.f<NNNNN>.npz.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import numpy as np
import jax.numpy as jnp


def _counter_name(outdir: str, prefix: str, case: str, counter: int | None) -> str:
    if counter is None:
        counter = 1
        while os.path.exists(os.path.join(outdir, f"{prefix}{case}0.f{counter:05d}.npz")):
            counter += 1
    return os.path.join(outdir, f"{prefix}{case}0.f{counter:05d}.npz")


def outpost(
    outdir: str,
    fields: dict[str, Any],
    mesh=None,
    prefix: str = "   ",
    case: str = "run",
    counter: int | None = None,
    time: float = 0.0,
) -> str:
    """Write a field file (the reference's outpost_dnek/outpost_nek).

    fields: name -> array (e.g. {'u': ..., 'p': ..., 'theta': ...}).
    """
    os.makedirs(outdir, exist_ok=True)
    path = _counter_name(outdir, prefix.strip() or "out", case, counter)
    data = {k: np.asarray(v) for k, v in fields.items() if v is not None}
    data["__time__"] = np.asarray(time)
    if mesh is not None:
        data["__x__"] = np.asarray(mesh.x)
    np.savez_compressed(path, **data)
    return path


def load_field_file(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def save_checkpoint(path: str, state, extra: dict | None = None) -> str:
    """Serialize a FlowState/PertState pytree dataclass to npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = {}
    for f in dataclasses.fields(state):
        data[f.name] = np.asarray(getattr(state, f.name))
    for k, v in (extra or {}).items():
        data["x_" + k] = np.asarray(v)
    np.savez_compressed(path, **data)
    return path


def load_checkpoint(path: str, template) -> Any:
    """Load into the same dataclass type as `template` (shapes must match)."""
    with np.load(path) as z:
        kwargs = {}
        for f in dataclasses.fields(template):
            arr = z[f.name]
            ref = getattr(template, f.name)
            kwargs[f.name] = jnp.asarray(arr, ref.dtype)
        return dataclasses.replace(template, **kwargs)


def save_spectrum(path: str, eigvals: np.ndarray) -> None:
    """`save_eigenspectrum` parity: stacked [re, im] rows (.npy)."""
    ev = np.asarray(eigvals, dtype=complex)
    np.save(path, np.stack([ev.real, ev.imag]))


def load_spectrum(path: str) -> np.ndarray:
    a = np.load(path)
    return a[0] + 1j * a[1]
