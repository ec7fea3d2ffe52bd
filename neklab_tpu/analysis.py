"""Top-level analysis drivers — the framework's public API.

Mirrors /root/reference/src/neklab_analysis.f90:31-34:
  linear_stability_analysis_fixed_point   (:38-105)
  transient_growth_analysis_fixed_point   (:107-156)
  newton_fixed_point_iteration            (:158-212)
  otd_analysis                            (:214-344)
plus the resolvent frequency sweep the reference drives from user code
(examples/cylinder/resolvent, examples/back_fstep/gramian).

Each driver logs through the standard logging module (the reference's
dual-channel LightKrylov logger + rank-0 stdout, SURVEY section 5) and writes
the same structured outputs: *_eigenspectrum.npy, singular_spectrum.dat.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any

import numpy as np

from .krylov import eigs, newton, svds
from .krylov.linop import LinearOperator
from .krylov.space import VectorSpace
from .linops.exponential_propagator import ExponentialPropagator
from .utils.timers import timer

logger = logging.getLogger("neklab_tpu.analysis")


class _TimedOp(LinearOperator):
    """Wrap an operator so every (r)matvec lands in the hierarchical timers —
    the reference wraps every driver/operator in LightKrylov timers with an
    exit report (neklab_analysis.f90:66-67,97-101; SURVEY section 5)."""

    def __init__(self, op, name: str):
        self._op = op
        self._name = name

    def matvec(self, x):
        with timer(f"{self._name}/matvec"):
            return self._op.matvec(x)

    def rmatvec(self, x):
        with timer(f"{self._name}/rmatvec"):
            return self._op.rmatvec(x)


def _finalize_timers(outdir: str | None):
    """Driver-exit timer report (the reference's timer%finalize +
    lightkrylov_tmr.log flush)."""
    report = timer.report()
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "timers.log"), "w") as f:
            f.write(report + "\n")


@dataclasses.dataclass
class StabilityResult:
    eigvals: np.ndarray  # continuous-time: log(mu)/tau
    multipliers: np.ndarray  # discrete mu
    residuals: np.ndarray
    eigenvectors: list
    n_matvec: int
    elapsed: float


def linear_stability_analysis_fixed_point(
    exptA: ExponentialPropagator,
    space: VectorSpace,
    kdim: int = 128,
    nev: int = 8,
    tol: float = 1e-6,
    adjoint: bool = False,
    maxiter: int = 30,
    outdir: str | None = None,
    seed: int = 1234,
    checkpoint: str | None = None,
    checkpoint_every: int = 8,
    check_every: int = 8,
) -> StabilityResult:
    """Arnoldi/Krylov-Schur eigensolve of exp(tau A); eigenvalues mapped back
    by lambda = log(mu)/tau (neklab_analysis.f90:84). checkpoint: Arnoldi
    kill-and-resume state file; check_every: early-exit cadence (krylov.eigs —
    note tol is a RESIDUAL tolerance; eigenvalue error ~ kappa(mu) * tol)."""
    t0 = time.time()
    prefix = "adj" if adjoint else "dir"

    def cb(cycle, result):
        if outdir:
            _save_spectrum(outdir, prefix, result.eigvals, exptA.tau, intermediate=cycle)

    with timer(f"{prefix}_stability"):
        res = eigs(
            _TimedOp(exptA, "exptA"),
            space,
            nev=nev,
            kdim=kdim,
            tol=tol,
            maxiter=maxiter,
            which="lm",
            adjoint=adjoint,
            callback=cb,
            seed=seed,
            checkpoint=checkpoint,
            checkpoint_every=checkpoint_every,
            check_every=check_every,
        )
    lam = np.log(res.eigvals.astype(complex)) / exptA.tau
    elapsed = time.time() - t0
    _finalize_timers(outdir)
    logger.info(
        "%s stability: %d matvecs, %.1fs; leading lambda = %s",
        prefix,
        res.n_matvec,
        elapsed,
        lam[0],
    )
    eigenvectors = res.eigenvectors()
    if outdir:
        _save_spectrum(outdir, prefix, res.eigvals, exptA.tau)
        # outpost eigenvector fields (re/im split) — the reference's
        # outpost_dnek(eigvecs) at neklab_analysis.f90:93
        from .utils.io import outpost

        for i, v in enumerate(eigenvectors):
            fields = {}
            for name, leaf in v.items():
                arr = np.asarray(leaf)
                if np.iscomplexobj(arr):
                    fields[name + "_re"] = arr.real
                    fields[name + "_im"] = arr.imag
                else:
                    fields[name] = arr
            outpost(outdir, fields, prefix=prefix, case="mode", counter=i + 1)
    return StabilityResult(
        eigvals=lam,
        multipliers=res.eigvals,
        residuals=res.residuals,
        eigenvectors=eigenvectors,
        n_matvec=res.n_matvec,
        elapsed=elapsed,
    )


def _save_spectrum(outdir, prefix, mus, tau, intermediate=None):
    os.makedirs(outdir, exist_ok=True)
    lam = np.log(mus.astype(complex)) / tau
    name = f"{prefix}_eigenspectrum.npy"
    np.save(os.path.join(outdir, name), np.stack([lam.real, lam.imag]))


@dataclasses.dataclass
class NewtonFPResult:
    x: Any
    residual_norm: float
    converged: bool
    iterations: int
    history: list
    elapsed: float


def newton_fixed_point_iteration(
    system,
    x0,
    space: VectorSpace,
    tol: float = 1e-6,
    maxiter: int = 40,
    scheduler: str = "dynamic",
    gmres_kdim: int = 64,
    outdir: str | None = None,
    callback=None,
) -> NewtonFPResult:
    """Newton-Krylov base-flow (or UPO) computation
    (neklab_analysis.f90:158-212; defaults maxiter=40, tol=1e-6,
    schedulers nek_constant_tol / nek_dynamic_tol)."""
    from .krylov import constant_tol, dynamic_tol
    from .krylov import newton as newton_solver

    t0 = time.time()
    sched = dynamic_tol(tol) if scheduler == "dynamic" else constant_tol(tol)
    with timer("newton_fixed_point"):
        res = newton_solver(
            system,
            x0,
            space,
            tol=tol,
            maxiter=maxiter,
            scheduler=sched,
            gmres_kdim=gmres_kdim,
            callback=callback,
        )
    elapsed = time.time() - t0
    _finalize_timers(outdir)
    logger.info(
        "newton: converged=%s |F|=%.3e in %d its (%.1fs)",
        res.converged,
        res.residual_norm,
        res.iterations,
        elapsed,
    )
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "residual.dat"), "w") as f:
            for i, r in enumerate(res.history):
                f.write(f"{i} {r:.12e}\n")
    return NewtonFPResult(
        x=res.x,
        residual_norm=res.residual_norm,
        converged=res.converged,
        iterations=res.iterations,
        history=res.history,
        elapsed=elapsed,
    )


@dataclasses.dataclass
class TransientGrowthResult:
    sigma: np.ndarray  # singular values of exp(tau A) = sqrt(max energy growth)
    optimal_inputs: list  # right singular vectors (optimal perturbations)
    optimal_outputs: list  # left singular vectors (responses)
    residuals: np.ndarray
    n_matvec: int
    elapsed: float


def transient_growth_analysis_fixed_point(
    exptA: ExponentialPropagator,
    space: VectorSpace,
    kdim: int = 64,
    nsv: int = 4,
    tol: float = 1e-6,
    outdir: str | None = None,
    seed: int = 1234,
    checkpoint: str | None = None,
    checkpoint_every: int = 4,
) -> TransientGrowthResult:
    """Lanczos SVD of exp(tau A): optimal transient energy growth
    (neklab_analysis.f90:107-156; each iteration = forward + adjoint solve).
    checkpoint: Lanczos kill-and-resume state file (see krylov.svds)."""
    t0 = time.time()
    with timer("transient_growth"):
        res = svds(
            _TimedOp(exptA, "exptA"), space, nsv=nsv, kdim=kdim, tol=tol, seed=seed,
            checkpoint=checkpoint, checkpoint_every=checkpoint_every,
        )
    elapsed = time.time() - t0
    _finalize_timers(outdir)
    logger.info("transient growth: sigma = %s (%d matvecs, %.1fs)", res.s, res.n_matvec, elapsed)
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        with open(os.path.join(outdir, "singular_spectrum.dat"), "w") as f:
            for i, (s, r) in enumerate(zip(res.s, res.residuals)):
                f.write(f"{i + 1} {s:.12e} {r:.3e}\n")
    return TransientGrowthResult(
        sigma=res.s,
        optimal_inputs=res.right_vectors(),
        optimal_outputs=res.left_vectors(),
        residuals=res.residuals,
        n_matvec=res.n_matvec,
        elapsed=elapsed,
    )
