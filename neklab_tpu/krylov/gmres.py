"""Restarted GMRES over abstract vectors (host-orchestrated).

Used for (I - exptA) resolvent solves and Newton-Krylov Jacobian solves,
where each matvec is a full linearized-NS integration. Dense least-squares on
the projected Hessenberg is host-side numpy.

Reference parity: LightKrylov `gmres_rdp` with kdim=64, rtol=1e-6 defaults of
/root/reference/src/linops/resolvent.f90:113-131.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import numpy as np

from .linop import LinearOperator
from .space import KrylovBasis, VectorSpace, tree_axpby, tree_scale

logger = logging.getLogger("neklab_tpu.krylov")

Vector = Any


@dataclasses.dataclass
class GmresResult:
    x: Vector
    residual: float
    n_matvec: int
    converged: bool
    n_restart: int


def gmres(
    op: LinearOperator,
    b: Vector,
    space: VectorSpace,
    x0: Vector | None = None,
    kdim: int = 64,
    rtol: float = 1e-6,
    atol: float = 1e-12,
    max_restarts: int = 10,
    adjoint: bool = False,
) -> GmresResult:
    apply = (lambda v: op.rmatvec(v)) if adjoint else (lambda v: op.matvec(v))

    bnorm = space.norm(b)
    target = max(rtol * bnorm, atol)
    x = x0
    n_mv = 0

    for restart in range(max_restarts):
        if x is None:
            r = b
        else:
            ax = apply(x)
            n_mv += 1
            r = tree_axpby(1.0, b, -1.0, ax)
        beta = space.norm(r)
        if beta <= target:
            return GmresResult(
                x=x if x is not None else tree_scale(0.0, b),
                residual=beta,
                n_matvec=n_mv,
                converged=True,
                n_restart=restart,
            )
        v1 = tree_scale(1.0 / beta, r)
        V = KrylovBasis(space, v1, kdim + 1)
        V.append(v1)
        H = np.zeros((kdim + 1, kdim))
        ym = None
        m_used = 0
        res = beta
        for j in range(kdim):
            w = apply(V[j])
            n_mv += 1
            w, h = V.orthogonalize(w, passes=2)
            w, hnext = space.normalize(w)
            H[: j + 1, j] = h
            H[j + 1, j] = hnext
            V.append(w)
            m_used = j + 1
            # solve the (j+2) x (j+1) least squares for the current residual
            e1 = np.zeros(j + 2)
            e1[0] = beta
            ym, res2, *_ = np.linalg.lstsq(H[: j + 2, : j + 1], e1, rcond=None)
            res = float(np.linalg.norm(H[: j + 2, : j + 1] @ ym - e1))
            if res <= target or hnext < 1e-14:
                break
        # form the update x += V y
        sub = KrylovBasis(space, None, V.kmax, _stack=V.stack, _k=m_used)
        upd = sub.lincomb(ym[:m_used])
        x = upd if x is None else tree_axpby(1.0, x, 1.0, upd)
        logger.info("gmres restart %d: residual %.3e (target %.3e)", restart, res, target)
        if res <= target:
            return GmresResult(x=x, residual=res, n_matvec=n_mv, converged=True, n_restart=restart)

    return GmresResult(x=x, residual=res, n_matvec=n_mv, converged=False, n_restart=max_restarts)


def fgmres(
    op: LinearOperator,
    b: Vector,
    space: VectorSpace,
    precond=None,
    x0: Vector | None = None,
    kdim: int = 64,
    rtol: float = 1e-6,
    atol: float = 1e-12,
    max_restarts: int = 10,
    adjoint: bool = False,
) -> GmresResult:
    """Flexible GMRES (Saad): right-preconditioned with a preconditioner that
    may CHANGE between iterations (e.g. an inner iterative solve), so the
    preconditioned directions Z_j = M_j^{-1} V_j are stored alongside the
    Krylov basis and the update is x += Z y.

    precond: callable v -> M^{-1} v (possibly nonlinear/iteration-varying);
    None reduces to plain GMRES. Reference parity: LightKrylov `fgmres`,
    re-exported by the facade and imported by
    /root/reference/src/linops/resolvent.f90:3.
    """
    if precond is None:
        precond = lambda v: v
    apply = (lambda v: op.rmatvec(v)) if adjoint else (lambda v: op.matvec(v))

    bnorm = space.norm(b)
    target = max(rtol * bnorm, atol)
    x = x0
    n_mv = 0
    res = bnorm

    for restart in range(max_restarts):
        if x is None:
            r = b
        else:
            ax = apply(x)
            n_mv += 1
            r = tree_axpby(1.0, b, -1.0, ax)
        beta = space.norm(r)
        if beta <= target:
            return GmresResult(
                x=x if x is not None else tree_scale(0.0, b),
                residual=beta, n_matvec=n_mv, converged=True, n_restart=restart,
            )
        v1 = tree_scale(1.0 / beta, r)
        V = KrylovBasis(space, v1, kdim + 1)
        V.append(v1)
        Z = KrylovBasis(space, v1, kdim)
        H = np.zeros((kdim + 1, kdim))
        ym = None
        m_used = 0
        res = beta
        for j in range(kdim):
            z = precond(V[j])
            Z.append(z)
            w = apply(z)
            n_mv += 1
            w, h = V.orthogonalize(w, passes=2)
            w, hnext = space.normalize(w)
            H[: j + 1, j] = h
            H[j + 1, j] = hnext
            V.append(w)
            m_used = j + 1
            e1 = np.zeros(j + 2)
            e1[0] = beta
            ym, *_ = np.linalg.lstsq(H[: j + 2, : j + 1], e1, rcond=None)
            res = float(np.linalg.norm(H[: j + 2, : j + 1] @ ym - e1))
            if res <= target or hnext < 1e-14:
                break
        sub = KrylovBasis(space, None, Z.kmax, _stack=Z.stack, _k=m_used)
        upd = sub.lincomb(ym[:m_used])
        x = upd if x is None else tree_axpby(1.0, x, 1.0, upd)
        logger.info("fgmres restart %d: residual %.3e (target %.3e)", restart, res, target)
        if res <= target:
            return GmresResult(x=x, residual=res, n_matvec=n_mv, converged=True, n_restart=restart)

    return GmresResult(x=x, residual=res, n_matvec=n_mv, converged=False, n_restart=max_restarts)


def cg(
    op: LinearOperator,
    b: Vector,
    space: VectorSpace,
    x0: Vector | None = None,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    maxiter: int = 500,
) -> GmresResult:
    """Host-level conjugate gradient for SPD operators over abstract vectors.

    (The jit-internal CG used by the SEM implicit solves lives in
    neklab_tpu/models/solvers.py; this one exists for API parity with
    LightKrylov's `cg` export — /root/reference/src/neklab.f90:28-42.)
    """
    x = x0 if x0 is not None else tree_scale(0.0, b)
    ax = op.matvec(x)
    r = tree_axpby(1.0, b, -1.0, ax)
    p = r
    rz = space.dot(r, r)
    target = max(rtol * space.norm(b), atol)
    n_mv = 1
    for it in range(maxiter):
        if np.sqrt(rz) <= target:
            return GmresResult(x=x, residual=float(np.sqrt(rz)), n_matvec=n_mv, converged=True, n_restart=it)
        ap = op.matvec(p)
        n_mv += 1
        alpha = rz / space.dot(p, ap)
        x = tree_axpby(1.0, x, alpha, p)
        r = tree_axpby(1.0, r, -alpha, ap)
        rz_new = space.dot(r, r)
        p = tree_axpby(1.0, r, rz_new / rz, p)
        rz = rz_new
    return GmresResult(x=x, residual=float(np.sqrt(rz)), n_matvec=n_mv, converged=False, n_restart=maxiter)
