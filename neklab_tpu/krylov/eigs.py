"""Arnoldi eigensolver with Krylov-Schur restart and CGS2 reorthogonalization.

Pure-Python orchestration over abstract vectors; dense algebra (Schur,
eigendecomposition of the projected matrix) is host-side numpy/scipy. Each
matvec is an arbitrarily expensive jitted computation (for the stability
framework: O(10^2-10^3) time steps of the linearized Navier-Stokes solver).

Reference parity: LightKrylov `eigs` as invoked at
/root/reference/src/neklab_analysis.f90:80-81 (kdim, transpose flag,
write_intermediate) — see SURVEY sections 1-2.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable

import numpy as np
import scipy.linalg

from .linop import AdjointOperator, LinearOperator
from .space import VectorSpace, tree_axpby, tree_scale

logger = logging.getLogger("neklab_tpu.krylov")

Vector = Any


def assemble_modes(basis: list[Vector], coeffs: np.ndarray) -> list[Vector]:
    """Linear combinations of basis vectors: out[i] = sum_j coeffs[j, i] V[j].

    coeffs may be complex; complex results are returned as pytrees with
    complex leaves (re/im splitting is the caller's concern).
    """
    import jax

    out = []
    for i in range(coeffs.shape[1]):
        acc = None
        for j, v in enumerate(basis):
            c = coeffs[j, i]
            if acc is None:
                acc = jax.tree_util.tree_map(lambda a: c * a, v)
            else:
                acc = jax.tree_util.tree_map(lambda a, b: a + c * b, acc, v)
        out.append(acc)
    return out


@dataclasses.dataclass
class EigsResult:
    eigvals: np.ndarray  # complex [nev]
    residuals: np.ndarray  # [nev]
    basis: list  # orthonormal Krylov basis V (len m+1)
    eigvec_coeffs: np.ndarray  # complex [m, nev]: eigvec_i = sum_j coeffs[j,i] V[j]
    n_matvec: int
    converged: np.ndarray  # bool [nev]

    def eigenvectors(self) -> list[Vector]:
        return assemble_modes(self.basis, self.eigvec_coeffs)


def _expand_krylov(
    op: LinearOperator,
    space: VectorSpace,
    V: list[Vector],
    H: np.ndarray,
    j0: int,
    j1: int,
    breakdown_tol: float = 1e-12,
) -> int:
    """Arnoldi expansion columns j0..j1-1. Returns number of matvecs done."""
    n_mv = 0
    for j in range(j0, j1):
        w = op.matvec(V[j])
        n_mv += 1
        w, h = space.orthogonalize_against(V[: j + 1], w, passes=2)
        w, beta = space.normalize(w)
        H[: j + 1, j] = h
        H[j + 1, j] = beta
        if beta < breakdown_tol:
            logger.info("Arnoldi breakdown at column %d (beta=%.3e)", j, beta)
            # happy breakdown: invariant subspace found; pad with random vector
            key_vec = space.rand(_np_key(j)) if space.rand_fn else None
            if key_vec is None:
                V.append(w)
                return n_mv
            key_vec, _ = space.orthogonalize_against(V[: j + 1], key_vec, passes=2)
            key_vec, _ = space.normalize(key_vec)
            w = key_vec
        V.append(w)
    return n_mv


def _np_key(i: int):
    import jax

    return jax.random.PRNGKey(977 + i)


def _select_p_largest(eigvals: np.ndarray, p: int, which: str) -> np.ndarray:
    mod = _sort_key(eigvals, which)
    order = np.argsort(-mod, kind="stable")
    return order[:p]


def _sort_key(ev: np.ndarray, which: str) -> np.ndarray:
    if which == "lm":
        return np.abs(ev)
    if which == "lr":
        return ev.real
    raise ValueError(which)


def eigs(
    op: LinearOperator,
    space: VectorSpace,
    nev: int,
    kdim: int = 128,
    tol: float = 1e-6,
    maxiter: int = 20,
    which: str = "lm",
    adjoint: bool = False,
    v0: Vector | None = None,
    callback: Callable | None = None,
    seed: int = 0,
) -> EigsResult:
    """Largest-modulus eigenpairs of `op` by Krylov-Schur-restarted Arnoldi.

    maxiter counts restart cycles of dimension kdim. `callback(cycle, result)`
    is invoked after each cycle (the reference's write_intermediate hook).
    """
    if adjoint:
        op = AdjointOperator(op)
    import jax

    if v0 is None:
        v0 = space.rand(jax.random.PRNGKey(seed))
    v0, nrm = space.normalize(v0)
    if nrm == 0:
        raise ValueError("zero start vector")

    V: list[Vector] = [v0]
    H = np.zeros((kdim + 1, kdim))
    k_active = 0  # current factorization size (columns of H filled)
    n_mv = 0

    for cycle in range(maxiter):
        n_mv += _expand_krylov(op, space, V, H, k_active, kdim)
        m = kdim
        S = H[:m, :m]
        b = H[m, :m]

        # Ritz values + residuals from the (possibly Krylov-Schur form) S
        evals, evecs = np.linalg.eig(S)
        res = np.abs(b @ evecs)  # residual norms per Ritz pair
        order = np.argsort(-_sort_key(evals, which), kind="stable")
        evals_sorted = evals[order]
        res_sorted = res[order]
        conv = res_sorted[:nev] < tol
        result = EigsResult(
            eigvals=evals_sorted[:nev],
            residuals=res_sorted[:nev],
            basis=V[: m + 1],
            eigvec_coeffs=evecs[:, order[:nev]],
            n_matvec=n_mv,
            converged=conv,
        )
        if callback is not None:
            callback(cycle, result)
        logger.info(
            "eigs cycle %d: %d/%d converged, worst residual %.3e",
            cycle,
            int(conv.sum()),
            nev,
            float(res_sorted[:nev].max()),
        )
        if conv.all() or cycle == maxiter - 1:
            return result

        # ---- Krylov-Schur restart ----
        p = min(max(2 * nev, nev + 8), kdim - 2)
        thresh_idx = _select_p_largest(evals, p, which)
        thresh = _sort_key(evals, which)[thresh_idx[-1]]

        if which == "lm":
            sel = lambda re, im: np.hypot(re, im) >= thresh * (1 - 1e-12)
        else:
            sel = lambda re, im: re >= thresh - 1e-12

        T, Q, sdim = scipy.linalg.schur(S, output="real", sort=sel)
        p_eff = int(sdim)
        if p_eff == 0 or p_eff >= m:
            p_eff = p  # fallback: no restart benefit, keep p leading anyway

        # rotate basis: V_new[:p_eff] = V[:m] @ Q[:, :p_eff]
        Vnew = assemble_modes(V[:m], Q[:, :p_eff])
        Vnew.append(V[m])  # residual vector stays
        bnew = b @ Q[:, :p_eff]

        H = np.zeros((kdim + 1, kdim))
        H[:p_eff, :p_eff] = T[:p_eff, :p_eff]
        H[p_eff, :p_eff] = bnew
        V = Vnew
        k_active = p_eff

    raise RuntimeError("unreachable")
