"""Lanczos bidiagonalization SVD over abstract vectors (transient growth).

Golub-Kahan-Lanczos with full CGS2 reorthogonalization of both bases (stacked
buffers, batched Gram products), dense SVD of the projected bidiagonal matrix
on the host.

Reference parity: LightKrylov `svds` as used by
`transient_growth_analysis_fixed_point`
(/root/reference/src/neklab_analysis.f90:136, kdim up to 512).
Each iteration costs one matvec (forward linearized integration) plus one
rmatvec (adjoint integration) — SURVEY section 3.3.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any

import numpy as np

from .linop import LinearOperator
from .space import KrylovBasis, VectorSpace

logger = logging.getLogger("neklab_tpu.krylov")

Vector = Any


@dataclasses.dataclass
class SvdsResult:
    s: np.ndarray  # singular values [nsv], descending
    u_coeffs: np.ndarray  # [m, nsv] left singular vecs in U-basis
    v_coeffs: np.ndarray  # [m, nsv] right singular vecs in V-basis
    u_basis: KrylovBasis
    v_basis: KrylovBasis
    residuals: np.ndarray
    n_matvec: int

    def left_vectors(self) -> list[Vector]:
        m = self.u_coeffs.shape[0]
        sub = KrylovBasis(self.u_basis.space, None, self.u_basis.kmax, _stack=self.u_basis.stack, _k=m)
        return sub.lincomb_many(self.u_coeffs)

    def right_vectors(self) -> list[Vector]:
        m = self.v_coeffs.shape[0]
        sub = KrylovBasis(self.v_basis.space, None, self.v_basis.kmax, _stack=self.v_basis.stack, _k=m)
        return sub.lincomb_many(self.v_coeffs)


def _save_lanczos_state(path, U, V, alphas, betas, j, n_mv, fingerprint=""):
    """Atomic Lanczos-bidiagonalization checkpoint (both bases + couplings) —
    SURVEY section 5 checkpoint tier 2 for the kdim=512 transient-growth
    runs (neklab_analysis.f90:136)."""
    import os

    import jax

    data = {f"u_{i}": np.asarray(l) for i, l in enumerate(jax.tree_util.tree_leaves(U.stack))}
    data.update({f"v_{i}": np.asarray(l) for i, l in enumerate(jax.tree_util.tree_leaves(V.stack))})
    data.update(alphas=alphas, betas=betas, j=np.asarray(j), n_mv=np.asarray(n_mv),
                uk=np.asarray(U.k), vk=np.asarray(V.k),
                fingerprint=np.asarray(fingerprint))
    tmp = path + ".tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, path)


def _load_lanczos_state(path, space, template, kdim, fingerprint=""):
    import jax
    import jax.numpy as jnp

    with np.load(path) as z:
        if "fingerprint" in z and str(z["fingerprint"]) != fingerprint:
            raise ValueError(
                f"checkpoint {path} fingerprint {z['fingerprint']!s} != expected "
                f"{fingerprint!r} (different solve — delete the stale file)"
            )
        tstack = jax.tree_util.tree_map(
            lambda l: jnp.zeros((kdim + 1,) + l.shape, l.dtype), template
        )
        leaves, treedef = jax.tree_util.tree_flatten(tstack)
        u_leaves, v_leaves = [], []
        for i, l in enumerate(leaves):
            for arr, out in ((z[f"u_{i}"], u_leaves), (z[f"v_{i}"], v_leaves)):
                if arr.shape != l.shape:
                    raise ValueError(
                        f"checkpoint leaf {i} shape {arr.shape} != expected {l.shape} "
                        "(kdim or mesh changed?)"
                    )
                out.append(jnp.asarray(arr, l.dtype))
        U = KrylovBasis(space, None, kdim + 1,
                        _stack=jax.tree_util.tree_unflatten(treedef, u_leaves), _k=int(z["uk"]))
        V = KrylovBasis(space, None, kdim + 1,
                        _stack=jax.tree_util.tree_unflatten(treedef, v_leaves), _k=int(z["vk"]))
        return U, V, np.asarray(z["alphas"]), np.asarray(z["betas"]), int(z["j"]), int(z["n_mv"])


def svds(
    op: LinearOperator,
    space: VectorSpace,
    nsv: int,
    kdim: int = 64,
    tol: float = 1e-6,
    v0: Vector | None = None,
    seed: int = 0,
    checkpoint: str | None = None,
    checkpoint_every: int = 4,
    tag: str = "",
) -> SvdsResult:
    """Leading nsv singular triplets of `op` via Lanczos bidiagonalization.

    checkpoint: path for kill-and-resume state (saved atomically every
    `checkpoint_every` Lanczos iterations; resumed when the file exists, and
    deleted on successful completion so a later solve never silently resumes
    stale state). `tag` identifies the operator/problem in the checkpoint
    fingerprint (e.g. 'bfs_tau18')."""
    import os

    import jax

    if v0 is None:
        v0 = space.rand(jax.random.PRNGKey(seed))
    v, _ = space.normalize(v0)

    fp = f"svds;kdim={kdim};nsv={nsv};seed={seed};tag={tag}"
    V = KrylovBasis(space, v, kdim + 1)
    V.append(v)
    U: KrylovBasis | None = None
    alphas = np.zeros(kdim)
    betas = np.zeros(kdim)  # betas[j]: coupling A^T u_j -> v_{j+1}
    n_mv = 0
    j0 = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        U, V, alphas_l, betas_l, j0, n_mv = _load_lanczos_state(
            checkpoint, space, v, kdim, fingerprint=fp)
        m = min(len(alphas_l), kdim)
        alphas[:m] = alphas_l[:m]
        betas[:m] = betas_l[:m]
        logger.info("svds: resumed from %s (j=%d, %d matvecs)", checkpoint, j0, n_mv)

    def done(result):
        if checkpoint is not None and os.path.exists(checkpoint):
            os.remove(checkpoint)
        return result

    for j in range(j0, kdim):
        u = op.matvec(V[j])
        n_mv += 1
        if U is None:
            U = KrylovBasis(space, u, kdim + 1)
        u, _ = U.orthogonalize(u, passes=2)
        u, a = space.normalize(u)
        if not np.isfinite(a):
            raise FloatingPointError(
                f"svds: non-finite alpha at iteration {j} — the operator "
                "returned NaN/Inf (on flaky accelerators this is a corrupt "
                "device context; retry on a clean one)")
        alphas[j] = a
        U.append(u)

        w = op.rmatvec(U[j])
        n_mv += 1
        w, _ = V.orthogonalize(w, passes=2)
        w, b = space.normalize(w)
        if not np.isfinite(b):
            raise FloatingPointError(
                f"svds: non-finite beta at iteration {j} (see alpha guard)")
        betas[j] = b
        V.append(w)
        # progress heartbeat: each iteration is a fwd+adj integration pair
        # (O(10^3) steps each on production cases) — long-run monitoring and
        # the queue's stall watchdog both need a line per iteration
        logger.info("svds iter %d: alpha=%.6e beta=%.6e (%d matvecs)",
                    j, a, b, n_mv)

        if checkpoint is not None and checkpoint_every and (j + 1) % checkpoint_every == 0:
            _save_lanczos_state(checkpoint, U, V, alphas, betas, j + 1, n_mv, fingerprint=fp)

        if j + 1 >= max(nsv, 2):
            B = _bidiag(alphas[: j + 1], betas[:j])
            ub, s, _ = np.linalg.svd(B)
            res = betas[j] * np.abs(ub[-1, :nsv])
            if np.all(res[: min(nsv, len(s))] < tol * max(s[0], 1e-30)):
                logger.info("svds converged at m=%d", j + 1)
                return done(_finalize(U, V, alphas[: j + 1], betas[: j + 1], nsv, n_mv))

    # kdim exhausted without meeting tol: KEEP the checkpoint (delete on
    # success only — the factorization cost kdim fwd+adj integrations and
    # must survive for resume/inspection; ADVICE r3)
    if checkpoint is not None and U is not None:
        _save_lanczos_state(checkpoint, U, V, alphas, betas, kdim, n_mv, fingerprint=fp)
    return _finalize(U, V, alphas, betas, nsv, n_mv)


def _bidiag(alphas: np.ndarray, betas: np.ndarray) -> np.ndarray:
    """Projected matrix U^T A V: upper bidiagonal.

    Recurrences: A v_j = beta_{j-1} u_{j-1} + alpha_j u_j  (exact),
                 A^T u_j = alpha_j v_j + beta_j v_{j+1},
    so B[j, j] = alpha_j and B[j-1, j] = beta_{j-1}.
    """
    B = np.diag(alphas)
    for j in range(len(betas)):
        B[j, j + 1] = betas[j]
    return B


def _finalize(U, V, alphas, betas, nsv, n_mv) -> SvdsResult:
    """alphas: len m; betas: len m (betas[m-1] is the residual coupling)."""
    m = len(alphas)
    B = _bidiag(alphas, betas[: m - 1])
    ub, s, vbt = np.linalg.svd(B)
    nsv_eff = min(nsv, m)
    res = (betas[m - 1] if len(betas) >= m else 0.0) * np.abs(ub[-1, :nsv_eff])
    return SvdsResult(
        s=s[:nsv_eff],
        u_coeffs=ub[:, :nsv_eff],
        v_coeffs=vbt.T[:, :nsv_eff],
        u_basis=U,
        v_basis=V,
        residuals=res,
        n_matvec=n_mv,
    )
