"""Arnoldi eigensolver with Krylov-Schur restart and CGS2 reorthogonalization.

Python orchestration over abstract vectors; the per-iteration vector algebra
(batched CGS2 Gram products, basis rotations) is single jitted calls over a
stacked basis buffer (see space.KrylovBasis). Dense algebra (Schur,
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
import jax.numpy as jnp

from .linop import AdjointOperator, LinearOperator
from .space import KrylovBasis, VectorSpace

logger = logging.getLogger("neklab_tpu.krylov")

Vector = Any


@dataclasses.dataclass
class EigsResult:
    eigvals: np.ndarray  # complex [nev]
    residuals: np.ndarray  # [nev]
    basis: KrylovBasis  # orthonormal Krylov basis (m+1 filled slots)
    eigvec_coeffs: np.ndarray  # complex [m, nev]: eigvec_i = sum_j coeffs[j,i] V[j]
    n_matvec: int
    converged: np.ndarray  # bool [nev]

    def eigenvectors(self) -> list[Vector]:
        m = self.eigvec_coeffs.shape[0]
        sub = KrylovBasis(self.basis.space, None, self.basis.kmax, _stack=self.basis.stack, _k=m)
        return sub.lincomb_many(self.eigvec_coeffs)


def _expand_krylov(
    op: LinearOperator,
    space: VectorSpace,
    V: KrylovBasis,
    H: np.ndarray,
    j0: int,
    j1: int,
    breakdown_tol: float = 1e-12,
    save_cb: Callable | None = None,
    conv_cb: Callable | None = None,
) -> tuple[int, int]:
    """Arnoldi expansion columns j0..j1-1 (V has j0+1 filled slots on entry).
    Returns (number of matvecs performed, columns now valid). save_cb(kfilled,
    n_mv_so_far) is invoked after each completed column (checkpoint hook).
    conv_cb(m) may return True to stop the expansion early once the projected
    problem of size m is converged — this is what saves the tail matvecs of a
    kdim=512 cycle when the wanted pairs converge at m << kdim (LightKrylov /
    ARPACK-style early termination)."""
    import jax

    n_mv = 0
    for j in range(j0, j1):
        w = op.matvec(V[j])
        n_mv += 1
        w, h = V.orthogonalize(w, passes=2)
        w, beta = space.normalize(w)
        if not (np.all(np.isfinite(h)) and np.isfinite(beta)):
            raise FloatingPointError(
                f"eigs: non-finite Arnoldi coefficients at column {j} — the "
                "operator returned NaN/Inf (corrupt device context?)")
        H[: j + 1, j] = h
        H[j + 1, j] = beta
        if beta < breakdown_tol:
            logger.info("Arnoldi breakdown at column %d (beta=%.3e)", j, beta)
            if space.rand_fn is None:
                V.append(w)
                return n_mv, j + 1
            w = space.rand(jax.random.PRNGKey(977 + j))
            w, _ = V.orthogonalize(w, passes=2)
            w, _ = space.normalize(w)
        V.append(w)
        if save_cb is not None:
            save_cb(j + 1, n_mv)
        if conv_cb is not None and j + 1 < j1 and conv_cb(j + 1):
            logger.info("eigs: early expansion stop at m=%d (< kdim=%d)", j + 1, j1)
            return n_mv, j + 1
    return n_mv, j1


def _save_krylov_state(path: str, V: KrylovBasis, H: np.ndarray, n_mv: int,
                       fingerprint: str = "") -> None:
    """Atomic serialization of the running Arnoldi factorization — the
    reference's Krylov restart-vector tier (SURVEY section 5, checkpoint
    tier 2; neklab_analysis.f90:80-81,327-330). Invariant: H columns
    0..V.k-2 are valid and V holds V.k slots."""
    import os

    import jax

    leaves = jax.tree_util.tree_leaves(V.stack)
    data = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    data["H"] = H
    data["vk"] = np.asarray(V.k)
    data["n_mv"] = np.asarray(n_mv)
    data["fingerprint"] = np.asarray(fingerprint)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **data)
    os.replace(tmp, path)


def _load_krylov_state(path: str, space: VectorSpace, template: Vector, kmax: int,
                       fingerprint: str = ""):
    """-> (V, H, n_mv) resuming a _save_krylov_state file."""
    import jax

    with np.load(path) as z:
        if "fingerprint" in z and str(z["fingerprint"]) != fingerprint:
            raise ValueError(
                f"checkpoint {path} fingerprint {z['fingerprint']!s} != expected "
                f"{fingerprint!r} (different solve — delete the stale file)"
            )
        template_stack = jax.tree_util.tree_map(
            lambda l: jnp.zeros((kmax,) + l.shape, l.dtype), template
        )
        leaves, treedef = jax.tree_util.tree_flatten(template_stack)
        new_leaves = []
        for i, l in enumerate(leaves):
            arr = z[f"leaf_{i}"]
            if arr.shape != l.shape:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected {l.shape} "
                    "(kdim or mesh changed?)"
                )
            new_leaves.append(jnp.asarray(arr, l.dtype))
        stack = jax.tree_util.tree_unflatten(treedef, new_leaves)
        H = np.asarray(z["H"])
        vk = int(z["vk"])
        n_mv = int(z["n_mv"])
    V = KrylovBasis(space, None, kmax, _stack=stack, _k=vk)
    return V, H, n_mv


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
    checkpoint: str | None = None,
    checkpoint_every: int = 8,
    tag: str = "",
    check_every: int = 8,
) -> EigsResult:
    """Largest-modulus eigenpairs of `op` by Krylov-Schur-restarted Arnoldi.

    maxiter counts restart cycles of dimension kdim. `callback(cycle, result)`
    is invoked after each cycle (the reference's write_intermediate hook).

    ACCURACY SEMANTICS: `tol` bounds the RITZ RESIDUAL ||A x - mu x|| / ||x||,
    not the eigenvalue error. For a non-normal operator the eigenvalue error
    is ~ kappa(mu) * residual, where kappa(mu) = 1/|<w, x>| is the eigenvalue
    condition number (left/right eigenvector angle). On e.g. the cylinder
    propagator kappa ~ 40, so hitting a 1e-4 oracle band requires
    tol <~ 1e-6, NOT 1e-5 (the round-3 adjoint parity lesson). The
    early-exit (check_every) and Schur locking paths commit only O(tol)
    perturbations — pinned by tests/test_krylov.py's non-normal
    locking/early-exit regression.

    check_every: test convergence of the projected problem every so many
    Arnoldi columns DURING expansion and stop the cycle early once all nev
    wanted pairs are converged (0 = only at kdim) — at kdim=512 with
    O(10^3)-step matvecs this is the difference between paying for 512 and
    for the ~m columns actually needed. Converged leading Schur blocks are
    additionally LOCKED at each restart (their residual couplings zeroed) so
    later cycles cannot un-converge them.

    checkpoint: path of a running Arnoldi-factorization checkpoint. If the
    file exists, the solve RESUMES from it (basis + H + matvec count); while
    running, the state is re-saved atomically every `checkpoint_every`
    Arnoldi columns and at every Krylov-Schur restart — so a long eigensolve
    (kdim x O(10^3)-step matvecs) killed mid-cycle loses at most
    checkpoint_every matvecs. The file records a problem fingerprint
    (kdim/nev/seed/`tag`) validated at resume, and is deleted ON SUCCESS
    ONLY, so a later solve can never silently resume stale state; a run that
    exhausts its restart budget unconverged KEEPS the file and can be
    resumed with a larger maxiter.
    Reference: the intermediate-spectrum / restart-basis tier
    (neklab_analysis.f90:80-81,327-330); this checkpoints the full
    factorization instead, which is strictly stronger.
    """
    if adjoint:
        op = AdjointOperator(op)
    import os

    import jax

    if v0 is None:
        v0 = space.rand(jax.random.PRNGKey(seed))
    v0, nrm = space.normalize(v0)
    if nrm == 0:
        raise ValueError("zero start vector")

    fp = f"eigs;kdim={kdim};nev={nev};which={which};seed={seed};tag={tag}"
    n_mv = 0
    if checkpoint is not None and os.path.exists(checkpoint):
        V, H, n_mv = _load_krylov_state(checkpoint, space, v0, kdim + 1, fingerprint=fp)
        k_active = V.k - 1
        logger.info(
            "eigs: resumed from %s (%d columns, %d matvecs so far)",
            checkpoint, k_active, n_mv,
        )
    else:
        V = KrylovBasis(space, v0, kdim + 1)
        V.append(v0)
        H = np.zeros((kdim + 1, kdim))
        k_active = 0  # currently valid columns of H

    def spectrum(m, H):
        """Ritz values/vectors + residuals of the m-column factorization."""
        S = H[:m, :m]
        b = H[m, :m]
        evals, evecs = np.linalg.eig(S)
        res = np.abs(b @ evecs) / np.maximum(np.linalg.norm(evecs, axis=0), 1e-300)
        order = np.argsort(-_sort_key(evals, which), kind="stable")
        return evals[order], res[order], evecs[:, order]

    for cycle in range(maxiter):
        save_cb = None
        if checkpoint is not None:
            # close over THIS cycle's (V, H, n_mv): V is rebound at restarts
            def save_cb(kfilled, mv_in_expand, _V=V, _H=H, _mv=n_mv):
                if checkpoint_every and kfilled % checkpoint_every == 0:
                    _save_krylov_state(checkpoint, _V, _H, _mv + mv_in_expand, fingerprint=fp)

        conv_cb = None
        if check_every:
            def conv_cb(m, _H=H):
                if m % check_every or m <= max(nev, 2):
                    return False
                _, res_s, _ = spectrum(m, _H)
                return bool(np.all(res_s[:nev] < tol))

        mv, m = _expand_krylov(op, space, V, H, k_active, kdim,
                               save_cb=save_cb, conv_cb=conv_cb)
        n_mv += mv
        evals_sorted, res_sorted, evecs_sorted = spectrum(m, H)
        conv = res_sorted[:nev] < tol
        result = EigsResult(
            eigvals=evals_sorted[:nev],
            residuals=res_sorted[:nev],
            basis=V,
            eigvec_coeffs=evecs_sorted[:, :nev],
            n_matvec=n_mv,
            converged=conv,
        )
        if callback is not None:
            callback(cycle, result)
        logger.info(
            "eigs cycle %d: m=%d, %d/%d converged, worst residual %.3e",
            cycle,
            m,
            int(conv.sum()),
            nev,
            float(res_sorted[:nev].max()),
        )
        if conv.all() or cycle == maxiter - 1 or m - 2 < 1:
            # m - 2 < 1: hard breakdown with rand_fn=None left a (near-)
            # invariant subspace too small to restart — the size-m spectrum
            # above IS the invariant-subspace result; return it rather than
            # building a degenerate compressed factorization.
            if checkpoint is not None:
                if conv.all():
                    # delete on success only: a run that exhausted its
                    # restart budget keeps its factorization on disk so it
                    # can be resumed with a larger maxiter (the kill-and-
                    # resume contract of the checkpoint tier)
                    if os.path.exists(checkpoint):
                        os.remove(checkpoint)
                else:
                    _save_krylov_state(checkpoint, V, H, n_mv, fingerprint=fp)
                    logger.info(
                        "eigs: UNCONVERGED at maxiter=%d — checkpoint kept at "
                        "%s for resume", maxiter, checkpoint)
            return result

        # ---- Krylov-Schur restart (with locking of converged blocks) ----
        S = H[:m, :m]
        b = H[m, :m]
        p = min(max(2 * nev, nev + 8), m - 2)
        keys = _sort_key(evals_sorted, which)
        thresh = keys[p - 1]

        if which == "lm":
            sel = lambda re, im: np.hypot(re, im) >= thresh * (1 - 1e-12)
        else:
            sel = lambda re, im: re >= thresh - 1e-12

        T, Q, sdim = scipy.linalg.schur(S, output="real", sort=sel)
        p_eff = int(sdim)
        if p_eff == 0 or p_eff >= m:
            p_eff = p

        # rotate basis: V_new[:p_eff] = V[:m] @ Q[:, :p_eff]; keep residual vec
        res_vec = V[m]
        Vm = KrylovBasis(space, None, V.kmax, _stack=V.stack, _k=m)
        V = Vm.rotated(Q[:, :p_eff])
        V.append(res_vec)
        bnew = b @ Q[:, :p_eff]

        # lock the leading converged invariant block: the largest prefix (cut
        # only at 2x2-block boundaries of the real Schur form) whose coupling
        # entries are all below tol. Zeroing commits an O(tol) perturbation
        # and deflates those pairs exactly for all later cycles.
        k_lock = 0
        for i in range(p_eff):
            if abs(bnew[i]) >= tol:
                break
            if i + 1 >= p_eff or abs(T[i + 1, i]) == 0.0:
                k_lock = i + 1
        if k_lock:
            bnew = bnew.copy()
            bnew[:k_lock] = 0.0
            logger.info("eigs: locked %d converged Schur columns", k_lock)

        H = np.zeros((kdim + 1, kdim))
        H[:p_eff, :p_eff] = T[:p_eff, :p_eff]
        H[p_eff, :p_eff] = bnew
        k_active = p_eff
        if checkpoint is not None:
            _save_krylov_state(checkpoint, V, H, n_mv, fingerprint=fp)

    raise RuntimeError("unreachable")
