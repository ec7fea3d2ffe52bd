"""Optimally Time-Dependent (OTD) mode evolution.

Co-evolves r orthonormal perturbations with the (optionally unsteady) base
flow; the perturbation index is an embarrassingly parallel batch axis handled
by jax.vmap over the linearized step (SURVEY 2.3: lpert as batch axis).

Per chunk of `orthostep` steps (ONE jitted call):
  1. base flow: nonlinear step (if solve_baseflow) — perturbations linearize
     about the current base each step;
  2. perturbations: vmapped linearized steps with the rank-coupling forcing
     f_i = -sum_j (Lr_ji - Phi_ji) u_j refreshed every step;
  3. orthonormalization of the basis (Gram Cholesky, applied to the FULL
     state pytree incl. pressure/history — the reference's axpby touches the
     rst slots too, real_vectors.f90:125-206);
  4. reduced operator Lr_ij = <u_i, L u_j> with the frozen-LNS apply_L.

Reference parity: `nek_otd` + `otd_analysis`
(/root/reference/src/neklab_otd.f90, neklab_analysis.f90:214-344), including
the Ls.dat / Lr.dat spectra time series and `otd_opts` knobs.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from .mesh.core import SemMesh
from .models import stokes
from .models.linearized import LinConfig, PertState, pert_initial, step_lin
from .models.navier_stokes import _BDF, FlowConfig, FlowState, helmholtz_diag, step
from .ops import sem

logger = logging.getLogger("neklab_tpu.otd")


@dataclasses.dataclass(frozen=True)
class OtdOpts:
    """The reference's otd_opts (neklab_otd.f90:51-72)."""

    r: int = 2  # number of OTD modes (lpert)
    startstep: int = 1
    orthostep: int = 10  # re-orthonormalize every so many steps
    printstep: int = 10  # spectral analysis cadence (= chunk size here)
    iostep: int = 0  # outpost cadence (0 = never)
    solve_baseflow: bool = False
    trans: bool = False  # adjoint (transposed) OTD evolution


def apply_l(mesh: SemMesh, cfg: LinConfig, base_u, base_theta, st: PertState):
    """Frozen-coefficient linearized NS right-hand side L u (strong form):

      L u = Binv vmask dssum( -(v, U.grad u) - (v, u.grad U) - nu (grad v, grad u)
                              + (p, div v) + coupling forces )

    using the perturbation's own pressure (the reference's apply_L/apply_Lv,
    neklab_linops.f90:268-426, with `mappr`-style pressure term).
    """
    fc = cfg.flow
    n_u = -(
        sem.convect_volume_weak(mesh, st.u, base_u)
        + sem.convect_volume_weak(mesh, base_u, st.u)
    )
    if cfg.lin_forcing_fn is not None:
        n_u = n_u + mesh.bm1 * cfg.lin_forcing_fn(mesh, st.u, st.theta)
    visc = -fc.viscosity * jnp.stack([sem.stiffness_local(mesh, st.u[i]) for i in range(mesh.ndim)])
    gp = stokes.grad_weak_t(mesh, st.p)
    return mesh.vmask * mesh.binv * sem.dssum(mesh, n_u + visc + gp)


def _gram(mesh: SemMesh, a, b):
    """Gram matrix of mass dots between stacked field batches [r, ndim, ...]."""
    return jnp.einsum("ic...,jc...,c...->ij", a, b, mesh.bm1[None], precision="highest")


def _mass_dots(mesh, a, b):
    return jnp.einsum("ic...,jc...->ij", a * mesh.bm1[None, None], b, precision="highest")


def orthonormalize_states(mesh: SemMesh, states: PertState) -> PertState:
    """Cholesky-based orthonormalization of the batch (leading axis r) w.r.t.
    the velocity mass inner product; the whole state pytree is rotated."""
    g = _mass_dots(mesh, states.u, states.u)
    l = jnp.linalg.cholesky(g)
    linv = jax.scipy.linalg.solve_triangular(l, jnp.eye(g.shape[0], dtype=g.dtype), lower=True)
    rotate = lambda leaf: jnp.einsum("ij,j...->i...", linv, leaf)
    return jax.tree_util.tree_map(rotate, states)


@partial(jax.jit, static_argnames=("cfg", "opts", "ksteps", "ramp"))
def otd_chunk(
    mesh: SemMesh,
    cfg: LinConfig,
    opts: OtdOpts,
    base: FlowState,
    perts: PertState,
    ksteps: int,
    ramp: bool = False,
    ub=None,
    tb=None,
    pc_e=None,
    vdiag=None,
):
    """Advance base + r perturbations ksteps, orthonormalize, and return the
    reduced operator Lr. One compiled program per chunk. Set ramp=True for
    the FIRST chunk: BDF3 with cold (zero) history slots is violently
    unstable, so the first two steps run at orders 1 and 2."""
    fc = cfg.flow
    tmax = min(fc.torder, 3)
    g0 = _BDF[tmax][0]
    if vdiag is None:
        vdiag = helmholtz_diag(mesh, fc.viscosity, fc.rho * g0 / fc.dt, mesh.vmask)

    def lu_all(b_u, b_th, ps):
        return jax.vmap(lambda s: apply_l(mesh, cfg, b_u, b_th, s))(ps)

    def do_step(b, ps, order):
        lu = lu_all(b.u, b.theta, ps)
        lr = _mass_dots(mesh, ps.u, lu)
        forces = -jnp.einsum("ji,j...->i...", lr, ps.u)
        step_fn = lambda s, f: step_lin(
            mesh, cfg, s, b.u, b.theta, order=order, force=f, vdiag=vdiag, pc_e=pc_e
        )
        ps = jax.vmap(step_fn)(ps, forces)
        if opts.solve_baseflow:
            b = step(mesh, fc, b, order=order, ub=ub, tb=tb, vdiag=vdiag, pc_e=pc_e)
        return b, ps

    n_ramp = min(tmax - 1, ksteps) if ramp else 0
    for k in range(n_ramp):
        base, perts = do_step(base, perts, k + 1)

    def one_step(carry, _):
        b, ps = carry
        b, ps = do_step(b, ps, tmax)
        return (b, ps), None

    (base, perts), _ = jax.lax.scan(one_step, (base, perts), None, length=ksteps - n_ramp)
    perts = orthonormalize_states(mesh, perts)
    lu = lu_all(base.u, base.theta, perts)
    lr = _mass_dots(mesh, perts.u, lu)
    return base, perts, lr


def load_otd_ics(
    mesh: SemMesh,
    cfg: LinConfig,
    paths: list[str],
    r: int | None = None,
    seed: int = 7,
) -> PertState:
    """User-supplied OTD initial conditions from field files — the
    reference's `OTDIC_xx.fld` convention (neklab_otd.f90:118-204,
    n_usrIC > 0 branch): the first len(paths) modes come from the files
    (binary Nek .fld or this framework's .npz), any remaining of the r modes
    are randomized, and the whole basis is orthonormalized."""
    r = r if r is not None else len(paths)
    if len(paths) > r:
        raise ValueError(f"more IC files ({len(paths)}) than modes ({r})")
    us = []
    for p in paths:
        if p.endswith(".npz"):
            with np.load(p) as z:
                u = np.asarray(z["u"])
        else:
            from .utils.fldfile import read_fld

            u = read_fld(p).u
        if u is None or u.shape != (mesh.ndim,) + mesh.bm1.shape:
            raise ValueError(f"IC file {p}: expected velocity shaped "
                             f"{(mesh.ndim,) + mesh.bm1.shape}, got {None if u is None else u.shape}")
        us.append(jnp.asarray(u, mesh.bm1.dtype))
    if len(us) < r:
        key = jax.random.PRNGKey(seed)
        rnd = jax.random.normal(key, (r - len(us), mesh.ndim) + mesh.bm1.shape, mesh.bm1.dtype)
        us.extend(list(rnd))
    u = jnp.stack([mesh.vmask * sem.dsavg(mesh, ui) for ui in us])
    perts = jax.vmap(lambda ui: pert_initial(mesh, cfg, ui))(u)
    return orthonormalize_states(mesh, perts)


@dataclasses.dataclass
class OtdResult:
    base: FlowState
    perts: PertState
    lr_history: list  # (time, Lr) tuples
    eigvals_lr: np.ndarray  # spectrum of the final reduced operator
    eigvals_sym: np.ndarray  # spectrum of its symmetric part


def otd_analysis(
    mesh: SemMesh,
    cfg: LinConfig,
    opts: OtdOpts,
    base: FlowState,
    nsteps: int,
    init_perts: PertState | None = None,
    ub=None,
    tb=None,
    pc_e=None,
    outdir: str | None = None,
    seed: int = 7,
    ic_paths: list[str] | None = None,
) -> OtdResult:
    """The reference's otd_analysis driver loop (neklab_analysis.f90:214-344):
    random (or file-loaded, or given) orthonormal ICs, chunked evolution,
    Ls/Lr spectra logging. ic_paths: OTDIC-style field files (see
    load_otd_ics)."""
    fc = cfg.flow
    if init_perts is None and ic_paths:
        init_perts = load_otd_ics(mesh, cfg, ic_paths, r=opts.r, seed=seed)
    if init_perts is None:
        key = jax.random.PRNGKey(seed)
        u = jax.random.normal(key, (opts.r, mesh.ndim) + mesh.bm1.shape, mesh.bm1.dtype)
        u = jax.vmap(lambda f: mesh.vmask * sem.dsavg(mesh, f))(u)
        init_perts = jax.vmap(lambda ui: pert_initial(mesh, cfg, ui))(u)
        init_perts = orthonormalize_states(mesh, init_perts)

    perts = init_perts
    chunk = max(1, opts.printstep)
    done = 0
    lr_history = []
    f_ls = f_lr = None
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        f_ls = open(os.path.join(outdir, "Ls.dat"), "w")
        f_lr = open(os.path.join(outdir, "Lr.dat"), "w")
    try:
        while done < nsteps:
            k = min(chunk, nsteps - done)
            base, perts, lr = otd_chunk(
                mesh, cfg, opts, base, perts, k, ramp=(done == 0), ub=ub, tb=tb, pc_e=pc_e
            )
            done += k
            lr_np = np.asarray(lr)
            t = float(base.time)
            lr_history.append((t, lr_np))
            ev = np.sort_complex(np.linalg.eigvals(lr_np))[::-1]
            evs = np.sort(np.linalg.eigvalsh(0.5 * (lr_np + lr_np.T)))[::-1]
            if f_ls is not None:
                f_ls.write(" ".join(f"{v:.10e}" for v in evs) + f" {t:.6f}\n")
                f_lr.write(
                    " ".join(f"{v.real:.10e} {v.imag:.10e}" for v in ev) + f" {t:.6f}\n"
                )
            logger.info("otd t=%.4f: leading Re(eig Lr)=%.6f, sym=%.6f", t, ev[0].real, evs[0])
    finally:
        if f_ls is not None:
            f_ls.close()
            f_lr.close()
    lr_np = lr_history[-1][1]
    return OtdResult(
        base=base,
        perts=perts,
        lr_history=lr_history,
        eigvals_lr=np.sort_complex(np.linalg.eigvals(lr_np))[::-1],
        eigvals_sym=np.sort(np.linalg.eigvalsh(0.5 * (lr_np + lr_np.T)))[::-1],
    )
