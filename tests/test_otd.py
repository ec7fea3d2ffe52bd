"""OTD mode evolution test: for a steady base flow the OTD subspace converges
to the span of the leading eigenvectors and eig(Lr) to the leading
eigenvalues of the linearized operator (here: the analytic Poiseuille shear
modes -nu (m pi/2)^2; the m=1,2 modes lead at Re=100, the OS pair is third).

Analog of the reference's examples/poiseuille/OTD_steady case (SURVEY 3.5)
with an analytic oracle instead of eyeballed plots."""

import numpy as np
import pytest
import jax.numpy as jnp

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig, initial_state
from neklab_tpu.otd import OtdOpts, apply_l, otd_analysis
from neklab_tpu.models.linearized import pert_initial
from neklab_tpu.ops import sem

RE = 100.0


def _setup(order):
    mesh = box_mesh(
        (3, 4), ((0, 2 * np.pi), (-1, 1)), {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=order,
    )
    fc = FlowConfig(viscosity=1 / RE, dt=0.06, vtol=1e-11, ptol=1e-11)
    return mesh, LinConfig(flow=fc)


def test_apply_l_rayleigh_quotient():
    mesh, cfg = _setup(order=5)
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape)
    umode = jnp.stack([jnp.cos(np.pi * y / 2), 0 * y])
    st = pert_initial(mesh, cfg, umode)
    lu = apply_l(mesh, cfg, U, th, st)
    rq = float(sem.mass_dot(mesh, umode, lu) / sem.mass_dot(mesh, umode, umode))
    assert abs(rq - (-(1 / RE) * (np.pi / 2) ** 2)) < 1e-10


@pytest.mark.slow
def test_otd_converges_to_leading_modes():
    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    base = initial_state(mesh, cfg.flow, u=jnp.stack([1 - y**2, 0 * y]))
    opts = OtdOpts(r=2, printstep=100, solve_baseflow=False)
    res = otd_analysis(mesh, cfg, opts, base, nsteps=2600)
    lam = np.sort(res.eigvals_lr.real)[::-1]
    exact = np.array([-(1 / RE) * (np.pi / 2) ** 2, -(1 / RE) * np.pi**2])
    assert abs(lam[0] - exact[0]) < 5e-4, (lam, exact)
    assert abs(lam[1] - exact[1]) < 5e-3, (lam, exact)
    # reduced operators were logged every chunk
    assert len(res.lr_history) == 26


def test_otd_file_ics(tmp_path):
    """OTDIC-style file initial conditions: .fld and .npz inputs populate the
    first modes; the rest are randomized; the basis comes back orthonormal."""
    import jax
    import jax.numpy as jnp

    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.linearized import LinConfig
    from neklab_tpu.models.navier_stokes import FlowConfig
    from neklab_tpu.otd import _mass_dots, load_otd_ics
    from neklab_tpu.utils.fldfile import write_fld

    mesh = box_mesh(
        (4, 4), ((0.0, 2 * np.pi), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=4,
    )
    cfg = LinConfig(flow=FlowConfig(viscosity=1e-2, dt=1e-2))
    y = mesh.x[1]
    u1 = mesh.vmask * jnp.stack([jnp.sin(mesh.x[0]) * (1 - y**2), 0 * y])
    f1 = str(tmp_path / "OTDIC_01.f00001")
    write_fld(f1, mesh=mesh, u=u1, wdsize=8)
    f2 = str(tmp_path / "OTDIC_02.npz")
    u2 = mesh.vmask * jnp.stack([0 * y, jnp.cos(mesh.x[0]) * (1 - y**2)])
    np.savez(f2, u=np.asarray(u2))

    perts = load_otd_ics(mesh, cfg, [f1, f2], r=3)
    g = np.asarray(_mass_dots(mesh, perts.u, perts.u))
    assert np.allclose(g, np.eye(3), atol=1e-10)
    # first mode spans the file IC (same direction after normalization)
    v = np.asarray(perts.u[0]).ravel()
    w = np.asarray(u1).ravel()
    cos = abs(v @ w) / (np.linalg.norm(v) * np.linalg.norm(w) + 1e-30)
    assert cos > 0.99


def test_apply_l_trans_is_exact_adjoint():
    """<L u, v>_B = <u, L* v>_B for the frozen-LNS operator with zero
    pressure (the pressure term keeps the input's own pressure by
    construction, matching apply_L(trans=.true.),
    /root/reference/src/neklab_otd.f90:98-116)."""
    import jax

    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    u = mesh.vmask * sem.dsavg(mesh, jax.random.normal(k1, U.shape, U.dtype))
    v = mesh.vmask * sem.dsavg(mesh, jax.random.normal(k2, U.shape, U.dtype))
    su, sv = pert_initial(mesh, cfg, u), pert_initial(mesh, cfg, v)
    lu = apply_l(mesh, cfg, U, th, su, trans=False)
    ltv = apply_l(mesh, cfg, U, th, sv, trans=True)
    a = float(sem.mass_dot(mesh, lu, v))
    b = float(sem.mass_dot(mesh, u, ltv))
    assert abs(a - b) < 1e-11 * max(abs(a), 1.0), (a, b)


@pytest.mark.slow
def test_otd_trans_spectrum_matches_direct():
    """For a steady base flow the adjoint OTD subspace converges to the
    leading ADJOINT eigenvalues — identical to the direct ones for this
    normal (pure shear-diffusion) leading pair."""
    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    base = initial_state(mesh, cfg.flow, u=jnp.stack([1 - y**2, 0 * y]))
    opts = OtdOpts(r=2, printstep=100, solve_baseflow=False, trans=True)
    res = otd_analysis(mesh, cfg, opts, base, nsteps=2600)
    lam = np.sort(res.eigvals_lr.real)[::-1]
    exact = np.array([-(1 / RE) * (np.pi / 2) ** 2, -(1 / RE) * np.pi**2])
    assert abs(lam[0] - exact[0]) < 5e-4, (lam, exact)


def test_otd_outpost_restart_and_cadences(tmp_path):
    """iostep writes one Nek field file per projected mode; iorststep writes a
    restart checkpoint; a killed run resumed from it reproduces the
    uninterrupted Lr trajectory exactly."""
    from neklab_tpu.otd import load_otd_restart
    from neklab_tpu.utils.fldfile import read_fld

    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    base = initial_state(mesh, cfg.flow, u=jnp.stack([1 - y**2, 0 * y]))
    opts = OtdOpts(r=2, printstep=10, orthostep=5, iostep=20, iorststep=20,
                   solve_baseflow=False)
    out_a = str(tmp_path / "full")
    res_full = otd_analysis(mesh, cfg, opts, base, nsteps=40, outdir=out_a, seed=11)

    # mode files: m01/m02 at steps 20 and 40
    import os

    modes = sorted(f for f in os.listdir(out_a) if f.startswith("m0"))
    assert modes == ["m01otd0.f00001", "m01otd0.f00002", "m02otd0.f00001", "m02otd0.f00002"]
    f = read_fld(os.path.join(out_a, "m01otd0.f00001"))
    assert f.u.shape == (2,) + mesh.bm1.shape
    # restart checkpoints at 20 and 40
    rsts = sorted(f for f in os.listdir(out_a) if f.startswith("rst"))
    assert rsts == ["rstotd0.f00001.npz", "rstotd0.f00002.npz"]

    # interrupted run: first 20 steps, then resume from checkpoint
    out_b = str(tmp_path / "part")
    otd_analysis(mesh, cfg, opts, base, nsteps=20, outdir=out_b, seed=11)
    res_resumed = otd_analysis(
        mesh, cfg, opts, base, nsteps=20, outdir=out_b, seed=11,
        restart=os.path.join(out_b, "rstotd0.f00001.npz"),
    )
    lr_full = res_full.lr_history[-1][1]
    lr_res = res_resumed.lr_history[-1][1]
    assert np.allclose(lr_full, lr_res, atol=1e-12), (lr_full, lr_res)


@pytest.mark.slow
def test_otd_startstep_defers_evolution():
    """startstep > 1 advances the base alone first (reference gate at
    neklab_analysis.f90:255-257): with solve_baseflow the base time moves,
    and the OTD trajectory matches running the pre-advanced base directly."""
    mesh, cfg = _setup(order=4)
    y = mesh.x[1]
    base = initial_state(mesh, cfg.flow, u=jnp.stack([1 - y**2, 0 * y]))
    ub = (1 - mesh.vmask[0]) * 0.0  # homogeneous walls
    opts = OtdOpts(r=2, printstep=10, startstep=6, solve_baseflow=True)
    res = otd_analysis(mesh, cfg, opts, base, nsteps=15, seed=5)
    # 15 total steps: 5 base-only + 10 OTD; one Lr record at the end
    assert abs(float(res.base.time) - 15 * cfg.flow.dt) < 1e-12
    assert len(res.lr_history) == 1
