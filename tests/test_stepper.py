"""Physics validation of the nonlinear and linearized steppers.

The reference validates its solver only end-to-end (SURVEY section 4); here
we add the unit layer: Taylor-Green exact-solution error, forced-channel
steady state, temporal convergence order, divergence-freeness, energy decay,
and the adjoint-consistency identity <Mu, v> = <u, M*v> that the reference
never tests (SURVEY build plan stage 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models import stokes
from neklab_tpu.models.linearized import LinConfig, make_adjoint_propagator, propagate
from neklab_tpu.models.navier_stokes import FlowConfig, advance, initial_state
from neklab_tpu.ops import sem


def _tg_mesh(order=7, nel=4):
    return box_mesh(
        (nel, nel),
        ((0, 2 * np.pi), (0, 2 * np.pi)),
        {"x-": "P", "x+": "P", "y-": "P", "y+": "P"},
        order=order,
    )


def _tg_u0(mesh):
    x, y = mesh.x[0], mesh.x[1]
    return jnp.stack([jnp.sin(x) * jnp.cos(y), -jnp.cos(x) * jnp.sin(y)])


def _rel_l2(mesh, a, b):
    return float(jnp.sqrt(sem.mass_dot(mesh, a - b, a - b) / sem.mass_dot(mesh, b, b)))


def test_taylor_green():
    mesh = _tg_mesh()
    nu = 0.05
    cfg = FlowConfig(viscosity=nu, dt=4e-3, vtol=1e-12, ptol=1e-12)
    u0 = _tg_u0(mesh)
    st = advance(mesh, cfg, initial_state(mesh, cfg, u=u0), 50)
    ue = u0 * np.exp(-2 * nu * float(st.time))
    assert _rel_l2(mesh, st.u, ue) < 5e-6
    # pressure: p = +1/4 (cos 2x + cos 2y) e^{-4 nu t}, zero mean
    x2 = sem.interp_nd(jnp.asarray(mesh.basis.j12), mesh.x[0], 2)
    y2 = sem.interp_nd(jnp.asarray(mesh.basis.j12), mesh.x[1], 2)
    pe = 0.25 * (jnp.cos(2 * x2) + jnp.cos(2 * y2)) * np.exp(-4 * nu * float(st.time))
    pe = stokes.remove_pressure_mean(mesh, pe)
    perr = float(jnp.max(jnp.abs(st.p - pe)))
    assert perr < 5e-4
    # discrete divergence-free
    assert float(jnp.max(jnp.abs(stokes.div_weak(mesh, st.u)))) < 1e-10


def test_temporal_convergence_bdf3():
    # self-convergence against a small-dt reference (the analytic solution is
    # not discretely divergence-free, which floors absolute comparisons at a
    # dt-independent projection distance)
    mesh = _tg_mesh(order=7)
    nu = 0.1
    u0 = _tg_u0(mesh)
    t_end = 0.3

    def run(nsteps):
        cfg = FlowConfig(viscosity=nu, dt=t_end / nsteps, vtol=1e-13, ptol=1e-13)
        return advance(mesh, cfg, initial_state(mesh, cfg, u=u0), nsteps)

    ref = run(160).u
    errs = [_rel_l2(mesh, run(n).u, ref) for n in (10, 20)]
    rate = np.log2(errs[0] / errs[1])
    # the BDF1/2 startup ramp limits the observable global order to ~2
    assert rate > 1.7, (errs, rate)


def test_forced_channel_steady():
    # periodic channel with f = (2 nu, 0): steady state u = (1 - y^2, 0)
    mesh = box_mesh(
        (3, 2),
        ((0, 2.0), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=6,
    )
    nu = 0.8

    def forcing(m, t, u, theta):
        f = jnp.zeros((2,) + m.bm1.shape, m.bm1.dtype)
        return f.at[0].set(2.0 * nu)

    # spin-up decay is e^{-nu (pi/2)^2 t}: need t ~ 9 for 1e-6
    cfg = FlowConfig(viscosity=nu, dt=2e-2, vtol=1e-12, ptol=1e-12, forcing_fn=forcing)
    st = advance(mesh, cfg, initial_state(mesh, cfg), 460)
    y = mesh.x[1]
    ue = jnp.stack([1 - y**2, 0 * y])
    assert _rel_l2(mesh, st.u, ue) < 1e-6


@pytest.mark.parametrize(
    "nscal", [0, pytest.param(1, marks=pytest.mark.slow)]
)
def test_adjoint_consistency(nscal):
    # <M u, v>_B = <u, M* v>_B to solver tolerance — including a coupled
    # Boussinesq-like scalar when nscal = 1
    mesh = box_mesh(
        (3, 2),
        ((0, 2 * np.pi), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=5,
    )
    shape = mesh.bm1.shape
    kwargs = {}
    if nscal:
        kwargs = dict(
            nscal=1,
            conductivity=(0.02,),
        )
    fc = FlowConfig(viscosity=0.01, dt=5e-3, vtol=1e-13, ptol=1e-13, ttol=1e-13, **kwargs)
    lin_f = None
    lin_s = None
    if nscal:
        lin_f = lambda m, u, th: jnp.stack([jnp.zeros_like(th[0]), th[0]])  # buoyancy
        lin_s = lambda m, u, th: u[1:2]  # stratification-like coupling
    cfg = LinConfig(flow=fc, lin_forcing_fn=lin_f, lin_source_fn=lin_s)
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    Th = jnp.broadcast_to(y, (nscal,) + shape) * 0.5

    def rf(key):
        u = mesh.vmask * sem.dsavg(mesh, jax.random.normal(key, (2,) + shape))
        t = mesh.tmask * sem.dsavg(mesh, jax.random.normal(key, (nscal,) + shape))
        return u, t

    u0, t0 = rf(jax.random.PRNGKey(0))
    v0, s0 = rf(jax.random.PRNGKey(1))
    nsteps = 7
    mu, mth = propagate(mesh, cfg, U, Th, u0, t0, nsteps)
    adj = make_adjoint_propagator(mesh, cfg, U, Th, nsteps)
    au, ath = adj(v0, s0)
    lhs = float(sem.mass_dot(mesh, mu, v0) + sem.mass_dot(mesh, mth, s0))
    rhs = float(sem.mass_dot(mesh, u0, au) + sem.mass_dot(mesh, t0, ath))
    assert abs(lhs - rhs) / abs(lhs) < 1e-9, (lhs, rhs)


def test_linearized_matches_nonlinear_difference():
    # M eps*u' ~ (Phi(U + eps u') - Phi(U)) / eps for small eps
    mesh = box_mesh(
        (3, 2),
        ((0, 2 * np.pi), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=5,
    )
    nu = 0.05
    # forcing that keeps U = (1-y^2, 0) steady
    def forcing(m, t, u, theta):
        f = jnp.zeros((2,) + m.bm1.shape, m.bm1.dtype)
        return f.at[0].set(2.0 * nu)

    fc = FlowConfig(viscosity=nu, dt=5e-3, vtol=1e-13, ptol=1e-13, forcing_fn=forcing)
    cfg = LinConfig(flow=fc)
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    th0 = jnp.zeros((0,) + mesh.bm1.shape)

    du = mesh.vmask * sem.dsavg(mesh, jax.random.normal(jax.random.PRNGKey(2), U.shape))
    nsteps = 10
    mu, _ = propagate(mesh, cfg, U, th0, du, th0, nsteps)

    eps = 1e-6
    s_base = advance(mesh, fc, initial_state(mesh, fc, u=U), nsteps)
    s_pert = advance(mesh, fc, initial_state(mesh, fc, u=U + eps * du), nsteps)
    fd = (s_pert.u - s_base.u) / eps
    err = _rel_l2(mesh, mu, fd)
    assert err < 1e-5, err


@pytest.mark.slow
def test_3d_forced_channel_steady():
    # full 3-D path: tensor kernels, P(N)/P(N-2) pressure, Helmholtz solves
    nu3 = 0.8
    mesh = box_mesh(
        (2, 2, 2), ((0, 2.0), (-1, 1), (0, 2.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W", "z-": "P", "z+": "P"},
        order=4,
    )

    def forcing(m, t, u, th):
        return jnp.zeros((3,) + m.bm1.shape, m.bm1.dtype).at[0].set(2.0 * nu3)

    from neklab_tpu.models.precond import build_e_preconditioner

    cfg = FlowConfig(viscosity=nu3, dt=2e-2, vtol=1e-12, ptol=1e-12, forcing_fn=forcing)
    pc = build_e_preconditioner(mesh, 2e-2 / (11 / 6))
    st = advance(mesh, cfg, initial_state(mesh, cfg), 460, pc_e=pc)
    y = mesh.x[1]
    ue = jnp.stack([1 - y**2, 0 * y, 0 * y])
    assert _rel_l2(mesh, st.u, ue) < 1e-6


@pytest.mark.slow
def test_advance_adaptive_variable_dt():
    """Variable-dt spin-up (setup_nek's variable-dt path,
    neklab_nek_setup.f90:159-191): hits endtime exactly, clamps per-chunk dt
    growth, and lands on the same steady state as the fixed-dt run."""
    import numpy as np
    import jax.numpy as jnp

    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.navier_stokes import (
        FlowConfig, advance, advance_adaptive, initial_state,
    )

    mesh = box_mesh(
        (3, 4), ((0.0, 2 * np.pi), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=4, dtype=jnp.float64,
    )
    nu = 0.05
    fc = FlowConfig(
        viscosity=nu, dt=0.02, vtol=1e-12, ptol=1e-12,
        forcing_fn=lambda m, t, u, th: jnp.stack(
            [2 * nu * jnp.ones_like(m.x[0]), jnp.zeros_like(m.x[0])]
        ),
    )
    y = mesh.x[1]
    st0 = initial_state(mesh, fc, u=mesh.vmask * jnp.stack([0.5 * (1 - y**2), 0 * y]))

    st = advance_adaptive(mesh, fc, st0, endtime=6.0, cfl=0.4, chunk=20)
    assert abs(float(st.time) - 6.0) < 1e-10
    # forced Poiseuille: u -> (1 - y^2); after t=6 the slowest mode has
    # decayed by exp(-nu (pi/2)^2 * 6) ~ 0.48 of the initial defect of 0.5
    exact = 1 - np.asarray(mesh.x[1]) ** 2
    err = np.abs(np.asarray(st.u[0]) - exact).max()
    ref = advance(mesh, fc, st0, 300)  # fixed dt 0.02 to the same time
    err_ref = np.abs(np.asarray(ref.u[0]) - exact).max()
    assert abs(err - err_ref) < 0.02 * max(err_ref, 1e-6), (err, err_ref)


def test_clamp_cfl_warns():
    from neklab_tpu.utils.timestep import clamp_cfl

    assert clamp_cfl(0.4) == 0.4
    assert clamp_cfl(0.9) == 0.5
    assert clamp_cfl(-1.0) == 0.5


def test_recycled_solves_match_plain():
    """E-solution recycling (Nek5000 residual projection, param(93-95)):
    recycle=k deflates each step's pressure solve against previous solutions
    but must reproduce the recycle-free map to SOLVER tolerance — linearized
    and nonlinear. The projection only improves the inner x0; the output is
    still the exact solve (custom_linear_solve semantics)."""
    mesh = box_mesh(
        (6, 5), ((0, 2 * np.pi), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=5,
    )
    y = mesh.x[1]
    base = jnp.stack([1 - y**2, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(0), (2,) + mesh.bm1.shape)
    fc = FlowConfig(viscosity=2e-3, dt=5e-3, vtol=1e-12, ptol=1e-10)
    cfg = LinConfig(flow=fc)
    a, _ = propagate(mesh, cfg, base, th, u0, th, 30)
    b, _ = propagate(mesh, cfg, base, th, u0, th, 30, recycle=6)
    scale = float(jnp.abs(a).max())
    assert float(jnp.abs(a - b).max()) < 1e-7 * scale

    un = mesh.vmask * (base + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (2,) + mesh.bm1.shape))
    st = initial_state(mesh, fc, u=un)
    s1 = advance(mesh, fc, st, 30)
    s2 = advance(mesh, fc, st, 30, recycle=6)
    assert float(jnp.abs(s1.u - s2.u).max()) < 1e-7 * float(jnp.abs(s1.u).max())
