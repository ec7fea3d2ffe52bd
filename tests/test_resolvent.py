"""Resolvent operator tests: analytic Stokes oracle + exact Hermitian adjoint.

The reference has no resolvent unit tests (only example sweeps,
examples/back_fstep/gramian); here: (1) matvec against the closed-form
Stokes resolvent (i w - A)^{-1} f = f / (i w + nu k^2) for a solenoidal
Fourier mode; (2) the Hermitian adjoint identity Re<Rf,g> = Re<f,R*g> on a
wall-bounded shear flow (no neutral modes — the period-map algorithm is
singular at e^{lambda tau} = 1 resonances, an intrinsic property shared with
the reference's time-domain algorithm)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neklab_tpu.linops.resolvent import Resolvent, complex_pair_space
from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig


@pytest.mark.slow
def test_stokes_resolvent_oracle():
    mesh = box_mesh(
        (3, 3), ((0, 2 * np.pi), (0, 2 * np.pi)),
        {"x-": "P", "x+": "P", "y-": "P", "y+": "P"}, order=6,
    )
    nu = 0.1
    cfg = LinConfig(flow=FlowConfig(viscosity=nu, dt=1.0, vtol=1e-12, ptol=1e-12))
    U = jnp.zeros((2,) + mesh.bm1.shape)
    omega = 1.3
    R = Resolvent(mesh, cfg, U, omega=omega, dt=0.02, gmres_rtol=1e-10)
    x, y = mesh.x[0], mesh.x[1]
    fmode = jnp.stack([jnp.sin(x) * jnp.cos(y), -jnp.cos(x) * jnp.sin(y)])  # |k|^2 = 2
    zero = jnp.zeros((0,) + mesh.bm1.shape)
    f = {"re": {"u": fmode, "theta": zero}, "im": {"u": 0 * fmode, "theta": zero}}
    xhat = R.matvec(f)
    expect = 1.0 / (1j * omega + nu * 2.0)
    nrm = float(jnp.sum(fmode * fmode * mesh.bm1))
    got_re = float(jnp.sum(xhat["re"]["u"] * fmode * mesh.bm1)) / nrm
    got_im = float(jnp.sum(xhat["im"]["u"] * fmode * mesh.bm1)) / nrm
    assert abs(got_re - expect.real) < 2e-4 * abs(expect)
    assert abs(got_im - expect.imag) < 2e-4 * abs(expect)


@pytest.mark.slow
def test_resolvent_hermitian_adjoint():
    mesh = box_mesh(
        (3, 2), ((0, 2 * np.pi), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=5,
    )
    cfg = LinConfig(flow=FlowConfig(viscosity=0.02, dt=1.0, vtol=1e-13, ptol=1e-13))
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    R = Resolvent(mesh, cfg, U, omega=1.0, dt=0.05, gmres_rtol=1e-11)
    space = complex_pair_space(mesh, 0)
    f = space.rand(jax.random.PRNGKey(1))
    g = space.rand(jax.random.PRNGKey(2))
    lhs = space.dot(R.matvec(f), g)
    rhs = space.dot(f, R.rmatvec(g))
    assert abs(lhs - rhs) / abs(lhs) < 1e-7, (lhs, rhs)


def test_resolvent_prebuilt_pc_matches():
    """A Resolvent given a prebuilt (dt-invariant) preconditioner must give
    the same response as one that builds its own — PCG is invariant to the
    scalar dt-scaling of the preconditioner (the gramian sweep relies on
    this to build once for 15 frequencies)."""
    from neklab_tpu.models.precond import build_e_preconditioner

    mesh = box_mesh(
        (3, 3), ((0, 2 * np.pi), (0, 2 * np.pi)),
        {"x-": "P", "x+": "P", "y-": "P", "y+": "P"}, order=5,
    )
    nu = 0.1
    cfg = LinConfig(flow=FlowConfig(viscosity=nu, dt=1.0, vtol=1e-11, ptol=1e-11))
    U = jnp.zeros((2,) + mesh.bm1.shape)
    x, y = mesh.x[0], mesh.x[1]
    fmode = jnp.stack([jnp.sin(x) * jnp.cos(y), -jnp.cos(x) * jnp.sin(y)])
    zero = jnp.zeros((0,) + mesh.bm1.shape)
    f = {"re": {"u": fmode, "theta": zero}, "im": {"u": 0 * fmode, "theta": zero}}
    pc1 = build_e_preconditioner(mesh, 1.0)  # arbitrary scale
    Ra = Resolvent(mesh, cfg, U, omega=1.3, dt=0.05, gmres_rtol=1e-9)
    Rb = Resolvent(mesh, cfg, U, omega=1.3, dt=0.05, gmres_rtol=1e-9, pc_e=pc1)
    xa = Ra.matvec(f)
    xb = Rb.matvec(f)
    for part in ("re", "im"):
        da = np.asarray(xa[part]["u"])
        db = np.asarray(xb[part]["u"])
        assert np.abs(da - db).max() < 1e-7 * max(np.abs(da).max(), 1e-30)
