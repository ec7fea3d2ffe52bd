"""Newton fixed-point and UPO system tests.

Reference analogs: examples/cylinder/newton (Re40 fixed point, Re180 UPO);
at unit-test scale: recover the forced-channel steady state by Newton-Krylov
with quadratic convergence, and check the UPO bordered Jacobian (exact jvp
monodromy + period derivative + phase condition) against finite differences
and its own adjoint."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neklab_tpu.analysis import newton_fixed_point_iteration
from neklab_tpu.krylov.space import tree_axpby
from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig
from neklab_tpu.ops import sem
from neklab_tpu.systems.fixed_point import FixedPointSystem
from neklab_tpu.systems.periodic_orbit import PeriodicOrbitSystem
from neklab_tpu.vectors import ext_flow_vector, ext_flow_vector_space, flow_vector, flow_vector_space

NU = 0.1


def _channel(order=5):
    mesh = box_mesh(
        (3, 2), ((0, 2.0), (-1, 1)), {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=order
    )

    def forcing(m, t, u, th):
        return jnp.zeros((2,) + m.bm1.shape, m.bm1.dtype).at[0].set(2.0 * NU)

    fc = FlowConfig(viscosity=NU, dt=0.02, vtol=1e-12, ptol=1e-12, forcing_fn=forcing)
    return mesh, LinConfig(flow=fc)


@pytest.mark.slow
def test_newton_fixed_point():
    mesh, cfg = _channel()
    sys = FixedPointSystem(mesh, cfg, tau=0.5, dt=0.025)
    y = mesh.x[1]
    guess = jnp.stack([0.7 * (1 - y**2), 0 * y]) + 0.05 * mesh.vmask * sem.dsavg(
        mesh, jax.random.normal(jax.random.PRNGKey(1), (2,) + mesh.bm1.shape)
    )
    x0 = flow_vector(mesh, 0, u=mesh.vmask * sem.dsavg(mesh, guess))
    space = flow_vector_space(mesh, 0)
    res = newton_fixed_point_iteration(sys, x0, space, tol=1e-9, maxiter=10, gmres_kdim=20)
    assert res.converged
    assert res.iterations <= 5
    ue = jnp.stack([1 - y**2, 0 * y])
    err = float(jnp.sqrt(sem.mass_dot(mesh, res.x["u"] - ue, res.x["u"] - ue)))
    assert err < 1e-8
    # quadratic-ish convergence tail
    h = res.history
    assert h[-1] < 1e-3 * h[-2]


def test_newton_exact_jacobian():
    mesh, cfg = _channel()
    sys = FixedPointSystem(mesh, cfg, tau=0.4, dt=0.025, exact_jacobian=True)
    y = mesh.x[1]
    x0 = flow_vector(mesh, 0, u=jnp.stack([0.8 * (1 - y**2), 0 * y]))
    space = flow_vector_space(mesh, 0)
    res = newton_fixed_point_iteration(sys, x0, space, tol=1e-9, maxiter=8, gmres_kdim=20)
    assert res.converged


@pytest.mark.slow
def test_upo_jacobian_fd_consistency():
    mesh, cfg = _channel(order=4)
    y = mesh.x[1]
    sys = PeriodicOrbitSystem(mesh, cfg, t_guess=0.3, nsteps=10)
    space = ext_flow_vector_space(mesh, 0)
    x = ext_flow_vector(
        mesh, 0, u=mesh.vmask * sem.dsavg(mesh, jnp.stack([0.9 * (1 - y**2), 0.02 * jnp.sin(np.pi * y)])), T=0.3
    )
    x["u"] = mesh.vmask * sem.dsavg(mesh, x["u"])
    jac = sys.jacobian(x)
    dx = space.rand(jax.random.PRNGKey(5))
    jv = jac.matvec(dx)
    eps = 1e-6
    fp = sys.response(tree_axpby(1.0, x, eps, dx))
    f0 = sys.response(x)
    fd_u = (fp["u"] - f0["u"]) / eps
    num = float(jnp.sqrt(sem.mass_dot(mesh, jv["u"] - fd_u, jv["u"] - fd_u)))
    den = float(jnp.sqrt(sem.mass_dot(mesh, fd_u, fd_u)))
    assert num / den < 1e-5, num / den
    # adjoint identity on the bordered operator
    w = space.rand(jax.random.PRNGKey(6))
    lhs = space.dot(jv, w)
    rhs = space.dot(dx, jac.rmatvec(w))
    assert abs(lhs - rhs) / abs(lhs) < 1e-8, (lhs, rhs)
