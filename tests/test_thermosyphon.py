"""Thermosyphon (annular natural-convection loop) integration test.

Reference analog: examples/thermosyphon/baseflow (annulus, buoyancy
f_y = Pr Ra theta, wall temperature 0.5(1 + tanh(-20 y)) — hot bottom / cold
top, tsyphon.usr userbc/userf; Pr = 0.2, Ra = 510). Pipeline: time
integration -> Newton-Krylov steady convecting state -> eigensolve, with the
discrete-adjoint identity checked on the curved + thermally coupled system."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neklab_tpu.analysis import (
    linear_stability_analysis_fixed_point,
    newton_fixed_point_iteration,
)
from neklab_tpu.linops.exponential_propagator import ExponentialPropagator
from neklab_tpu.mesh.cylinder import annulus_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig, advance, initial_state
from neklab_tpu.models.precond import build_e_preconditioner
from neklab_tpu.ops import sem
from neklab_tpu.systems.fixed_point import FixedPointSystem
from neklab_tpu.vectors import flow_vector, flow_vector_space

PR = 0.2
RA = 510.0


def _setup():
    mesh = annulus_mesh(
        3, 12, r_in=0.6, r_out=1.0, order=4, grading=1.0,
        outer_bc="W", bc_temp=("t", "t"),
    )
    fc = FlowConfig(
        viscosity=PR, dt=5e-3, nscal=1, conductivity=(1.0,),
        vtol=1e-11, ptol=1e-10, ttol=1e-11,
        forcing_fn=lambda m, t, u, th: jnp.stack(
            [jnp.zeros_like(th[0]), PR * RA * th[0]]
        ),
    )
    cfg = LinConfig(
        flow=fc,
        lin_forcing_fn=lambda m, u, th: jnp.stack(
            [jnp.zeros_like(th[0]), PR * RA * th[0]]
        ),
    )
    tb = jnp.stack([0.5 * (1.0 + jnp.tanh(-20.0 * mesh.x[1]))])
    return mesh, cfg, tb


@pytest.mark.slow
def test_thermosyphon_base_flow_and_spectrum():
    mesh, cfg, tb = _setup()
    fc = cfg.flow
    pc = build_e_preconditioner(mesh, fc.dt / (11 / 6))
    st = initial_state(mesh, fc, theta=tb * mesh.tmask + (1 - mesh.tmask) * tb)
    st = advance(mesh, fc, st, 400, tb=tb, pc_e=pc)
    assert bool(jnp.isfinite(st.u).all())
    # buoyancy must have started a convective circulation
    assert float(jnp.max(jnp.abs(st.u))) > 1e-3

    sysm = FixedPointSystem(mesh, cfg, tau=0.3, tb=tb, dt=fc.dt)
    space = flow_vector_space(mesh, 1)
    x0 = flow_vector(mesh, 1, u=st.u, theta=st.theta)
    res = newton_fixed_point_iteration(sysm, x0, space, tol=1e-8, maxiter=12, gmres_kdim=25)
    assert res.converged, res.residual_norm

    base_u, base_th = res.x["u"], res.x["theta"]
    expA = ExponentialPropagator(mesh, cfg, base_u, base_th, tau=0.3, dt=fc.dt)
    eres = linear_stability_analysis_fixed_point(
        expA, space, kdim=24, nev=2, tol=1e-6, maxiter=10
    )
    assert eres.residuals.max() < 1e-6
    # the Newton-converged state is a genuine steady state: lambda_1 finite
    assert np.isfinite(eres.eigvals[0].real)

    # exact discrete adjoint on the curved, thermally coupled operator
    v = space.rand_fn(jax.random.PRNGKey(3))
    w = space.rand_fn(jax.random.PRNGKey(4))
    mv = expA.matvec(v)
    lhs = space.dot(mv, w)
    rhs = space.dot(v, expA.rmatvec(w))
    scale = space.norm(mv) * space.norm(w) + 1e-300
    assert abs(lhs - rhs) / scale < 1e-6
