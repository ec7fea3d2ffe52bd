"""Backward-facing-step case: multi-block mesh + transient growth.

Reference analog: examples/back_fstep/transient_growth (tau=18, nsv=4,
kdim=512 at production scale — SURVEY 3.3) at unit-test size, with
self-consistency oracles: svds vs. power iteration on M*M, and the
triplet identity."""

import numpy as np
import pytest
import jax.numpy as jnp

from neklab_tpu.analysis import transient_growth_analysis_fixed_point
from neklab_tpu.krylov.space import tree_axpby
from neklab_tpu.linops.exponential_propagator import ExponentialPropagator
from neklab_tpu.mesh.bfs import bfs_inflow, bfs_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig, advance, initial_state
from neklab_tpu.models.precond import build_e_preconditioner
from neklab_tpu.ops import sem
from neklab_tpu.vectors import flow_vector_space


@pytest.mark.slow
def test_bfs_transient_growth():
    mesh = bfs_mesh(li=2, lo=8, nel_li=2, nel_lo=6, nel_y_in=2, nel_y_step=2, order=5)
    re = 200.0
    dt = 0.02
    fc = FlowConfig(viscosity=1 / re, dt=dt, vtol=1e-11, ptol=1e-10)
    cfg = LinConfig(flow=fc)
    pc = build_e_preconditioner(mesh, dt / (11 / 6))
    ub = bfs_inflow(mesh)
    st = initial_state(mesh, fc, u=mesh.vmask * ub + (1 - mesh.vmask) * ub)
    st = advance(mesh, fc, st, 600, ub=ub, pc_e=pc)  # near-steady base flow

    expA = ExponentialPropagator(mesh, cfg, st.u, tau=2.0, dt=dt)
    space = flow_vector_space(mesh, 0)
    res = transient_growth_analysis_fixed_point(expA, space, kdim=14, nsv=2, tol=1e-8)
    # shear flows amplify: optimal gain above 1 even though the flow is stable
    assert res.sigma[0] > 1.0
    assert res.sigma[0] >= res.sigma[1] > 0
    # triplet identity M v1 = s1 u1
    mv = expA.matvec(res.optimal_inputs[0])
    diff = tree_axpby(1.0, mv, -float(res.sigma[0]), res.optimal_outputs[0])
    assert np.sqrt(space.dot(diff, diff)) < 1e-6 * res.sigma[0]
    # power-iteration cross-check of sigma_1^2 = ||M* M||
    import jax
    v = space.rand(jax.random.PRNGKey(3))
    for _ in range(12):
        v, _ = space.normalize(v)
        v = expA.rmatvec(expA.matvec(v))
    lam = space.norm(v)
    assert abs(np.sqrt(lam) - res.sigma[0]) < 5e-2 * res.sigma[0], (np.sqrt(lam), res.sigma[0])
