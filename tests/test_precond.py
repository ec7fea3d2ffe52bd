"""Two-level E preconditioner: aggregated-coarse scalability tier.

The dense per-element coarse inverse is O(nel^2) memory; above
coarse_max_dense the coarse space switches to RCB aggregates (the role of
Nek's semg_xxt hierarchy — SURVEY 2.2 hard part 1). These tests pin (a) the
aggregate path is numerically a working preconditioner at a >=20k-element
mesh without O(nel^2) memory, and (b) it matches the dense path's quality
class on a mesh where both fit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models import stokes
from neklab_tpu.models.precond import build_e_preconditioner
from neklab_tpu.models.solvers import pcg_info


def _e_iters(mesh, pc, dt_over_g0, tol=1e-8):
    eop = lambda q: stokes.e_op(mesh, q, dt_over_g0)
    rhs = jax.random.normal(jax.random.PRNGKey(0), mesh.bm2.shape, mesh.bm2.dtype)
    rhs = rhs - jnp.mean(rhs)  # consistent RHS for the pure-Neumann operator
    pre = (lambda r: pc.apply(r) - jnp.mean(pc.apply(r))) if pc is not None else None

    @jax.jit
    def run():
        x, k, rr = pcg_info(eop, rhs, precond=pre, tol=tol, maxiter=4000)
        return k, rr

    k, rr = run()
    return int(k), float(rr)


def test_aggregated_coarse_matches_dense_quality():
    """On a mesh where both tiers fit, the aggregated coarse (forced by a
    tiny ceiling) must still produce near-dense iteration counts."""
    mesh = box_mesh((16, 16), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=4)
    dt_over_g0 = 1e-2
    pc_dense = build_e_preconditioner(mesh, dt_over_g0)
    assert pc_dense.agg_of_el is None
    pc_agg = build_e_preconditioner(mesh, dt_over_g0, coarse_max_dense=64)
    assert pc_agg.agg_of_el is not None
    assert pc_agg.ec_inv.shape == (64, 64)
    k_dense, _ = _e_iters(mesh, pc_dense, dt_over_g0)
    k_agg, _ = _e_iters(mesh, pc_agg, dt_over_g0)
    k_none, _ = _e_iters(mesh, None, dt_over_g0)
    # both tiers must beat unpreconditioned CG decisively; the aggregate
    # coarse (4 elements/aggregate) stays within ~2.5x of per-element coarse
    assert k_dense < 0.4 * k_none
    assert k_agg < 0.5 * k_none
    assert k_agg <= 2.5 * k_dense + 5


@pytest.mark.slow
def test_aggregated_coarse_at_20k_elements():
    """VERDICT r2 item 8's bar: the preconditioner builds AND applies at a
    >=20k-element mesh without the O(nel^2) dense coarse (would be 3.5 GB in
    f64 at nel=21k; the aggregate tier caps coarse memory at 4096^2)."""
    mesh = box_mesh((147, 147), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=3)
    assert mesh.nel >= 20000
    dt_over_g0 = 1e-2
    pc = build_e_preconditioner(mesh, dt_over_g0)
    assert pc.agg_of_el is not None
    assert pc.ec_inv.shape[0] <= 4096
    # preconditioned CG converges in a small fraction of the unpreconditioned
    # count (h ~ 1/440: unpreconditioned E needs O(1/h) ~ thousands)
    k, rr = _e_iters(mesh, pc, dt_over_g0, tol=1e-6)
    assert rr <= 1e-12 or k < 4000
    assert k < 300, k
