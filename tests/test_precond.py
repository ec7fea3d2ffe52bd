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
    # like-for-like: the aggregate tier runs bj+const (q1/oas live below the
    # dense ceiling), so compare against the dense bj+const
    pc_dense = build_e_preconditioner(mesh, dt_over_g0, local="bj", coarse="const")
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


# ---------------------------------------------------------------------------
# exact neighbor-block E apply + OAS + bf16 compression (the r3 fast path)
# ---------------------------------------------------------------------------

REF_CYL = "/root/reference/examples/cylinder/stability/direct/1cyl.re2"


def _check_e_apply_exact(mesh, pc, dt_over_g0, rtol):
    q = jax.random.normal(jax.random.PRNGKey(3), mesh.bm2.shape, mesh.bm2.dtype)
    a = np.asarray(stokes.e_op(mesh, q, dt_over_g0))
    b = np.asarray(pc.e_apply(q, dt_over_g0))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() < rtol * scale, np.abs(a - b).max() / scale
    # batched (vmapped) application must agree too (the solver transposes /
    # vmaps through the operator)
    qb = jax.random.normal(jax.random.PRNGKey(4), (3,) + mesh.bm2.shape, mesh.bm2.dtype)
    ab = np.asarray(jax.vmap(lambda z: stokes.e_op(mesh, z, dt_over_g0))(qb))
    bb = np.asarray(jax.vmap(lambda z: pc.e_apply(z, dt_over_g0))(qb))
    assert np.abs(ab - bb).max() < rtol * np.abs(ab).max()


def test_e_apply_matches_e_op_box():
    """The probed neighbor-block form IS the E operator (machine precision,
    f64) — the default 2-D pressure path must never drift from the
    matrix-free chain (ADVICE r3 medium #2)."""
    mesh = box_mesh((8, 6), ((0.0, 2.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=5)
    dt_over_g0 = 3e-3
    pc = build_e_preconditioner(mesh, dt_over_g0, exact_blocks=True)
    assert pc.eb_w is not None
    _check_e_apply_exact(mesh, pc, dt_over_g0, 1e-12)
    # dt scaling is exact: blocks are per-mesh, apply scales linearly
    q = jax.random.normal(jax.random.PRNGKey(5), mesh.bm2.shape, mesh.bm2.dtype)
    a = np.asarray(pc.e_apply(q, 2.0 * dt_over_g0))
    b = 2.0 * np.asarray(pc.e_apply(q, dt_over_g0))
    assert np.abs(a - b).max() < 1e-12 * np.abs(a).max()


def test_e_apply_matches_e_op_3d():
    """Layout-agnostic e_apply: 3-D meshes fold their trailing axes
    correctly when exact_blocks is forced (ADVICE r3 low #3)."""
    mesh = box_mesh((3, 2, 2), ((0.0, 1.5), (0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W",
                     "z-": "W", "z+": "W"}, order=4)
    dt_over_g0 = 1e-2
    pc = build_e_preconditioner(mesh, dt_over_g0, exact_blocks=True)
    assert pc.eb_w is not None
    _check_e_apply_exact(mesh, pc, dt_over_g0, 1e-12)


@pytest.mark.slow
def test_e_apply_matches_e_op_cylinder():
    """Exactness on the production unstructured mesh (1cyl.re2, f64): the
    shipped default path for every 2-D pressure solve."""
    from neklab_tpu.mesh.re2 import mesh_from_re2

    mesh = mesh_from_re2(REF_CYL, order=5, dealias_order=8, dtype=jnp.float64)
    dt_over_g0 = (1.0 / 178) / (11.0 / 6.0)
    pc = build_e_preconditioner(mesh, dt_over_g0)
    assert pc.eb_w is not None  # the 2-D default attaches the exact blocks
    _check_e_apply_exact(mesh, pc, dt_over_g0, 1e-11)


def test_oas_patch_solve_symmetric_and_effective():
    """local='oas': the patch-Schwarz apply must be symmetric (PCG assumes a
    symmetric preconditioner) and beat block-Jacobi on iteration count."""
    mesh = box_mesh((10, 10), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=4)
    dt_over_g0 = 1e-2
    pc_bj = build_e_preconditioner(mesh, dt_over_g0, local="bj")
    pc_oas = build_e_preconditioner(mesh, dt_over_g0, local="oas")
    assert pc_oas.oas_binv is not None
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, mesh.bm2.shape, mesh.bm2.dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), mesh.bm2.shape, mesh.bm2.dtype)
    sym_lhs = float(jnp.vdot(x, pc_oas.apply(y)))
    sym_rhs = float(jnp.vdot(y, pc_oas.apply(x)))
    assert abs(sym_lhs - sym_rhs) < 1e-10 * max(abs(sym_lhs), 1.0)
    # positive definite on random probes
    for s in range(4):
        v = jax.random.normal(jax.random.PRNGKey(10 + s), mesh.bm2.shape, mesh.bm2.dtype)
        assert float(jnp.vdot(v, pc_oas.apply(v))) > 0.0
    k_bj, _ = _e_iters(mesh, pc_bj, dt_over_g0)
    k_oas, _ = _e_iters(mesh, pc_oas, dt_over_g0)
    assert k_oas <= k_bj, (k_oas, k_bj)


def test_bf16_compress_iteration_parity():
    """bf16-compressed local blocks must cost at most ~10% extra CG
    iterations, and the coarse inverse must stay UNcompressed (rounding a
    badly conditioned symmetric inverse to bf16 can lose definiteness —
    ADVICE r3 medium #1)."""
    mesh = box_mesh((12, 12), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"},
                    order=4, dtype=jnp.float32)
    dt_over_g0 = 1e-2
    pc_full = build_e_preconditioner(mesh, dt_over_g0, compress=False, local="oas")
    pc_bf16 = build_e_preconditioner(mesh, dt_over_g0, compress=True, local="oas")
    assert pc_bf16.oas_binv.dtype == jnp.bfloat16
    assert pc_bf16.blocks_inv.dtype == jnp.bfloat16
    assert pc_bf16.ec_inv.dtype == jnp.float32  # never compressed
    k_full, _ = _e_iters(mesh, pc_full, dt_over_g0, tol=1e-5)
    k_bf16, _ = _e_iters(mesh, pc_bf16, dt_over_g0, tol=1e-5)
    assert k_bf16 <= int(1.1 * k_full) + 2, (k_bf16, k_full)


def test_aggregated_coarse_with_exact_blocks():
    """Above the dense-coarse ceiling the aggregate tier and the exact
    neighbor-block apply must compose (VERDICT r3 item 2 interaction)."""
    mesh = box_mesh((12, 12), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=3)
    dt_over_g0 = 1e-2
    pc = build_e_preconditioner(mesh, dt_over_g0, coarse_max_dense=32,
                                exact_blocks=True)
    assert pc.agg_of_el is not None and pc.eb_w is not None
    _check_e_apply_exact(mesh, pc, dt_over_g0, 1e-12)
    k, _ = _e_iters(mesh, pc, dt_over_g0)
    k_none, _ = _e_iters(mesh, None, dt_over_g0)
    assert k < 0.5 * k_none


def test_q1_vertex_coarse_with_oas():
    """The Q1 vertex coarse (E_c = P^T E P assembled exactly from the probed
    neighbor blocks) + OAS local must SHARPLY beat the piecewise-constant
    coarse (measured 89 -> 20 iterations on this mesh class), stay symmetric,
    and keep the partition-of-unity property of the bilinear hats."""
    mesh = box_mesh((16, 16), ((0.0, 1.0), (0.0, 1.0)),
                    {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=5)
    s = 1e-2
    pc_const = build_e_preconditioner(mesh, s, coarse="const", local="oas")
    pc_q1 = build_e_preconditioner(mesh, s, coarse="q1", local="oas")
    assert pc_q1.q1_vert is not None and pc_q1.q1_b4 is not None
    assert pc_q1.agg_of_el is None
    # bilinear hats are a partition of unity at every mesh-2 point
    assert np.abs(np.asarray(pc_q1.q1_b4).sum(axis=1) - 1.0).max() < 1e-12
    # nvert for a 16x16 quad grid = 17^2
    assert pc_q1.ec_inv.shape == (17 * 17, 17 * 17)
    # symmetric apply
    x = jax.random.normal(jax.random.PRNGKey(0), mesh.bm2.shape, mesh.bm2.dtype)
    y = jax.random.normal(jax.random.PRNGKey(1), mesh.bm2.shape, mesh.bm2.dtype)
    lhs = float(jnp.vdot(x, pc_q1.apply(y)))
    rhs = float(jnp.vdot(y, pc_q1.apply(x)))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)
    k_const, _ = _e_iters(mesh, pc_const, s)
    k_q1, _ = _e_iters(mesh, pc_q1, s)
    assert k_q1 < 0.5 * k_const, (k_q1, k_const)


def test_q1_coarse_guards():
    """q1 on 3-D or above the dense ceiling must raise, not mis-build."""
    mesh3 = box_mesh((2, 2, 2), ((0.0, 1.0),) * 3,
                     {"x-": "W", "x+": "W", "y-": "W", "y+": "W",
                      "z-": "W", "z+": "W"}, order=3)
    with pytest.raises(ValueError):
        build_e_preconditioner(mesh3, 1e-2, coarse="q1")
    mesh2 = box_mesh((4, 4), ((0.0, 1.0), (0.0, 1.0)),
                     {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=3)
    with pytest.raises(ValueError):
        build_e_preconditioner(mesh2, 1e-2, coarse="q1", coarse_max_dense=8)
