"""Multi-chip sharding guards on the 8-device virtual mesh.

Two properties protect the scaling design (SURVEY 2.3: element partition
over ICI, halo exchange as neighbor collectives):

  1. numerical equivalence: the sharded step reproduces the unsharded one;
  2. collective pattern: the compiled step's communication is dominated by
     collective-permute (neighbor face exchange) and all-reduce (CG dots);
     all-gathers may only touch small face strips, never full fields.
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.navier_stokes import FlowConfig, advance, initial_state
from neklab_tpu.parallel.sharding import (
    make_device_mesh,
    shard_flow_state,
    shard_sem_mesh,
)


@pytest.fixture(scope="module")
def sharded_case():
    dmesh = make_device_mesh(8)
    mesh = box_mesh(
        (8, 2), ((0.0, 2 * np.pi), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=4, dtype=jnp.float64,
    )
    cfg = FlowConfig(viscosity=1e-3, dt=2e-3, vtol=1e-10, ptol=1e-10, vmaxit=40, pmaxit=80)
    y = mesh.x[1]
    u0 = mesh.vmask * jnp.stack([1 - y**2, 0.1 * jnp.sin(mesh.x[0])])
    return dmesh, mesh, cfg, u0


@pytest.mark.slow
def test_sharded_step_matches_unsharded(sharded_case):
    dmesh, mesh, cfg, u0 = sharded_case
    st = initial_state(mesh, cfg, u=u0)
    ref = advance(mesh, cfg, st, 3)

    smesh = shard_sem_mesh(mesh, dmesh)
    sst = shard_flow_state(initial_state(smesh, cfg, u=u0), dmesh)
    with dmesh:
        out = advance(smesh, cfg, sst, 3)
        jax.block_until_ready(out)
    assert np.allclose(np.asarray(out.u), np.asarray(ref.u), atol=1e-10)
    assert np.allclose(np.asarray(out.p), np.asarray(ref.p), atol=1e-8)


def test_step_collective_pattern(sharded_case):
    dmesh, mesh, cfg, u0 = sharded_case
    smesh = shard_sem_mesh(mesh, dmesh)
    sst = shard_flow_state(initial_state(smesh, cfg, u=u0), dmesh)
    with dmesh:
        txt = jax.jit(lambda s: advance(smesh, cfg, s, 1)).lower(sst).compile().as_text()

    n_perm = txt.count("collective-permute")
    n_ag = txt.count("all-gather(")
    assert n_perm >= 1, "halo exchange should lower to collective-permute"
    assert n_ag <= 6, f"too many all-gathers ({n_ag}): sharding regressed"

    # any all-gather may only move small face strips (< 1/4 of a field)
    field_elems = int(np.prod(mesh.bm1.shape)) * 2
    for ln in txt.splitlines():
        if "all-gather(" not in ln:
            continue
        m = re.search(r"f\d+\[([\d,]*)\]", ln)
        if not m or not m.group(1):
            continue
        size = int(np.prod([int(v) for v in m.group(1).split(",")]))
        assert size < field_elems // 4, f"all-gather of a large tensor: {ln[:160]}"


@pytest.fixture(scope="module")
def sharded_re2_case():
    """Unstructured face-pair mesh (the reference's own 1cyl.re2) with RCB
    element ordering — VERDICT round-1 gap: the production (.re2) dssum path
    compiled and validated under a device mesh. 4 chips: the element axis
    must divide evenly (1996 = 4 x 499); arbitrary counts need padding."""
    import os

    path = "/root/reference/examples/cylinder/stability/direct/1cyl.re2"
    if not os.path.exists(path):
        pytest.skip("reference tree absent")
    from neklab_tpu.mesh.re2 import mesh_from_re2

    dmesh = make_device_mesh(4)
    mesh = mesh_from_re2(path, order=3, dealias_order=5, dtype=jnp.float64,
                         partition=4)
    assert mesh.fp_pidx is not None  # face-pair path active
    assert mesh.eperm is not None  # RCB ordering applied
    cfg = FlowConfig(viscosity=0.02, dt=5e-3, vtol=1e-11, ptol=1e-10, vmaxit=200, pmaxit=400)
    from neklab_tpu.models.precond import build_e_preconditioner

    pc = build_e_preconditioner(mesh, 5e-3 / (11 / 6))
    return dmesh, mesh, cfg, pc


def test_re2_rcb_ordering_consistent():
    """RCB-reordered mesh: same geometry/connectivity physics as the
    file-ordered mesh (volume, mask counts), and from_file_order maps
    file-ordered fields onto it exactly."""
    import os

    path = "/root/reference/examples/cylinder/stability/direct/1cyl.re2"
    if not os.path.exists(path):
        pytest.skip("reference tree absent")
    from neklab_tpu.mesh.core import from_file_order
    from neklab_tpu.mesh.re2 import mesh_from_re2

    m0 = mesh_from_re2(path, order=3, dtype=jnp.float64)
    m1 = mesh_from_re2(path, order=3, dtype=jnp.float64, partition=8)
    assert abs(float(m0.volume) - float(m1.volume)) < 1e-12
    assert int((np.asarray(m0.vmask) == 0).sum()) == int((np.asarray(m1.vmask) == 0).sum())
    assert m0.nglob == m1.nglob
    # coordinate remap roundtrip
    x1 = from_file_order(m1, np.asarray(m0.x))
    assert np.array_equal(np.asarray(x1), np.asarray(m1.x))
    # RCB -> each chip's elements are spatially compact: mean within-block
    # bounding-box area far below the global area
    cent = np.asarray(m1.x).reshape(2, -1, m1.nel).mean(axis=1).T
    blocks = np.array_split(np.arange(m1.nel), 8)
    areas = []
    for b in blocks:
        c = cent[b]
        areas.append(np.ptp(c[:, 0]) * np.ptp(c[:, 1]))
    gx = np.ptp(cent[:, 0]) * np.ptp(cent[:, 1])
    assert np.mean(areas) < 0.35 * gx, (np.mean(areas), gx)


@pytest.mark.slow
def test_sharded_linearized_step_facepair(sharded_re2_case):
    """Sharded linearized steps on the unstructured mesh match unsharded."""
    from neklab_tpu.models.linearized import LinConfig, propagate

    dmesh, mesh, cfg, pc = sharded_re2_case
    lcfg = LinConfig(flow=cfg)
    r2 = mesh.x[0] ** 2 + mesh.x[1] ** 2
    base_u = jnp.stack([1 - jnp.exp(-r2), 0 * r2])
    th = jnp.zeros((0,) + mesh.bm1.shape, jnp.float64)
    key = jax.random.PRNGKey(0)
    u0 = mesh.vmask * jax.random.normal(key, (2,) + mesh.bm1.shape, jnp.float64)

    ref = propagate(mesh, lcfg, base_u, th, u0, th, 3, pc_e=pc)

    smesh = shard_sem_mesh(mesh, dmesh)
    sh = lambda a: jax.device_put(
        a, jax.sharding.NamedSharding(dmesh, jax.sharding.PartitionSpec(*([None] * (a.ndim - 1) + ["e"])))
    )
    with dmesh:
        out = propagate(smesh, lcfg, sh(base_u), th, sh(u0), th, 3, pc_e=pc)
        jax.block_until_ready(out)
    # both runs converge their inner CGs to 1e-11/1e-10; the sharded program
    # reorders reductions, so agreement is at the solver tolerance, not eps
    assert np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max() < 1e-7


@pytest.mark.slow
def test_facepair_collective_pattern(sharded_re2_case):
    """Compiled unstructured step: all-gathers may move only face-strip-sized
    tensors (O(surface)), never full volume fields."""
    from neklab_tpu.models.linearized import LinConfig, propagate

    dmesh, mesh, cfg, pc = sharded_re2_case
    lcfg = LinConfig(flow=cfg)
    r2 = mesh.x[0] ** 2 + mesh.x[1] ** 2
    base_u = jnp.stack([1 - jnp.exp(-r2), 0 * r2])
    th = jnp.zeros((0,) + mesh.bm1.shape, jnp.float64)
    u0 = mesh.vmask * jnp.stack([jnp.sin(mesh.x[0]), 0 * r2])

    smesh = shard_sem_mesh(mesh, dmesh)
    with dmesh:
        txt = (
            jax.jit(lambda u: propagate(smesh, lcfg, base_u, th, u, th, 1, pc_e=pc))
            .lower(u0)
            .compile()
            .as_text()
        )
    field_elems = int(np.prod(mesh.bm1.shape))  # one volume field
    n = mesh.basis.n
    strip = 4 * mesh.nel * n  # all face strips of one field
    for ln in txt.splitlines():
        if "all-gather(" not in ln:
            continue
        m = re.search(r"f\d+\[([\d,]*)\]", ln)
        if not m or not m.group(1):
            continue
        size = int(np.prod([int(v) for v in m.group(1).split(",")]))
        assert size <= 4 * strip, f"all-gather beyond face strips: {ln[:160]}"
        assert size < field_elems, f"all-gather of a full field: {ln[:160]}"


@pytest.mark.slow
def test_sharded_eigs_spectrum_matches_unsharded(sharded_case):
    """Driver-level SPMD guarantee: a FULL Krylov-Schur eigensolve of the
    exponential propagator on the 8-device mesh returns the same spectrum as
    the unsharded solve to solver tolerance (the analog of the reference's
    12-rank CylEigsDir oracle, test/neklabTests.py — the dryrun covers single
    steps; this covers the whole driver: Arnoldi, B-dots as psums, restarts,
    locking)."""
    from neklab_tpu.krylov.eigs import eigs
    from neklab_tpu.linops.exponential_propagator import ExponentialPropagator
    from neklab_tpu.models.linearized import LinConfig
    from neklab_tpu.vectors import flow_vector_space

    dmesh, mesh, _, u0 = sharded_case
    # better-separated spectrum than the step fixture's nu=1e-3 (at a short
    # tau every multiplier clusters at 1 and Arnoldi can't converge tightly)
    fcfg = FlowConfig(viscosity=0.05, dt=2e-3, vtol=1e-11, ptol=1e-11,
                      vmaxit=60, pmaxit=120)
    lcfg = LinConfig(flow=fcfg)
    y = mesh.x[1]
    base_u = jnp.stack([0.3 * (1 - y**2), 0 * y])

    def solve(m, bu, ctx=None):
        expA = ExponentialPropagator(m, lcfg, bu, tau=0.4, dt=fcfg.dt)
        space = flow_vector_space(m, 0)
        if ctx is None:
            return eigs(expA, space, nev=2, kdim=16, tol=1e-7, maxiter=8, seed=3)
        with ctx:
            res = eigs(expA, space, nev=2, kdim=16, tol=1e-7, maxiter=8, seed=3)
            jax.block_until_ready(res.eigvals)
        return res

    ref = solve(mesh, base_u)

    smesh = shard_sem_mesh(mesh, dmesh)
    sh = lambda a: jax.device_put(
        a, jax.sharding.NamedSharding(
            dmesh, jax.sharding.PartitionSpec(*([None] * (a.ndim - 1) + ["e"]))),
    )
    out = solve(smesh, sh(base_u), ctx=dmesh)

    assert ref.residuals.max() < 1e-7 and out.residuals.max() < 1e-7
    mu_ref = np.sort_complex(np.asarray(ref.eigvals[:2]))
    mu_out = np.sort_complex(np.asarray(out.eigvals[:2]))
    # both runs converge to 1e-7 residuals; sharded programs reorder the
    # B-dot reductions, so equality is at solver tolerance, not eps
    assert np.abs(mu_ref - mu_out).max() < 1e-6, (mu_ref, mu_out)
