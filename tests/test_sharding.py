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
