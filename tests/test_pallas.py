"""Pallas fused-Helmholtz kernel: exactness vs the XLA helmholtz_local chain
(interpret mode on CPU; bench.py times the compiled kernel on the TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.ops import sem
from neklab_tpu.ops.pallas_kernels import HelmholtzPallas2D


def test_fused_helmholtz_matches_xla():
    mesh = box_mesh(
        (5, 3), ((0.0, 2.0), (-1.0, 1.0)),
        {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=5, dtype=jnp.float64,
    )
    h1, h2 = 0.01, 3.7
    hp = HelmholtzPallas2D(mesh, h1, h2, block_elems=128)
    u = jnp.asarray(np.random.default_rng(0).standard_normal(mesh.bm1.shape))
    ref = sem.helmholtz_local(mesh, u, h1, h2)
    out = hp(u)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-11

    # leading axes (velocity components) path
    u2 = jnp.stack([u, 2.0 * u])
    ref2 = sem.helmholtz_local(mesh, u2, h1, h2)
    out2 = hp(u2)
    assert np.abs(np.asarray(out2) - np.asarray(ref2)).max() < 1e-11


def test_fused_helmholtz_curved_mesh():
    """Curved (annulus) geometry: nontrivial cross metric g01."""
    from neklab_tpu.mesh.cylinder import annulus_mesh

    mesh = annulus_mesh(3, 8, r_in=0.5, r_out=2.0, order=4, dtype=jnp.float64)
    hp = HelmholtzPallas2D(mesh, 1.0, 0.0, block_elems=128)
    u = jnp.asarray(np.random.default_rng(1).standard_normal(mesh.bm1.shape))
    ref = sem.helmholtz_local(mesh, u, 1.0, 0.0)
    out = hp(u)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-11
