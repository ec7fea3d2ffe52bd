"""Pallas TPU kernels for the element-local hot ops.

One kernel is provided (the VERDICT round-1 ask): the FUSED local Helmholtz
apply  H u = h1 * D^T (G : D u) + h2 * B u  — the inner operator of every
velocity/scalar CG iteration (reference hot loop: Nek `hmholtz`/`axhelm`;
metric-term structure at /root/reference/src/linops/neklab_linops.f90:332-366).

Design (TPU-first, not a translation):
  * element-LAST layout [npts, nel]: the element axis is the 128-lane axis,
    so every op is lane-parallel across elements;
  * the reference-derivative operators are applied as DENSE [npts, npts]
    matrices (kron(I, Dr), kron(Ds, I) precomputed on the host): at SEM
    orders 5-9 these are small-M matmuls that the MXU executes from VMEM,
    and fusing the whole chain in one kernel removes the 4 HBM round-trips
    of the unfused XLA path (u_r, u_s, w_r, w_s intermediates) — the apply
    is HBM-bandwidth-bound, so traffic, not FLOPs, sets the speed of light;
  * grid over element blocks (BE a multiple of 128 lanes), geometry blocks
    streamed per-tile.

bench.py measures this kernel against the XLA `helmholtz_local` chain and
records both. MEASURED CONCLUSION (pinned; see docs/PERFORMANCE.md "Pallas
vs XLA"): at the cyl1996 production size the XLA chain wins — the apply is
latency/bandwidth-bound at a few MB of traffic and XLA's fusion already
removes the intermediates this kernel was written to avoid. Nothing in the
production path calls this kernel; it remains as the measured baseline for
any future fused-kernel attempt (e.g. fusing dssum + mask + CG dots, where a
real win would have to come from).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..mesh.core import SemMesh


def _dense_derivative_mats(mesh: SemMesh) -> tuple[np.ndarray, np.ndarray]:
    """(Dr_full, Ds_full): [npts, npts] dense reference-derivative operators
    on the flattened [s, r] point ordering (r fastest — element-last layout
    [..., s, r, nel] flattens to [s*n + r])."""
    d = np.asarray(mesh.basis.d)  # [n, n]: (du/dr)_i = d[i, j] u_j
    n = mesh.basis.n
    eye = np.eye(n)
    dr = np.kron(eye, d)  # r varies fastest
    ds = np.kron(d, eye)
    return dr, ds


@functools.lru_cache(maxsize=8)
def _helmholtz2d_call(n: int, nel: int, be: int, dtype_name: str, h1: float, h2: float,
                      interpret: bool = False):
    """Build the pallas_call for given static shapes (cached). interpret=True
    runs the kernel in the Pallas interpreter (CPU tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    npts = n * n
    dtype = jnp.dtype(dtype_name)
    grid = (nel // be,)

    def kernel(u_ref, dr_ref, ds_ref, g00_ref, g01_ref, g11_ref, b_ref, out_ref):
        u = u_ref[:]  # [npts, BE]
        dr = dr_ref[:]  # [npts, npts]
        ds = ds_ref[:]
        ur = jnp.dot(dr, u, preferred_element_type=dtype)
        us = jnp.dot(ds, u, preferred_element_type=dtype)
        wr = g00_ref[:] * ur + g01_ref[:] * us
        ws = g01_ref[:] * ur + g11_ref[:] * us
        # D^T w: transpose applied via dot_general contracting the first axes
        a = jax.lax.dot_general(dr, wr, (((0,), (0,)), ((), ())),
                                preferred_element_type=dtype)
        a = a + jax.lax.dot_general(ds, ws, (((0,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
        out_ref[:] = h1 * a + h2 * (b_ref[:] * u)

    blk = lambda: pl.BlockSpec((npts, be), lambda i: (0, i), memory_space=pltpu.VMEM)
    mat = lambda: pl.BlockSpec((npts, npts), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(), mat(), mat(), blk(), blk(), blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((npts, nel), dtype),
        interpret=interpret,
    )


class HelmholtzPallas2D:
    """Fused local Helmholtz apply H u = h1 D^T(G:Du) + h2 B u on a 2-D mesh.

    Precomputes the dense derivative operators and the flattened geometry;
    __call__ maps [..., n, n, nel] -> [..., n, n, nel] like
    ops.sem.helmholtz_local (same weak-form local operator, bit-compatible
    up to f32 reassociation)."""

    def __init__(self, mesh: SemMesh, h1: float, h2: float, block_elems: int = 2048):
        if mesh.ndim != 2:
            raise ValueError("HelmholtzPallas2D is 2-D only")
        n = mesh.basis.n
        self.n = n
        self.npts = n * n
        nel = mesh.nel
        dtype = mesh.bm1.dtype
        dr, ds = _dense_derivative_mats(mesh)
        self.dr = jnp.asarray(dr, dtype)
        self.ds = jnp.asarray(ds, dtype)
        # geometry: g [ndim, ndim, n, n, nel] -> flattened [npts, nel]. The
        # element (lane) axis is padded to a multiple of the block size; the
        # padded elements carry zero geometry and are sliced away on return.
        be = max(128, min(block_elems, 128 * ((nel + 127) // 128)))
        self.nel_pad = ((nel + be - 1) // be) * be
        self.be = be

        def flat_pad(a):
            a = np.asarray(a).reshape(self.npts, mesh.nel)
            if self.nel_pad != mesh.nel:
                a = np.concatenate(
                    [a, np.zeros((self.npts, self.nel_pad - mesh.nel), a.dtype)], axis=1
                )
            return jnp.asarray(a, dtype)

        g = np.asarray(mesh.g)
        self.g00 = flat_pad(g[0, 0])
        self.g01 = flat_pad(g[0, 1])
        self.g11 = flat_pad(g[1, 1])
        self.bm1 = flat_pad(mesh.bm1)
        self.h1 = float(h1)
        self.h2 = float(h2)
        self.nel = mesh.nel
        self.dtype = dtype
        self._call = _helmholtz2d_call(
            n, self.nel_pad, self.be, str(dtype), self.h1, self.h2,
            interpret=jax.default_backend() != "tpu",
        )

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        lead = u.shape[:-3]
        uf = u.reshape(lead + (self.npts, self.nel))
        if self.nel_pad != self.nel:
            pad = [(0, 0)] * len(lead) + [(0, 0), (0, self.nel_pad - self.nel)]
            uf = jnp.pad(uf, pad)
        ops = (self.dr, self.ds, self.g00, self.g01, self.g11, self.bm1)
        if lead:
            flat = uf.reshape((-1, self.npts, self.nel_pad))
            out = jax.vmap(lambda x: self._call(x, *ops))(flat)
            out = out.reshape(lead + (self.npts, self.nel_pad))
        else:
            out = self._call(uf, *ops)
        out = out[..., : self.nel]
        return out.reshape(u.shape)
