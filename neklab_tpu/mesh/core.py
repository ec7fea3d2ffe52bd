"""Device-side SEM mesh container.

`SemMesh` bundles everything a jitted kernel needs: geometric factors, the
gather-scatter (direct-stiffness) numbering, multiplicity weights, and the
per-field Dirichlet masks. It is a registered pytree so it can be closed over
or passed through jit/scan; the basis and sizes are static aux data.

Reference parity: the union of Nek5000's GEOM/MASS commons (bm1, jacm1,
g1m1..g6m1), the gslib gather-scatter handle (dssum/dsavg semantics of
/root/reference/src/vectors/real_vectors.f90:100-104), and the v1mask/pmask
boundary masks used by `bcdirvc`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.basis import Basis
from ..ops.geometry import GeomFactors
from ..utils.pytrees import pytree_dataclass


@pytree_dataclass(meta_fields=("basis", "ndim", "nel", "nglob", "bc"))
class SemMesh:
    basis: Basis
    ndim: int
    nel: int
    nglob: int
    bc: tuple  # tuple of (face-set name, bc-char) pairs — static metadata
    # geometry (compute dtype)
    x: jnp.ndarray  # [ndim, nel, ...]
    jac: jnp.ndarray  # [nel, ...]
    rx: jnp.ndarray  # [ndim, ndim, nel, ...]
    bm1: jnp.ndarray  # [nel, ...]
    g: jnp.ndarray  # [ndim, ndim, nel, ...]
    xd: jnp.ndarray  # [ndim, nel, ...d]
    rxd: jnp.ndarray  # [ndim, ndim, nel, ...d]
    bmd: jnp.ndarray  # [nel, ...d]
    bm2: jnp.ndarray  # [nel, ...2] pressure-grid mass
    binv: jnp.ndarray  # [nel, ...] inverse of the assembled (diagonal) mass
    # connectivity
    gidx: jnp.ndarray  # int32 [pts..., nel] global DOF ids
    gfirst: jnp.ndarray  # int32 [nglob] flat position of one copy of each DOF
    vmult: jnp.ndarray  # [pts..., nel] 1/multiplicity
    # masks: 1.0 on free DOFs, 0.0 on constrained DOFs
    vmask: jnp.ndarray  # [ndim, nel, ...] velocity component masks
    pmask: jnp.ndarray  # [nel, ...] pressure mask (0 where p Dirichlet, e.g. outflow)
    tmask: jnp.ndarray  # [nel, ...] temperature/scalar mask
    vmask_hat: jnp.ndarray  # [ndim, nglob] global-DOF velocity masks
    tmask_hat: jnp.ndarray  # [nglob] global-DOF scalar mask
    volume: jnp.ndarray  # scalar: total mesh volume

    @property
    def npts(self) -> int:
        return self.basis.n**self.ndim

    @property
    def p_fixed(self) -> bool:
        """True when the pressure Poisson problem has no Dirichlet DOF
        (pure Neumann -> nullspace must be projected out)."""
        return bool(self._p_all_neumann)

    # stored as a static-friendly int in bc metadata instead; see builder.
    @property
    def _p_all_neumann(self):
        return ("__pure_neumann__", "1") in self.bc


def build_mesh(
    geom: GeomFactors,
    basis: Basis,
    gidx: np.ndarray,
    vmask: np.ndarray,
    pmask: np.ndarray,
    tmask: np.ndarray | None = None,
    bc: tuple = (),
    dtype=jnp.float64,
) -> SemMesh:
    """Finalize host-side geometry + connectivity into a device SemMesh.

    Inputs use the builder-friendly ELEMENT-FIRST layout ([.., nel, pts..]);
    the stored device arrays are transposed to the TPU-friendly ELEMENT-LAST
    layout ([.., pts.., nel]) — see ops/tensor.py.
    """
    ndim = geom.ndim
    nel = geom.x.shape[1]
    gidx = np.asarray(gidx, dtype=np.int32)
    nglob = int(gidx.max()) + 1

    # multiplicity: how many element-local copies each global DOF has
    ones = np.ones(gidx.size)
    cnt = np.zeros(nglob)
    np.add.at(cnt, gidx.reshape(-1), ones)
    vmult = (1.0 / cnt)[gidx.reshape(-1)].reshape(gidx.shape)

    if tmask is None:
        tmask = np.ones_like(pmask)

    # assembled mass diagonal (dssum of bm1) and its inverse, per node copy
    bsum = np.zeros(nglob)
    np.add.at(bsum, gidx.reshape(-1), geom.bm1.reshape(-1))
    binv = (1.0 / bsum)[gidx.reshape(-1)].reshape(gidx.shape)

    # global-DOF masks (min over copies: Dirichlet wins at shared nodes)
    ndim_ = geom.ndim
    vmask_hat = np.ones((ndim_, nglob))
    for c in range(ndim_):
        np.minimum.at(vmask_hat[c], gidx.reshape(-1), vmask[c].reshape(-1))
    tmask_hat = np.ones(nglob)
    np.minimum.at(tmask_hat, gidx.reshape(-1), tmask.reshape(-1))

    pure_neumann = bool(np.all(pmask > 0.5))
    bc = tuple(bc) + ((("__pure_neumann__", "1"),) if pure_neumann else ())


    def el_last(a: np.ndarray, nel_axis: int) -> np.ndarray:
        return np.ascontiguousarray(np.moveaxis(a, nel_axis, -1))

    cast = lambda a: jnp.asarray(a, dtype=dtype)
    # first-copy position of every global DOF in the ELEMENT-LAST flattening
    gidx_el_last = np.moveaxis(gidx, 0, -1).reshape(-1)
    _, first_pos = np.unique(gidx_el_last, return_index=True)
    return SemMesh(
        basis=basis,
        ndim=ndim,
        nel=nel,
        nglob=nglob,
        bc=bc,
        x=cast(el_last(geom.x, 1)),
        jac=cast(el_last(geom.jac, 0)),
        rx=cast(el_last(geom.rx, 2)),
        bm1=cast(el_last(geom.bm1, 0)),
        g=cast(el_last(geom.g, 2)),
        xd=cast(el_last(geom.xd, 1)),
        rxd=cast(el_last(geom.rxd, 2)),
        bmd=cast(el_last(geom.bmd, 0)),
        bm2=cast(el_last(geom.bm2, 0)),
        binv=cast(el_last(binv, 0)),
        gidx=jnp.asarray(el_last(gidx, 0)),
        gfirst=jnp.asarray(first_pos.astype(np.int32)),
        vmult=cast(el_last(vmult, 0)),
        vmask=cast(el_last(vmask, 1)),
        pmask=cast(el_last(pmask, 0)),
        tmask=cast(el_last(tmask, 0)),
        vmask_hat=cast(vmask_hat),
        tmask_hat=cast(tmask_hat),
        volume=cast((geom.bm1).sum()),
    )
