"""Per-element geometric factors for the tensor-product SEM discretization.

Given GLL node coordinates x[ndim, nel, (t,)s, r] (any conforming, possibly
curved mesh), build the metric data every kernel needs:

  jac   [nel, ...]             Jacobian determinant at each GLL node
  rx    [ndim, ndim, nel, ...] dr_i/dx_j at each GLL node
  bm1   [nel, ...]             local (unassembled) mass = w_tensor * jac
  g     [ndim, ndim, nel, ...] stiffness factors w*jac * sum_k rx[i,k] rx[j,k]
  rxd/bmd                      same metric data on the dealias (Gauss) grid

Reference parity: Nek5000's `glmapm1.f`/`genxyz` geom factors (g1m1..g6m1,
jacm1, bm1, rxm1..) consumed by the frozen-LNS kernels at
/root/reference/src/linops/neklab_linops.f90:315-366.

Construction is host-side numpy float64; arrays are converted to the compute
dtype when the mesh is finalized.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .basis import Basis


def _np_apply(a, u, axis):
    return np.moveaxis(np.tensordot(a, u, axes=(1, axis)), 0, axis)


@dataclasses.dataclass(frozen=True)
class GeomFactors:
    """Numpy container of geometric factors (host-side, float64)."""

    ndim: int
    x: np.ndarray  # [ndim, nel, ...]
    jac: np.ndarray  # [nel, ...]
    rx: np.ndarray  # [ndim, ndim, nel, ...]
    bm1: np.ndarray  # [nel, ...]
    g: np.ndarray  # [ndim, ndim, nel, ...]
    xd: np.ndarray  # [ndim, nel, ...d] coords on dealias grid
    rxd: np.ndarray  # [ndim, ndim, nel, ...d]
    bmd: np.ndarray  # [nel, ...d]
    wt: np.ndarray  # tensor-product GLL weights [...], no jac
    bm2: np.ndarray  # [nel, ...2] mass on the P(N-2) pressure (mesh-2) grid


def _tensor_weights(w: np.ndarray, ndim: int) -> np.ndarray:
    if ndim == 2:
        return np.einsum("s,r->sr", w, w)
    return np.einsum("t,s,r->tsr", w, w, w)


def _interp_all_axes(j: np.ndarray, u: np.ndarray, ndim: int, first_axis: int) -> np.ndarray:
    out = u
    for ax in range(first_axis, first_axis + ndim):
        out = _np_apply(j, out, ax)
    return out


def compute_geom(x: np.ndarray, basis: Basis) -> GeomFactors:
    """Build all geometric factors from GLL node coordinates.

    x: [ndim, nel, (t,)s, r] float64.
    """
    x = np.asarray(x, dtype=np.float64)
    ndim = x.shape[0]
    d = basis.d

    # dx_i/dr_j on the GLL grid: differentiate the coordinate polynomials.
    # axis mapping: reference axis j=0 is r (last array axis), j=1 is s, ...
    dxdr = np.stack(
        [
            np.stack([_np_apply(d, x[i], x[i].ndim - 1 - j) for j in range(ndim)], axis=0)
            for i in range(ndim)
        ],
        axis=0,
    )  # [i, j, nel, ...] = dx_i/dr_j

    jac, rx = _invert_metric(dxdr, ndim)

    wt = _tensor_weights(basis.w, ndim)
    bm1 = jac * wt
    # stiffness factors g[a,b] = w*jac * sum_k rx[a,k] rx[b,k]
    g = np.einsum("ak...,bk...->ab...", rx, rx) * (jac * wt)

    # dealias grid: interpolate coordinates and coordinate derivatives
    # (both exact: polynomials of degree <= p).
    jd = basis.jd
    xd = np.stack([_interp_all_axes(jd, x[i], ndim, 1) for i in range(ndim)], axis=0)
    dxdr_d = np.stack(
        [
            np.stack([_interp_all_axes(jd, dxdr[i, j], ndim, 1) for j in range(ndim)], axis=0)
            for i in range(ndim)
        ],
        axis=0,
    )
    jacd, rxd = _invert_metric(dxdr_d, ndim)
    wtd = _tensor_weights(basis.wd, ndim)
    bmd = jacd * wtd

    # mesh-2 (pressure) grid: interior Gauss points of order n-2
    if basis.j12.shape[0] > 0:
        j12 = basis.j12
        dxdr_2 = np.stack(
            [
                np.stack([_interp_all_axes(j12, dxdr[i, j], ndim, 1) for j in range(ndim)], axis=0)
                for i in range(ndim)
            ],
            axis=0,
        )
        jac2, _ = _invert_metric(dxdr_2, ndim)
        bm2 = jac2 * _tensor_weights(basis.w2, ndim)
    else:
        bm2 = np.zeros((x.shape[1],) + (0,) * ndim)

    return GeomFactors(
        ndim=ndim, x=x, jac=jac, rx=rx, bm1=bm1, g=g, xd=xd, rxd=rxd, bmd=bmd, wt=wt, bm2=bm2
    )


def _invert_metric(dxdr: np.ndarray, ndim: int) -> tuple[np.ndarray, np.ndarray]:
    """Pointwise inverse of the mapping Jacobian. dxdr[i,j] = dx_i/dr_j.

    Returns (jac, rx) with rx[i,j] = dr_i/dx_j.
    """
    if ndim == 2:
        xr, xs = dxdr[0, 0], dxdr[0, 1]
        yr, ys = dxdr[1, 0], dxdr[1, 1]
        jac = xr * ys - xs * yr
        inv = 1.0 / jac
        rx = np.stack(
            [
                np.stack([ys * inv, -xs * inv], axis=0),  # r_x, r_y
                np.stack([-yr * inv, xr * inv], axis=0),  # s_x, s_y
            ],
            axis=0,
        )
        return jac, rx
    # 3-D cofactor expansion
    xr, xs, xt = dxdr[0]
    yr, ys, yt = dxdr[1]
    zr, zs, zt = dxdr[2]
    jac = xr * (ys * zt - yt * zs) - xs * (yr * zt - yt * zr) + xt * (yr * zs - ys * zr)
    inv = 1.0 / jac
    rxm = (ys * zt - yt * zs) * inv
    rym = -(xs * zt - xt * zs) * inv
    rzm = (xs * yt - xt * ys) * inv
    sxm = -(yr * zt - yt * zr) * inv
    sym = (xr * zt - xt * zr) * inv
    szm = -(xr * yt - xt * yr) * inv
    txm = (yr * zs - ys * zr) * inv
    tym = -(xr * zs - xs * zr) * inv
    tzm = (xr * ys - xs * yr) * inv
    rx = np.stack(
        [
            np.stack([rxm, rym, rzm], axis=0),
            np.stack([sxm, sym, szm], axis=0),
            np.stack([txm, tym, tzm], axis=0),
        ],
        axis=0,
    )
    return jac, rx
