"""Static per-order SEM basis bundle: GLL nodes, weights, D, dealias interp.

One `Basis` instance per (order, dealias-order) pair; it is a frozen host-side
container of numpy arrays which jitted kernels close over as constants.

Reference parity: plays the role of Nek5000's SIZE-parameterized speclib data
(lx1 GLL grid, lxd dealias grid — see SURVEY.md section 5 config tiers).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from .quadrature import (
    derivative_matrix,
    gauss_legendre,
    gauss_lobatto_legendre,
    lagrange_interp_matrix,
)


@dataclasses.dataclass(frozen=True)
class Basis:
    """1-D building blocks of the tensor-product SEM discretization.

    Attributes:
      n:    points per direction on the primary (GLL / "mesh 1") grid = p+1.
      nd:   points per direction on the dealias (Gauss) grid (0 = disabled).
      z:    GLL nodes on [-1, 1], shape [n].
      w:    GLL weights, shape [n].
      d:    derivative matrix on GLL nodes, D[i,j] = l_j'(z_i), shape [n, n].
      zd/wd: dealias Gauss nodes/weights, shape [nd].
      jd:   interpolation GLL -> Gauss grid, shape [nd, n].
      z2/w2: interior GLL ("mesh 2", P(N-2) pressure) nodes/weights, [n-2].
      j12:  interpolation mesh1 -> mesh2, shape [n-2, n].
      j21:  interpolation mesh2 -> mesh1, shape [n, n-2].
    """

    n: int
    nd: int
    z: np.ndarray
    w: np.ndarray
    d: np.ndarray
    zd: np.ndarray
    wd: np.ndarray
    jd: np.ndarray
    z2: np.ndarray
    w2: np.ndarray
    j12: np.ndarray
    j21: np.ndarray

    def __hash__(self) -> int:
        return hash((self.n, self.nd))

    def __eq__(self, other) -> bool:
        return isinstance(other, Basis) and (self.n, self.nd) == (other.n, other.nd)


@functools.lru_cache(maxsize=None)
def make_basis(n: int, nd: int | None = None) -> Basis:
    """Build the basis bundle for n GLL points (order p = n-1).

    nd defaults to ceil(3n/2) (the 3/2-rule used by the reference's lxd).
    """
    if nd is None:
        nd = (3 * n + 1) // 2
    z, w = gauss_lobatto_legendre(n)
    d = derivative_matrix(z)
    zd, wd = gauss_legendre(nd)
    jd = lagrange_interp_matrix(z, zd)
    if n > 3:
        # mesh-2 (pressure) grid: interior Gauss points of order n-2
        z2, w2 = gauss_legendre(n - 2)
    else:
        z2, w2 = np.zeros(0), np.zeros(0)
    j12 = lagrange_interp_matrix(z, z2) if len(z2) else np.zeros((0, n))
    j21 = lagrange_interp_matrix(z2, z) if len(z2) else np.zeros((n, 0))
    return Basis(n=n, nd=nd, z=z, w=w, d=d, zd=zd, wd=wd, jd=jd, z2=z2, w2=w2, j12=j12, j21=j21)
