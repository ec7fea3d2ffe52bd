"""Gauss-Lobatto-Legendre quadrature, Lagrange bases and derivative matrices.

Host-side (numpy, float64) construction of the static per-order operators that
parameterize every spectral-element kernel: GLL points/weights, the spectral
derivative matrix, and interpolation matrices between grids (used for
dealiasing onto a finer Gauss grid and for the P(N) <-> P(N-2) pressure
transfer).

Reference parity: the reference gets these from Nek5000's `speclib.f`
(ZWGLL/DGLL etc.); here they are rebuilt from scratch via Newton iteration on
Legendre polynomials. All outputs are numpy float64 and are closed over by the
jitted kernels as compile-time constants.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "gauss_lobatto_legendre",
    "gauss_legendre",
    "legendre",
    "derivative_matrix",
    "lagrange_interp_matrix",
]


def legendre(n: int, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Legendre polynomial P_n and derivative P_n' evaluated at x.

    Three-term recurrence in float64.
    """
    x = np.asarray(x, dtype=np.float64)
    p0 = np.ones_like(x)
    if n == 0:
        return p0, np.zeros_like(x)
    p1 = x
    for k in range(1, n):
        p2 = ((2 * k + 1) * x * p1 - k * p0) / (k + 1)
        p0, p1 = p1, p2
    # derivative via (1-x^2) P_n'(x) = n (P_{n-1}(x) - x P_n(x))
    with np.errstate(divide="ignore", invalid="ignore"):
        dp = n * (p0 - x * p1) / (1.0 - x * x)
    # endpoints: P_n'(+-1) = (+-1)^{n-1} n(n+1)/2
    edge = np.abs(np.abs(x) - 1.0) < 1e-13
    if np.any(edge):
        dp = np.where(edge, np.sign(x) ** (n - 1) * n * (n + 1) / 2.0, dp)
    return p1, dp


@functools.lru_cache(maxsize=None)
def gauss_lobatto_legendre(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Lobatto-Legendre nodes and weights on [-1, 1].

    Nodes are the roots of (1-x^2) P'_{n-1}(x); weights 2/(n(n-1) P_{n-1}^2).
    """
    if n < 2:
        raise ValueError("GLL rule needs at least 2 points")
    # Chebyshev-Gauss-Lobatto initial guess
    x = -np.cos(np.pi * np.arange(n) / (n - 1))
    p = np.zeros((n, n))
    x_old = 2 * np.ones_like(x)
    # Newton via the recurrence for the full Vandermonde (classic GLL solver)
    while np.max(np.abs(x - x_old)) > 1e-15:
        x_old = x.copy()
        p[:, 0] = 1.0
        p[:, 1] = x
        for k in range(2, n):
            p[:, k] = ((2 * k - 1) * x * p[:, k - 1] - (k - 1) * p[:, k - 2]) / k
        x = x_old - (x * p[:, n - 1] - p[:, n - 2]) / (n * p[:, n - 1])
    w = 2.0 / (n * (n - 1) * p[:, n - 1] ** 2)
    x[0], x[-1] = -1.0, 1.0
    # enforce symmetry
    x = 0.5 * (x - x[::-1])
    w = 0.5 * (w + w[::-1])
    return x, w


@functools.lru_cache(maxsize=None)
def gauss_legendre(n: int) -> tuple[np.ndarray, np.ndarray]:
    """n-point Gauss-Legendre nodes and weights on [-1, 1] (dealias grid)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def _barycentric_weights(x: np.ndarray) -> np.ndarray:
    n = len(x)
    w = np.ones(n)
    for j in range(n):
        w[j] = 1.0 / np.prod(x[j] - np.delete(x, j))
    return w


@functools.lru_cache(maxsize=None)
def _deriv_matrix_cached(key: tuple[float, ...]) -> np.ndarray:
    x = np.array(key, dtype=np.float64)
    n = len(x)
    wb = _barycentric_weights(x)
    d = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                d[i, j] = (wb[j] / wb[i]) / (x[i] - x[j])
    d[np.arange(n), np.arange(n)] = -d.sum(axis=1)
    return d


def derivative_matrix(x: np.ndarray) -> np.ndarray:
    """D[i,j] = l_j'(x_i): spectral differentiation on nodes x.

    Barycentric form with negative-sum diagonal trick for stability.
    """
    return _deriv_matrix_cached(tuple(np.asarray(x, dtype=np.float64).tolist()))


def lagrange_interp_matrix(x_from: np.ndarray, x_to: np.ndarray) -> np.ndarray:
    """I[i,j] = l_j(x_to[i]) interpolating nodal values on x_from to x_to."""
    x_from = np.asarray(x_from, dtype=np.float64)
    x_to = np.asarray(x_to, dtype=np.float64)
    wb = _barycentric_weights(x_from)
    nf, nt = len(x_from), len(x_to)
    out = np.zeros((nt, nf))
    for i in range(nt):
        diff = x_to[i] - x_from
        hit = np.abs(diff) < 1e-14
        if np.any(hit):
            out[i, np.argmax(hit)] = 1.0
        else:
            t = wb / diff
            out[i] = t / t.sum()
    return out
