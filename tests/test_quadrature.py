import numpy as np

from neklab_tpu.ops.quadrature import (
    derivative_matrix,
    gauss_legendre,
    gauss_lobatto_legendre,
    lagrange_interp_matrix,
)


def test_gll_weights_sum():
    for n in range(2, 16):
        x, w = gauss_lobatto_legendre(n)
        assert abs(w.sum() - 2.0) < 1e-13
        assert x[0] == -1.0 and x[-1] == 1.0
        assert np.all(np.diff(x) > 0)


def test_gll_exactness():
    # n-point GLL integrates polynomials up to degree 2n-3 exactly
    for n in (4, 7, 10):
        x, w = gauss_lobatto_legendre(n)
        for deg in range(2 * n - 2):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert abs(np.dot(w, x**deg) - exact) < 1e-12, (n, deg)


def test_gauss_exactness():
    for n in (3, 6):
        x, w = gauss_legendre(n)
        for deg in range(2 * n):
            exact = (1 - (-1) ** (deg + 1)) / (deg + 1)
            assert abs(np.dot(w, x**deg) - exact) < 1e-12


def test_derivative_matrix():
    x, _ = gauss_lobatto_legendre(8)
    d = derivative_matrix(x)
    for deg in range(8):
        u = x**deg
        du = deg * x ** max(deg - 1, 0) if deg > 0 else np.zeros_like(x)
        assert np.max(np.abs(d @ u - du)) < 1e-11, deg


def test_interp_matrix():
    x, _ = gauss_lobatto_legendre(7)
    xf, _ = gauss_legendre(10)
    j = lagrange_interp_matrix(x, xf)
    for deg in range(7):
        assert np.max(np.abs(j @ x**deg - xf**deg)) < 1e-12
    # interpolation onto the same nodes is the identity
    ji = lagrange_interp_matrix(x, x)
    assert np.max(np.abs(ji - np.eye(7))) < 1e-13
