"""Independent Orr-Sommerfeld oracle: 1-D Chebyshev collocation solver.

Computes the temporal eigenvalues of the linearized 2-D incompressible NS
operator about plane Poiseuille flow U(y) = 1 - y^2 at streamwise wavenumber
alpha and Reynolds number Re (nu = 1/Re), i.e. the spectrum the SEM
propagator must reproduce (SURVEY build plan: "minimum end-to-end slice").

Formulation (Trefethen, "Spectral Methods in MATLAB", p. 40): generalized
problem A phi = lambda B phi for perturbations ~ phi(y) e^{i alpha x + lambda t}:

  A = (D4 - 2 a^2 D2 + a^4 I)/Re - i a (U'' I) - i a U (D2 - a^2 I)
  B = D2 - a^2 I,   phi(+-1) = phi'(+-1) = 0 (clamped, via the (1-y^2) trick)

Also provides the analytic alpha = 0 shear-mode eigenvalues
lambda_m = -nu (m pi / 2)^2 (pure diffusion of the streamwise velocity).
"""

from __future__ import annotations

import numpy as np


def cheb(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Chebyshev differentiation matrix on n+1 Gauss-Lobatto points."""
    if n == 0:
        return np.zeros((1, 1)), np.array([1.0])
    x = np.cos(np.pi * np.arange(n + 1) / n)
    c = np.hstack([2.0, np.ones(n - 1), 2.0]) * (-1.0) ** np.arange(n + 1)
    X = np.tile(x, (n + 1, 1)).T
    dX = X - X.T
    D = np.outer(c, 1.0 / c) / (dX + np.eye(n + 1))
    D = D - np.diag(D.sum(axis=1))
    return D, x


def orr_sommerfeld_spectrum(re: float, alpha: float, n: int = 128) -> np.ndarray:
    """Temporal eigenvalues lambda (growth rate = Re(lambda)), sorted by
    descending real part."""
    D, y = cheb(n)
    D2 = D @ D
    # clamped-BC 4th derivative (Trefethen p. 40)
    S = np.diag(np.hstack([0.0, 1.0 / (1.0 - y[1:-1] ** 2), 0.0]))
    D4 = (np.diag(1 - y**2) @ np.linalg.matrix_power(D, 4)
          - 8 * np.diag(y) @ np.linalg.matrix_power(D, 3)
          - 12 * D2) @ S
    D2i = D2[1:-1, 1:-1]
    D4i = D4[1:-1, 1:-1]
    yi = y[1:-1]
    I = np.eye(n - 1)
    a = alpha
    U = np.diag(1 - yi**2)
    A = (
        (D4i - 2 * a**2 * D2i + a**4 * I) / re
        + 1j * a * (-2.0) * I  # +i a U'' phi with U'' = -2 (Trefethen p40: -2i I)
        - 1j * a * U @ (D2i - a**2 * I)
    )
    B = D2i - a**2 * I
    lam = np.linalg.eigvals(np.linalg.solve(B, A))
    return lam[np.argsort(-lam.real)]


def shear_mode_eigenvalues(re: float, m_max: int = 8) -> np.ndarray:
    """alpha = 0 modes: pure diffusion of u'(y) with Dirichlet walls on
    [-1, 1]: lambda_m = -(1/re) (m pi / 2)^2, m = 1, 2, ..."""
    m = np.arange(1, m_max + 1)
    return -(1.0 / re) * (m * np.pi / 2.0) ** 2
