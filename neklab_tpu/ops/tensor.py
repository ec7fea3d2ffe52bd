"""Tensor-product contractions over element-local SEM fields.

Field convention (throughout the framework):
  2-D: f[..., nel, s, r]      (last axis r is the fastest / x-like direction)
  3-D: f[..., nel, t, s, r]

All kernels are written so that XLA lowers them to batched matmuls on the MXU:
a 1-D operator A[m, n] applied along one reference axis of a [nel, n, n(, n)]
field is a (m x n) x (n x batch) GEMM. The fused Pallas variants live in
`pallas_kernels.py`; these einsum forms are the portable reference path and
what the CPU test mesh runs.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_r", "apply_s", "apply_t", "grad_rst", "grad_rst_t", "interp_nd", "interp_nd_t"]


def apply_r(a, u):
    """Contract the last (r) axis: out[..., i] = sum_j a[i, j] u[..., j]."""
    return jnp.einsum("ij,...j->...i", a, u, precision="highest")


def apply_s(a, u):
    """Contract the second-to-last (s) axis."""
    return jnp.einsum("ij,...jr->...ir", a, u, precision="highest")


def apply_t(a, u):
    """Contract the third-to-last (t) axis (3-D only)."""
    return jnp.einsum("ij,...jsr->...isr", a, u, precision="highest")


_APPLY = (apply_r, apply_s, apply_t)


def grad_rst(u, d, ndim: int):
    """Reference-space gradient: tuple (u_r, u_s[, u_t]) via the derivative
    matrix d. Axis ordering of the result tuple is (r, s, t)."""
    if ndim == 2:
        return apply_r(d, u), apply_s(d, u)
    return apply_r(d, u), apply_s(d, u), apply_t(d, u)


def grad_rst_t(u, d, ndim: int):
    """Transpose-gradient accumulation: given fluxes (f_r, f_s[, f_t]) returns
    sum_k A_k^T f_k where A_k applies d along axis k. Used by the weak
    Laplacian: out = D_r^T f_r + D_s^T f_s (+ D_t^T f_t)."""
    dt = d.T
    if ndim == 2:
        fr, fs = u
        return apply_r(dt, fr) + apply_s(dt, fs)
    fr, fs, ft = u
    return apply_r(dt, fr) + apply_s(dt, fs) + apply_t(dt, ft)


def interp_nd(j, u, ndim: int):
    """Apply interpolation matrix j along every reference axis (grid change)."""
    out = apply_r(j, u)
    out = apply_s(j, out)
    if ndim == 3:
        out = apply_t(j, out)
    return out


def interp_nd_t(j, u, ndim: int):
    """Transpose interpolation along every axis (fine -> coarse projection)."""
    return interp_nd(j.T, u, ndim)
