"""Tensor-product contractions over element-local SEM fields.

Field convention (throughout the framework) — ELEMENT-LAST layout:
  2-D: f[..., s, r, nel]
  3-D: f[..., t, s, r, nel]

The element axis sits last so it maps onto the TPU's 128-wide lane dimension:
every per-element operation vectorizes across elements, and a 1-D operator
A[m, n] applied along a reference axis is a small-M GEMM with a huge N
(n * nel), which XLA tiles onto the MXU. Measured ~4x faster than the
element-first layout for the Helmholtz chain on TPU v5e.
"""

from __future__ import annotations

import jax.numpy as jnp

# Contraction precision: "highest" guarantees fp32-exact matmuls (needed for
# the f64 CPU oracle suite); TPU f32 production runs can set "default" for
# fast bf16-accumulated MXU paths via set_precision().
PRECISION = "highest"


def set_precision(p: str) -> None:
    global PRECISION
    PRECISION = p

__all__ = ["apply_r", "apply_s", "apply_t", "grad_rst", "grad_rst_t", "interp_nd", "interp_nd_t"]


def apply_r(a, u):
    """Contract the r axis (second-to-last): out[..., i, e] = sum_j a[i,j] u[..., j, e]."""
    return jnp.einsum("ij,...je->...ie", a, u, precision=PRECISION)


def apply_s(a, u):
    """Contract the s axis (third-to-last)."""
    return jnp.einsum("ij,...jre->...ire", a, u, precision=PRECISION)


def apply_t(a, u):
    """Contract the t axis (fourth-to-last, 3-D only)."""
    return jnp.einsum("ij,...jsre->...isre", a, u, precision=PRECISION)


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
