"""Curved annular (O-grid) meshes: cylinder-in-crossflow and thermosyphon.

Structured polar mesh (nel_r radial x nel_t angular elements, theta-periodic)
with exact circular-arc element geometry (GLL nodes placed by the polar map,
so the curvature is represented to the full polynomial order — the counterpart
of the reference's curved-side `.re2` cylinder meshes,
examples/cylinder/*). Radial element edges support geometric grading to
cluster resolution at the cylinder surface.

BCs: inner circle is a wall ('W'); the outer circle is either a wall
(thermosyphon annulus), or split upstream-inflow 'v' / downstream-outflow 'O'
at |angle| >= 90 deg (cylinder in free stream).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.basis import make_basis
from ..ops.geometry import compute_geom
from .core import SemMesh, build_mesh


def annulus_mesh(
    nel_r: int,
    nel_t: int,
    r_in: float = 0.5,
    r_out: float = 10.0,
    order: int = 6,
    grading: float = 1.3,
    outer_bc: str = "W",
    bc_temp: tuple[str, str] | None = None,
    dealias_order: int | None = None,
    shift: float = 0.0,
    dtype=jnp.float64,
) -> SemMesh:
    """Build an annular SemMesh.

    grading: ratio between consecutive radial element sizes (>1 clusters at
    the inner circle). outer_bc: 'W' (annulus) or 'vO' (upstream Dirichlet
    inflow + downstream outflow split at x = 0).
    bc_temp: optional ('t'|'I', 't'|'I') for (inner, outer) temperature BCs.
    shift: downstream skewing of the O-grid (fraction of r_out the outer
    rings are displaced in +x), clustering wake resolution behind the
    cylinder — the O-grid analog of the reference's wake-refined meshes.
    """
    n = order + 1
    nd = dealias_order + 1 if dealias_order is not None else None
    basis = make_basis(n, nd)

    # radial element edges with geometric grading
    if abs(grading - 1.0) < 1e-12:
        widths = np.ones(nel_r)
    else:
        widths = grading ** np.arange(nel_r)
    widths = widths / widths.sum() * (r_out - r_in)
    redges = np.concatenate([[r_in], r_in + np.cumsum(widths)])
    tedges = np.linspace(0.0, 2 * np.pi, nel_t + 1)

    z01 = (basis.z + 1.0) / 2.0
    # per-element GLL coordinates in (r, theta)
    rg = redges[:-1, None] + z01[None, :] * np.diff(redges)[:, None]  # [nel_r, n]
    tg = tedges[:-1, None] + z01[None, :] * np.diff(tedges)[:, None]  # [nel_t, n]

    nel = nel_r * nel_t
    # element (et, er): index e = et * nel_r + er; axes [e, s=theta, r=radial]
    r_full = np.broadcast_to(rg[None, :, None, :], (nel_t, nel_r, n, n))
    t_full = np.broadcast_to(tg[:, None, :, None], (nel_t, nel_r, n, n))
    frac = (r_full - r_in) / (r_out - r_in)
    xshift = shift * r_out * frac**2
    x = np.stack([r_full * np.cos(t_full) + xshift, r_full * np.sin(t_full)], axis=0)
    x = x.reshape(2, nel, n, n)

    # structured numbering: radial nodes npr = nel_r*(n-1)+1 (not periodic),
    # angular npt = nel_t*(n-1) (periodic)
    npr = nel_r * (n - 1) + 1
    gr = np.arange(nel_r)[:, None] * (n - 1) + np.arange(n)[None, :]  # [nel_r, n]
    gt = (np.arange(nel_t)[:, None] * (n - 1) + np.arange(n)[None, :]) % (nel_t * (n - 1))
    gidx = (
        np.broadcast_to(gt[:, None, :, None], (nel_t, nel_r, n, n)) * npr
        + np.broadcast_to(gr[None, :, None, :], (nel_t, nel_r, n, n))
    ).reshape(nel, n, n)
    _, gidx = np.unique(gidx, return_inverse=True)
    gidx = gidx.reshape(nel, n, n)

    full = (nel_t, nel_r, n, n)
    vmask = np.ones((2,) + full)
    pmask = np.ones(full)
    tmask = np.ones(full)

    # inner wall: er == 0, radial node index 0 (last axis)
    vmask[:, :, 0, :, 0] = 0.0
    if bc_temp and bc_temp[0].lower() == "t":
        tmask[:, 0, :, 0] = 0.0

    # outer boundary: er == nel_r-1, radial node -1
    if outer_bc == "W":
        vmask[:, :, -1, :, -1] = 0.0
        if bc_temp and bc_temp[1].lower() == "t":
            tmask[:, -1, :, -1] = 0.0
    elif outer_bc == "vO":
        theta_outer = t_full.reshape(nel_t, nel_r, n, n)[:, -1, :, -1]
        upstream = np.cos(theta_outer) < 0.0  # x < 0: inflow
        for c in range(2):
            vmask[c, :, -1, :, -1] = np.where(upstream, 0.0, 1.0)
        pmask[:, -1, :, -1] = np.where(upstream, 1.0, 0.0)  # p pinned at outflow
    else:
        raise ValueError(outer_bc)

    vmask = vmask.reshape(2, nel, n, n)
    pmask = pmask.reshape(nel, n, n)
    tmask = tmask.reshape(nel, n, n)

    geom = compute_geom(x, basis)
    bc_meta = (
        ("inner", "W"),
        ("outer", outer_bc),
        ("__struct__", f"{nel_t},{nel_r},1,0"),  # theta periodic, r not
    )
    return build_mesh(geom, basis, gidx, vmask, pmask, tmask, bc=bc_meta, dtype=dtype)
