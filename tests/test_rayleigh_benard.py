"""Rayleigh-Benard stability: recover the critical Rayleigh number.

Linear stability of the conduction state (u=0, Theta=1-y) between rigid
walls at the critical wavenumber k_c = 3.11632: onset at
Ra_c = 1707.762 (Chandrasekhar). Exercises the full Boussinesq coupling:
temperature advection-diffusion, buoyancy lin_forcing, coupled (u, theta)
Krylov vectors.

Reference analog: examples/rayBen (supercriticality check Ra=1900 > Ra_c,
rayBen.par:6-10) — here the actual critical value is computed."""

import numpy as np
import pytest
import jax.numpy as jnp

from neklab_tpu.analysis import linear_stability_analysis_fixed_point
from neklab_tpu.linops.exponential_propagator import ExponentialPropagator
from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.linearized import LinConfig
from neklab_tpu.models.navier_stokes import FlowConfig
from neklab_tpu.vectors import flow_vector_space

KC = 3.11632
RAC = 1707.762


def _sigma(ra: float) -> float:
    lx = 2 * np.pi / KC
    mesh = box_mesh(
        (3, 3), ((0, lx), (0, 1.0)), {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=6, bc_temp={"y-": "t", "y+": "t"},
    )
    pr = 1.0
    fc = FlowConfig(
        viscosity=pr, dt=1e-3, nscal=1, conductivity=(1.0,),
        vtol=1e-12, ptol=1e-12, ttol=1e-12,
    )
    buoy = lambda m, u, th: jnp.concatenate(
        [jnp.zeros_like(th[0])[None], (ra * pr * th[0])[None]]
    )
    cfg = LinConfig(flow=fc, lin_forcing_fn=buoy)
    y = mesh.x[1]
    U = jnp.zeros((2,) + mesh.bm1.shape)
    Th = jnp.stack([1.0 - y])
    expA = ExponentialPropagator(mesh, cfg, U, Th, tau=0.05, dt=1e-3)
    space = flow_vector_space(mesh, 1)
    res = linear_stability_analysis_fixed_point(expA, space, kdim=30, nev=1, tol=1e-8, maxiter=10)
    assert res.residuals[0] < 1e-8
    return float(res.eigvals[0].real)


@pytest.mark.slow
def test_critical_rayleigh_number():
    ra_lo, ra_hi = 1690.0, 1725.0
    s_lo, s_hi = _sigma(ra_lo), _sigma(ra_hi)
    assert s_lo < 0 < s_hi
    ra_c = ra_lo + (ra_hi - ra_lo) * (-s_lo) / (s_hi - s_lo)
    assert abs(ra_c - RAC) < 3.0, ra_c
