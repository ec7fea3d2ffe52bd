"""Plane-Poiseuille linear stability (Orr-Sommerfeld spectrum).

Reference case: examples/poiseuille/stability/direct (Re=7500, kdim=128,
nev=20 — SURVEY section 6). The leading eigenvalues of exp(tau A) are mapped
back by log(mu)/tau and compared against an independently computed Chebyshev
Orr-Sommerfeld spectrum.

Usage: python examples/poiseuille_stability.py [--preset coarse|medium|fine]
                                               [--re 7500] [--alpha 1.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium", choices=["coarse", "medium", "fine"])
    ap.add_argument("--re", type=float, default=7500.0)
    ap.add_argument("--alpha", type=float, default=1.0, help="streamwise wavenumber of the box")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np
    import jax.numpy as jnp

    from neklab_tpu.analysis import linear_stability_analysis_fixed_point
    from neklab_tpu.linops.exponential_propagator import ExponentialPropagator
    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.linearized import LinConfig
    from neklab_tpu.models.navier_stokes import FlowConfig
    from neklab_tpu.utils.orr_sommerfeld import orr_sommerfeld_spectrum
    from neklab_tpu.vectors import flow_vector_space

    # Resolution note: Re=7500 critical layers need ~>55^2 points in 2-D;
    # smaller grids produce spurious unstable alpha=2 modes.
    presets = {
        #         nelx nely order tau   kdim nev
        "coarse": (8, 8, 7, 0.5, 64, 6),
        "medium": (12, 10, 8, 0.5, 96, 10),
        "fine": (16, 12, 9, 0.5, 128, 20),
    }
    nelx, nely, order, tau, kdim, nev = presets[args.preset]
    dtype = jnp.float64 if args.f64 else jnp.float32
    tols = dict(vtol=1e-12, ptol=1e-12) if args.f64 else dict(vtol=1e-7, ptol=1e-7)

    lx = 2 * np.pi / args.alpha
    mesh = box_mesh(
        (nelx, nely), ((0, lx), (-1, 1)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=order, dtype=dtype,
    )
    cfg = LinConfig(flow=FlowConfig(viscosity=1 / args.re, dt=2e-3, **tols))
    y = mesh.x[1]
    U = jnp.stack([1 - y**2, 0 * y])
    expA = ExponentialPropagator(mesh, cfg, U, tau=tau, cfl=0.5)
    space = flow_vector_space(mesh, 0)

    t0 = time.time()
    res = linear_stability_analysis_fixed_point(
        expA, space, kdim=kdim, nev=nev, tol=1e-6, maxiter=10
    )
    elapsed = time.time() - t0

    # oracle: Chebyshev OS spectrum at the box's harmonics
    lam_os = orr_sommerfeld_spectrum(args.re, args.alpha, 128)[:6]
    lead = res.eigvals[0]
    # match against the OS branch (conjugate pairs)
    err = min(
        min(abs(lead - l), abs(lead - np.conj(l))) for l in lam_os
    )
    out = {
        "case": "poiseuille_stability",
        "re": args.re,
        "alpha": args.alpha,
        "preset": args.preset,
        "eigvals": [[v.real, v.imag] for v in res.eigvals],
        "sigma1": float(res.eigvals[0].real),
        "os_leading": [lam_os[0].real, lam_os[0].imag],
        "os_match_err": float(err),
        "n_matvec": res.n_matvec,
        "seconds": elapsed,
    }
    print(json.dumps(out), flush=True)
    print(f"sigma1 = {out['sigma1']:.6f}  (OS oracle {lam_os[0].real:.6f}); "
          f"match error {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
