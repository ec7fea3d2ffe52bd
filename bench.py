"""Benchmark: linearized NS propagator throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: velocity-DOF * steps / second of the jitted linearized propagator
(the hot path of every stability analysis — each Arnoldi matvec is
O(10^2-10^3) of these steps; BASELINE.json: "Linearized-operator applies/sec
and DOF/s per chip"). The reference publishes no numbers (BASELINE.md), so
vs_baseline is measured against this framework's round-1 first-light value
(1.3e6 DOF*steps/s on TPU v5e) — the driver tracks the trend across rounds.
"""

import json
import time

import numpy as np

ROUND1_BASELINE = 1.3e6  # DOF*steps/s, first unoptimized measurement (r1)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.linearized import LinConfig, propagate
    from neklab_tpu.models.navier_stokes import FlowConfig

    dtype = jnp.float32
    order = 7
    mesh = box_mesh(
        (64, 16),
        ((0.0, 2 * np.pi), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"},
        order=order,
        dtype=dtype,
    )
    cfg = LinConfig(
        flow=FlowConfig(
            viscosity=1e-3, dt=2e-3, vtol=1e-5, ptol=1e-5, vmaxit=50, pmaxit=120
        )
    )
    y = mesh.x[1]
    base_u = jnp.stack([1 - y**2, 0 * y])
    base_theta = jnp.zeros((0,) + mesh.bm1.shape, dtype)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(0), (2,) + mesh.bm1.shape, dtype)
    th0 = jnp.zeros((0,) + mesh.bm1.shape, dtype)

    from neklab_tpu.models.navier_stokes import _BDF, helmholtz_diag
    from neklab_tpu.models.precond import build_e_preconditioner

    pc_e = build_e_preconditioner(mesh, cfg.flow.dt / (11.0 / 6.0))
    vdiag = helmholtz_diag(mesh, cfg.flow.viscosity, _BDF[3][0] / cfg.flow.dt, mesh.vmask)

    # nsteps: a real Arnoldi matvec integrates tau/dt = O(10^2-10^3) steps
    # (SURVEY 3.1); 100 steps is the representative regime where the
    # warm-started pressure solve has passed its startup transient.
    nsteps = 100
    dof = 2 * mesh.nel * mesh.npts

    def sync(o):
        # NOTE: on the axon (remote TPU) backend block_until_ready does not
        # reliably await enqueued work; force a host transfer instead.
        return float(np.asarray(o[0]).ravel()[:1][0])

    # warmup/compile
    out = propagate(mesh, cfg, base_u, base_theta, u0, th0, nsteps, pc_e=pc_e, vdiag=vdiag)
    sync(out)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = propagate(mesh, cfg, base_u, base_theta, out[0], th0, nsteps, pc_e=pc_e, vdiag=vdiag)
        sync(out)
    elapsed = (time.time() - t0) / reps

    value = dof * nsteps / elapsed
    print(
        json.dumps(
            {
                "metric": "linearized_propagator_dof_steps_per_s",
                "value": value,
                "unit": "DOF*steps/s",
                "vs_baseline": value / ROUND1_BASELINE,
            }
        )
    )


if __name__ == "__main__":
    main()
