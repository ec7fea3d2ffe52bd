"""Benchmark: linearized NS propagator throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: velocity-DOF * steps / second of the jitted linearized
propagator on the round-1 box case (trend-comparable across rounds; the hot
path of every stability analysis — each Arnoldi matvec is O(10^2-10^3) such
steps; BASELINE.json: "Linearized-operator applies/sec and DOF/s per chip").
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against this framework's round-1 first-light value (1.3e6 DOF*steps/s).

extra (round-2 additions, VERDICT items):
  * cyl1996: the REFERENCE-SCALE case — the shipped 1996-element 1cyl.re2
    mesh at the parity discretization (order 5, dealias 8, f32), DOF*steps/s
    + per-step wall time;
  * box3d: a >=1M-DOF 3-D case;
  * cg_iters: velocity-Helmholtz and pressure-E CG iteration counts at the
    production tolerances on the cyl1996 case (solver-quality metric);
  * mfu: model-FLOPs/s of the cyl1996 propagator from XLA cost analysis and
    the fraction of the chip's bf16 peak (roofline context: the SEM step is
    HBM-bandwidth-bound at these sizes, so low MFU is expected and traffic
    is the optimization target);
  * pallas_helmholtz: fused Pallas local-Helmholtz apply vs the XLA chain on
    the cyl1996 mesh (kept: whichever wins; both recorded).
"""

import json
import time

import numpy as np

ROUND1_BASELINE = 1.3e6  # DOF*steps/s, first unoptimized measurement (r1)
PEAK_BF16_FLOPS = {  # per chip, public numbers
    "TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
    "TPU v5p": 459e12, "TPU v6e": 918e12,
}


def _sync(o):
    # NOTE: on the axon (remote TPU) backend block_until_ready does not
    # reliably await enqueued work; force a host transfer instead.
    return float(np.asarray(o).ravel()[:1][0])


def _time(fn, reps=3):
    out = fn()
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    _sync(out)
    return (time.time() - t0) / reps


def bench_box2d(jax, jnp):
    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.linearized import LinConfig, propagate
    from neklab_tpu.models.navier_stokes import FlowConfig, _BDF, helmholtz_diag
    from neklab_tpu.models.precond import build_e_preconditioner

    dtype = jnp.float32
    mesh = box_mesh(
        (64, 16), ((0.0, 2 * np.pi), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W"}, order=7, dtype=dtype,
    )
    cfg = LinConfig(flow=FlowConfig(
        viscosity=1e-3, dt=2e-3, vtol=1e-5, ptol=1e-5, vmaxit=50, pmaxit=120))
    y = mesh.x[1]
    base_u = jnp.stack([1 - y**2, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape, dtype)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(0), (2,) + mesh.bm1.shape, dtype)
    pc = build_e_preconditioner(mesh, cfg.flow.dt / (11 / 6))
    vdiag = helmholtz_diag(mesh, cfg.flow.viscosity, _BDF[3][0] / cfg.flow.dt, mesh.vmask)

    nsteps = 100
    dof = 2 * mesh.nel * mesh.npts
    state = [u0]

    def run():
        out = propagate(mesh, cfg, base_u, th, state[0], th, nsteps, pc_e=pc, vdiag=vdiag)
        state[0] = out[0]
        return out[0]

    dt = _time(run)
    return {"dof": dof, "steps_per_call": nsteps, "s_per_step": dt / nsteps,
            "dof_steps_per_s": dof * nsteps / dt}


def bench_cyl1996(jax, jnp):
    """Reference-scale: the shipped 1cyl.re2 at the parity discretization."""
    from neklab_tpu.mesh.re2 import mesh_from_re2
    from neklab_tpu.models.linearized import LinConfig, propagate
    from neklab_tpu.models.navier_stokes import (
        _BDF, FlowConfig, helmholtz_diag, make_pressure_solver,
    )
    from neklab_tpu.models.precond import build_e_preconditioner
    from neklab_tpu.models.solvers import pcg_info
    from neklab_tpu.models import stokes
    from neklab_tpu.ops import sem
    from neklab_tpu.utils.fldfile import read_fld

    dtype = jnp.float32
    ref = "/root/reference/examples/cylinder/stability/direct"
    mesh = mesh_from_re2(f"{ref}/1cyl.re2", order=5, dealias_order=8, dtype=dtype)
    bf = read_fld(f"{ref}/BF_1cyl0.f00001")
    base_u = jnp.asarray(bf.u, dtype)
    dt_step = 1.0 / 178  # the parity run's CFL-derived dt
    fc = FlowConfig(viscosity=0.02, dt=dt_step, vtol=3e-6, ptol=3e-6,
                    vmaxit=200, pmaxit=300)
    cfg = LinConfig(flow=fc)
    g0 = _BDF[3][0]
    pc = build_e_preconditioner(mesh, dt_step / g0)
    vdiag = helmholtz_diag(mesh, fc.viscosity, g0 / dt_step, mesh.vmask)
    th = jnp.zeros((0,) + mesh.bm1.shape, dtype)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(1), (2,) + mesh.bm1.shape, dtype)

    nsteps = 50
    dof = 2 * mesh.nel * mesh.npts
    state = [u0]

    def run():
        out = propagate(mesh, cfg, base_u, th, state[0], th, nsteps, pc_e=pc, vdiag=vdiag)
        state[0] = out[0]
        return out[0]

    dt = _time(run)
    case = {"nel": mesh.nel, "order": 5, "dof": dof, "steps_per_call": nsteps,
            "s_per_step": dt / nsteps, "dof_steps_per_s": dof * nsteps / dt}

    # ---- model-FLOPs / MFU from XLA cost analysis (may be absent on some
    # backends) ----
    try:
        lowered = jax.jit(
            lambda u: propagate(mesh, cfg, base_u, th, u, th, nsteps, pc_e=pc, vdiag=vdiag)
        ).lower(state[0])
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        kind = jax.devices()[0].device_kind
        peak = PEAK_BF16_FLOPS.get(kind, 197e12)
        case["model_flops_per_call"] = flops
        case["model_flops_per_s"] = flops / dt
        case["mfu_vs_bf16_peak"] = flops / dt / peak
        case["device_kind"] = kind
    except Exception as e:  # pragma: no cover
        case["mfu_error"] = str(e)[:200]

    # ---- CG iteration counts at production tolerances (pcg_info re-runs
    # one representative solve of each kind outside custom_linear_solve) ----
    u = state[0]
    sqw = jnp.sqrt(mesh.vmult)
    mask = mesh.vmask
    h1, h2 = fc.viscosity, g0 / dt_step

    def vop(y):
        t = sem.dssum(mesh, sqw * y)
        hv = sem.dssum(mesh, sem.helmholtz_local(mesh, mask * t, h1, h2))
        return sqw * (mask * (hv - t)) + y

    rhs_v = mask * sqw * sem.dssum(mesh, mesh.bm1 * u)

    @jax.jit
    def count_v():
        x, k, rr = pcg_info(vop, rhs_v, precond=lambda r: r / vdiag,
                            tol=fc.vtol, maxiter=fc.vmaxit)
        return k, rr

    kv, rrv = count_v()
    case["helmholtz_cg_iters"] = int(kv)

    eop = lambda q: stokes.e_op(mesh, q, dt_step / g0)
    rhs_p = -stokes.div_weak(mesh, u)

    @jax.jit
    def count_e(warm):
        x, k, rr = pcg_info(eop, rhs_p, precond=pc.apply, tol=fc.ptol,
                            maxiter=fc.pmaxit, x0=None)
        return k, rr

    ke, rre = count_e(False)
    case["e_cg_iters"] = int(ke)

    # ---- Pallas fused Helmholtz vs the XLA chain ----
    try:
        from neklab_tpu.ops.pallas_kernels import HelmholtzPallas2D

        hp = HelmholtzPallas2D(mesh, h1, h2)
        xla_apply = jax.jit(lambda v: sem.helmholtz_local(mesh, v, h1, h2))
        pal_apply = jax.jit(lambda v: hp(v))
        # check agreement first
        a = np.asarray(xla_apply(u[0]))
        b = np.asarray(pal_apply(u[0]))
        scale = np.abs(a).max() + 1e-30
        err = np.abs(a - b).max() / scale
        reps = 50
        v = u[0]

        def many(f):
            def run():
                out = v
                for _ in range(reps):
                    out = f(out)
                return out
            g = jax.jit(run)
            g()  # compile
            t0 = time.time()
            _sync(g())
            return (time.time() - t0) / reps

        t_xla = many(xla_apply)
        t_pal = many(pal_apply)
        case["pallas_helmholtz"] = {
            "rel_err": float(err), "xla_s": t_xla, "pallas_s": t_pal,
            "winner": "pallas" if t_pal < t_xla else "xla",
        }
    except Exception as e:  # pragma: no cover
        case["pallas_helmholtz"] = {"error": str(e)[:200]}
    return case


def bench_box3d(jax, jnp):
    """>=1M velocity DOF, 3-D duct."""
    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.models.linearized import LinConfig, propagate
    from neklab_tpu.models.navier_stokes import _BDF, FlowConfig, helmholtz_diag
    from neklab_tpu.models.precond import build_e_preconditioner

    dtype = jnp.float32
    mesh = box_mesh(
        (12, 12, 12), ((0.0, 4.0), (-1.0, 1.0), (-1.0, 1.0)),
        {"x-": "P", "x+": "P", "y-": "W", "y+": "W", "z-": "W", "z+": "W"},
        order=5, dtype=dtype,
    )
    cfg = LinConfig(flow=FlowConfig(
        viscosity=1e-3, dt=2e-3, vtol=1e-5, ptol=1e-5, vmaxit=60, pmaxit=150))
    y, z = mesh.x[1], mesh.x[2]
    base_u = jnp.stack([(1 - y**2) * (1 - z**2), 0 * y, 0 * y])
    th = jnp.zeros((0,) + mesh.bm1.shape, dtype)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(2), (3,) + mesh.bm1.shape, dtype)
    pc = build_e_preconditioner(mesh, cfg.flow.dt / (11 / 6))
    vdiag = helmholtz_diag(mesh, cfg.flow.viscosity, _BDF[3][0] / cfg.flow.dt, mesh.vmask)

    nsteps = 20
    dof = 3 * mesh.nel * mesh.npts
    state = [u0]

    def run():
        out = propagate(mesh, cfg, base_u, th, state[0], th, nsteps, pc_e=pc, vdiag=vdiag)
        state[0] = out[0]
        return out[0]

    dt = _time(run, reps=2)
    return {"nel": mesh.nel, "order": 5, "dof": dof, "steps_per_call": nsteps,
            "s_per_step": dt / nsteps, "dof_steps_per_s": dof * nsteps / dt}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    box2d = bench_box2d(jax, jnp)
    cyl = bench_cyl1996(jax, jnp)
    box3d = bench_box3d(jax, jnp)

    value = box2d["dof_steps_per_s"]
    print(
        json.dumps(
            {
                "metric": "linearized_propagator_dof_steps_per_s",
                "value": value,
                "unit": "DOF*steps/s",
                "vs_baseline": value / ROUND1_BASELINE,
                "extra": {"box2d_131k": box2d, "cyl1996_ref_scale": cyl,
                          "box3d_1p1M": box3d},
            }
        )
    )


if __name__ == "__main__":
    main()
