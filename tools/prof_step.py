"""Per-component cost breakdown of the linearized step on the production
cylinder mesh (TPU) — where does the sustained ~9 ms/step go?

Times, at an Arnoldi-representative (B-normalized) state:
  * the full 50-step propagate (sustained + floor);
  * helmholtz_local apply, dssum, E apply (eb), preconditioner apply alone;
  * one velocity Helmholtz solve and one pressure solve with iteration
    counts (pcg_info) at production tolerances.

Usage: python tools/prof_step.py [--order 5]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=5)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from neklab_tpu.mesh.re2 import mesh_from_re2
    from neklab_tpu.models import stokes
    from neklab_tpu.models.linearized import LinConfig, propagate
    from neklab_tpu.models.navier_stokes import _BDF, FlowConfig, helmholtz_diag
    from neklab_tpu.models.precond import build_e_preconditioner
    from neklab_tpu.models.solvers import pcg_info
    from neklab_tpu.ops import sem
    from neklab_tpu.utils.fldfile import read_fld

    dtype = jnp.float32
    ref = "/root/reference/examples/cylinder/stability/direct"
    mesh = mesh_from_re2(f"{ref}/1cyl.re2", order=args.order, dealias_order=8, dtype=dtype)
    bf = read_fld(f"{ref}/BF_1cyl0.f00001")
    base_u = jnp.asarray(bf.u, dtype)
    dt_step = 1.0 / 178
    fc = FlowConfig(viscosity=0.02, dt=dt_step, vtol=3e-6, ptol=3e-6,
                    vmaxit=200, pmaxit=300)
    cfg = LinConfig(flow=fc)
    g0 = _BDF[3][0]
    pc = build_e_preconditioner(mesh, dt_step / g0)
    vdiag = helmholtz_diag(mesh, fc.viscosity, g0 / dt_step, mesh.vmask)
    th = jnp.zeros((0,) + mesh.bm1.shape, dtype)
    u0 = mesh.vmask * jax.random.normal(jax.random.PRNGKey(1), (2,) + mesh.bm1.shape, dtype)

    def sync(o):
        return float(np.asarray(o).ravel()[0])

    def t_apply(f, x, reps=args.reps):
        g = jax.jit(lambda v: _chain(f, v, reps))
        sync(g(x))
        t0 = time.time()
        sync(g(x))
        return (time.time() - t0) / reps

    def _chain(f, v, reps):
        import jax.lax as lax

        def body(c, _):
            return f(c), None

        out, _ = lax.scan(body, v, None, length=reps)
        return out

    res = {}
    h1, h2 = fc.viscosity, g0 / dt_step
    res["helmholtz_local_apply_s"] = t_apply(
        lambda v: sem.helmholtz_local(mesh, v, h1, h2), u0)
    res["dssum_s"] = t_apply(lambda v: sem.dssum(mesh, v), u0)
    q0 = jax.random.normal(jax.random.PRNGKey(2), mesh.bm2.shape, dtype)
    res["e_apply_eb_s"] = t_apply(lambda q: pc.e_apply(q, dt_step / g0), q0)
    res["e_op_chain_s"] = t_apply(lambda q: stokes.e_op(mesh, q, dt_step / g0), q0)
    res["pc_apply_s"] = t_apply(lambda q: pc.apply(q), q0)

    # solve counts at a unit-normalized state
    @jax.jit
    def bnorm(u):
        return u / jnp.sqrt(sem.mass_dot(mesh, u, u))

    u = bnorm(u0)
    sqw = jnp.sqrt(mesh.vmult)
    mask = mesh.vmask

    def vop(y):
        t = sem.dssum(mesh, sqw * y)
        hv = sem.dssum(mesh, sem.helmholtz_local(mesh, mask * t, h1, h2))
        return sqw * (mask * (hv - t)) + y

    rhs_v = mask * sqw * sem.dssum(mesh, mesh.bm1 * u)
    kv, _ = jax.jit(lambda: pcg_info(vop, rhs_v, precond=lambda r: r / vdiag,
                                     tol=fc.vtol, maxiter=fc.vmaxit)[1:])()
    res["helmholtz_iters"] = int(kv)
    rhs_p = -stokes.div_weak(mesh, u)
    ke, _ = jax.jit(lambda: pcg_info(lambda q: pc.e_apply(q, dt_step / g0), rhs_p,
                                     precond=pc.apply, tol=fc.ptol,
                                     maxiter=fc.pmaxit)[1:])()
    res["e_iters_cold"] = int(ke)

    # full step (sustained)
    def prop(v):
        return propagate(mesh, cfg, base_u, th, v, th, 50, pc_e=pc, vdiag=vdiag)[0]

    st = [bnorm(u0)]

    def run():
        o = prop(st[0])
        st[0] = bnorm(o)
        return o

    sync(run())
    t0 = time.time()
    for _ in range(3):
        o = run()
    sync(o)
    res["s_per_step_sustained"] = (time.time() - t0) / 3 / 50
    res["est_e_solve_per_step_s"] = res["e_iters_cold"] * (
        res["e_apply_eb_s"] + res["pc_apply_s"])
    res["est_helmholtz_per_step_s"] = res["helmholtz_iters"] * (
        res["helmholtz_local_apply_s"] + 2 * res["dssum_s"])
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
