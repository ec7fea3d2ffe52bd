"""Unit tests for the utility layer: .par parsing, field I/O, timers,
timestep contract, native library."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from neklab_tpu.mesh.box import box_mesh
from neklab_tpu.models.navier_stokes import FlowConfig, initial_state
from neklab_tpu.utils.io import (
    load_checkpoint,
    load_field_file,
    load_spectrum,
    outpost,
    save_checkpoint,
    save_spectrum,
)
from neklab_tpu.utils.parfile import load_par
from neklab_tpu.utils.timers import Timers
from neklab_tpu.utils.timestep import cfl_dt, horizon_steps


def test_parfile_reference_cases():
    pc = load_par("/root/reference/examples/cylinder/stability/direct/1cyl.par")
    assert pc.config.viscosity == pytest.approx(1 / 50)  # viscosity = -50 -> 1/50
    assert pc.config.vtol == pytest.approx(1e-9)
    assert pc.config.ptol == pytest.approx(1e-7)
    assert pc.config.torder == 3
    assert pc.nsteps == 100
    assert pc.target_cfl == pytest.approx(0.25)

    pc2 = load_par("/root/reference/examples/rayBen/baseflow/rayBen.par")
    assert pc2.config.nscal == 1
    assert pc2.config.conductivity == (1.0,)
    assert pc2.user_params[6] == pytest.approx(1900.0)
    assert pc2.end_time == pytest.approx(10.0)
    assert pc2.start_from == "BF_rayBen0.f00001"


def test_field_io_roundtrip(tmp_path):
    mesh = box_mesh((2, 2), ((0, 1), (0, 1)), {"x-": "P", "x+": "P"}, order=3)
    cfg = FlowConfig(viscosity=0.1, dt=0.01)
    st = initial_state(mesh, cfg, u=jnp.stack([mesh.x[0], mesh.x[1]]))
    p = save_checkpoint(str(tmp_path / "ck.npz"), st, extra={"note": 1.0})
    st2 = load_checkpoint(p, st)
    assert float(jnp.max(jnp.abs(st2.u - st.u))) == 0.0

    fp = outpost(str(tmp_path), {"u": st.u}, mesh=mesh, prefix="dir", case="t", time=1.5)
    data = load_field_file(fp)
    assert data["__time__"] == 1.5
    assert data["u"].shape == st.u.shape
    # counter increments
    fp2 = outpost(str(tmp_path), {"u": st.u}, prefix="dir", case="t")
    assert fp2.endswith("f00002.npz")

    save_spectrum(str(tmp_path / "spec.npy"), np.array([1 + 2j, 3 - 4j]))
    ev = load_spectrum(str(tmp_path / "spec.npy"))
    assert np.allclose(ev, [1 + 2j, 3 - 4j])


def test_timers():
    t = Timers()
    with t("outer"):
        with t("inner"):
            pass
        with t("inner"):
            pass
    assert t.counts["outer"] == 1
    assert t.counts["outer/inner"] == 2
    assert "inner" in t.report()


def test_horizon_contract():
    # nsteps * dt == tau EXACTLY (setup_nek fintim contract, SURVEY hard pt 5)
    for tau, dtmax in [(1.0, 0.3), (5.158, 0.01), (2 * np.pi, 0.0499)]:
        dt, nsteps = horizon_steps(tau, dtmax)
        assert dt <= dtmax * (1 + 1e-12)
        assert nsteps * dt == pytest.approx(tau, rel=1e-15)


def test_cfl_dt():
    mesh = box_mesh((4, 2), ((0, 4), (0, 1)), {"x-": "P", "x+": "P"}, order=5)
    u = jnp.stack([2.0 * jnp.ones_like(mesh.bm1), jnp.zeros_like(mesh.bm1)])
    dt = cfl_dt(mesh, u, cfl=0.5)
    # min spacing ~ smallest GLL gap; dt = 0.5 * min_dx / 2
    assert 0 < dt < 0.1


def test_native_vs_python_coloring():
    from neklab_tpu import native
    from neklab_tpu.models.precond import element_adjacency

    if not native.available():
        pytest.skip("no native toolchain")
    mesh = box_mesh((6, 4), ((0, 1), (0, 1)), {"x-": "P", "x+": "P"}, order=4)
    gel = np.asarray(mesh.gidx).reshape(-1, mesh.nel).T
    c2, c3 = native.adjacency_colorings(gel, mesh.nel)
    adj = element_adjacency(mesh)
    assert all(c2[e] != c2[u] for e in range(mesh.nel) for u in adj[e])
    # distance-2 validity for c3
    for e in range(mesh.nel):
        for u in adj[e]:
            assert c3[e] != c3[u]
            for w in adj[u]:
                if w != e:
                    assert c3[e] != c3[w]
    part = native.rcb_partition(
        np.stack([np.asarray(mesh.x[d]).reshape(-1, mesh.nel).mean(0) for d in range(2)], 1), 4
    )
    assert np.bincount(part).tolist() == [6, 6, 6, 6]


# ---------------------------------------------------------------------------
# Nek binary .fld field files
# ---------------------------------------------------------------------------


def test_fld_roundtrip(tmp_path):
    """write_fld -> read_fld preserves fields (f4 storage), layout, and map."""
    import jax
    import jax.numpy as jnp

    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.utils.fldfile import read_fld, write_fld

    mesh = box_mesh(
        (3, 2), ((0.0, 3.0), (0.0, 2.0)),
        {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=4,
    )
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (2,) + mesh.bm1.shape)
    p = jax.random.normal(jax.random.PRNGKey(1), mesh.bm2.shape)
    t = jax.random.normal(jax.random.PRNGKey(2), mesh.bm1.shape)
    path = str(tmp_path / "chk0.f00001")
    write_fld(path, mesh=mesh, u=u, p=p, t=t, time=1.5, wdsize=4)

    f = read_fld(path)
    assert f.ndim == 2 and f.lx == 5 and f.nelt == mesh.nel
    assert abs(f.time - 1.5) < 1e-12
    assert np.allclose(f.x, np.asarray(mesh.x), atol=1e-6)
    assert np.allclose(f.u, np.asarray(u), atol=1e-6)
    assert np.allclose(f.t, np.asarray(t), atol=1e-6)
    # pressure was mapped (n-2)-grid -> GLL on write: compare against j21 map
    from neklab_tpu.ops.tensor import interp_nd

    j21 = jnp.asarray(mesh.basis.j21, dtype=mesh.bm1.dtype)
    p_gll = np.asarray(interp_nd(j21, p, 2))
    assert np.allclose(f.p, p_gll, atol=1e-5)
    assert list(f.emap) == list(range(1, mesh.nel + 1))


def test_fld_f64_and_scalars(tmp_path):
    from neklab_tpu.mesh.box import box_mesh
    from neklab_tpu.utils.fldfile import read_fld, write_fld

    mesh = box_mesh(
        (2, 2), ((0.0, 1.0), (0.0, 1.0)),
        {"x-": "W", "x+": "W", "y-": "W", "y+": "W"}, order=3,
    )
    s = np.stack([np.asarray(mesh.x[0]) ** k for k in (1, 2)])
    path = str(tmp_path / "sca0.f00001")
    write_fld(path, mesh=mesh, u=np.asarray(mesh.x), s=s, wdsize=8)
    f = read_fld(path)
    assert f.s.shape == s.shape
    assert np.allclose(f.s, s, atol=1e-14)  # f8 roundtrip is exact-ish
