"""Reference `.re2` mesh import: parse + geometry + connectivity oracles.

Uses the actual mesh files shipped with the reference examples as fixtures
(/root/reference/examples/*; read-only data, SURVEY section 2.2 mesh-tooling
row). Skipped when the reference tree is not present.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference/examples"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")

CYL = f"{REF}/cylinder/stability/direct/1cyl.re2"
TSY = f"{REF}/thermosyphon/baseflow/tsyphon.re2"
BFS = f"{REF}/back_fstep/transient_growth/bfs.re2"


def test_read_re2_headers():
    from neklab_tpu.mesh.re2 import read_re2

    d = read_re2(CYL)
    assert d.ndim == 2 and d.nel == 1996
    codes = {c for _, _, _, c in d.bcs[0]}
    assert codes == {"P", "v", "O", "W"}
    assert all(c == "C" for _, _, _, c in d.curves)  # cylinder-surface arcs

    d2 = read_re2(TSY)
    assert d2.nel == 256 and len(d2.bcs) == 2  # velocity + temperature blocks
    assert {c for _, _, _, c in d2.curves} == {"C"}


def test_cylinder_mesh_geometry():
    """Curved-arc Gordon-Hall coordinates: positive Jacobians and the domain
    volume equals box minus cylinder to the arc-resolution accuracy."""
    from neklab_tpu.mesh.re2 import mesh_from_re2, read_re2

    mesh = mesh_from_re2(CYL, order=4)
    jac = np.asarray(mesh.jac)
    assert (jac > 0).all()
    d = read_re2(CYL)
    box = (d.xc.max() - d.xc.min()) * (d.yc.max() - d.yc.min())
    vol_exact = box - np.pi * 0.5**2  # unit-diameter cylinder removed
    assert abs(float(mesh.volume) - vol_exact) / vol_exact < 1e-4

    # outflow pins pressure somewhere; walls/inflow constrain velocity
    assert not mesh.p_fixed
    assert (np.asarray(mesh.vmask) == 0).any()

    # C0: averaging a globally smooth field is (near-)identity — curved
    # shared edges agree to the connectivity tolerance
    from neklab_tpu.ops import sem

    f = jnp.sin(mesh.x[0]) * jnp.cos(mesh.x[1])
    assert float(jnp.max(jnp.abs(sem.dsavg(mesh, f) - f))) < 1e-5


def test_thermosyphon_mesh_closed_annulus():
    from neklab_tpu.mesh.re2 import mesh_from_re2
    from neklab_tpu.ops import sem

    mesh = mesh_from_re2(TSY, order=4)
    jac = np.asarray(mesh.jac)
    assert (jac > 0).all()
    assert mesh.p_fixed  # enclosed flow: pure-Neumann pressure
    f = jnp.sin(mesh.x[0]) * jnp.cos(mesh.x[1])
    assert float(jnp.max(jnp.abs(sem.dsavg(mesh, f) - f))) < 1e-12


def test_bfs_mesh_gmsh_import():
    """gmsh2nek-produced mesh: 'm' midpoint curves, MSH placeholder BCs
    (the reference assigns real BCs in usrdat2) -> all-interior masks."""
    from neklab_tpu.mesh.re2 import mesh_from_re2

    mesh = mesh_from_re2(BFS, order=3)
    assert (np.asarray(mesh.jac) > 0).all()
    assert (np.asarray(mesh.vmask) == 1).all()  # MSH = unassigned


def test_bfs_bc_fn_usrdat2_analog():
    """Assign BCs on the gmsh-imported BFS mesh via the bc_fn hook: inflow at
    x=-20, outflow at x=100, walls elsewhere (the reference's usrdat2 role)."""
    from neklab_tpu.mesh.re2 import mesh_from_re2

    def bc_fn(c):
        if abs(c[0] - (-20.0)) < 1e-6:
            return "v"
        if abs(c[0] - 100.0) < 1e-6:
            return "O"
        return "W"

    mesh = mesh_from_re2(BFS, order=3, bc_fn=bc_fn)
    vm = np.asarray(mesh.vmask)
    pm = np.asarray(mesh.pmask)
    assert (vm == 0).any() and (pm == 0).any()
    assert not mesh.p_fixed  # outflow present
    # inflow nodes (x = -20) must be velocity-constrained
    xx = np.asarray(mesh.x[0])
    at_in = np.abs(xx - (-20.0)) < 1e-9
    assert (vm[0][at_in] == 0).all()


def test_box_file_reader():
    """genbox .box inputs: rectilinear rayBen (graded-capable, P/W + t BCs)
    and cylindrical tsyphon (polar map, exact annulus volume)."""
    from neklab_tpu.mesh.boxfile import mesh_from_box
    from neklab_tpu.ops import sem

    m = mesh_from_box(f"{REF}/rayBen/baseflow/rayBen.box", order=5)
    assert m.nel == 40  # 10 x 4
    assert abs(float(m.volume) - 2.0158) < 1e-12
    assert (np.asarray(m.tmask) == 0).any()  # t walls top/bottom
    f = jnp.sin(2 * np.pi * m.x[0] / 2.0158) * jnp.cos(m.x[1])
    assert float(jnp.max(jnp.abs(sem.dsavg(m, f) - f))) < 1e-13  # x-periodic

    m2 = mesh_from_box(f"{REF}/thermosyphon/baseflow/tsyphon.box", order=4)
    assert m2.nel == 256  # 8 x 32
    assert abs(float(m2.volume) - np.pi * 3.0) < 1e-10  # annulus r in [1, 2]
    assert m2.p_fixed  # enclosed
    assert (np.asarray(m2.jac) > 0).all()


def test_masks_copy_consistent():
    """Local Dirichlet masks must agree across all element copies of each
    shared DOF (min-over-copies scattered back) — otherwise the weighted
    local CG operator in helmholtz_solve is asymmetric and Dirichlet values
    leak on free copies (meshes with mid-boundary BC transitions)."""
    from neklab_tpu.mesh.re2 import mesh_from_re2

    mesh = mesh_from_re2(CYL, order=3)
    gidx = np.asarray(mesh.gidx).reshape(-1)
    vm = np.asarray(mesh.vmask)
    tm = np.asarray(mesh.tmask).reshape(-1)
    for c in range(mesh.ndim):
        per_dof_min = np.ones(mesh.nglob)
        np.minimum.at(per_dof_min, gidx, vm[c].reshape(-1))
        assert np.array_equal(vm[c].reshape(-1), per_dof_min[gidx])
    per_dof_min = np.ones(mesh.nglob)
    np.minimum.at(per_dof_min, gidx, tm)
    assert np.array_equal(tm, per_dof_min[gidx])


def test_box_file_explicit_edges(tmp_path):
    """Positive nel in a .box file means the 'x0 x1 ratio' line is REPLACED
    by nel+1 explicit element edges (genbox format)."""
    from neklab_tpu.mesh.boxfile import mesh_from_box

    box = """\
2                 ndim
1                 nfields
Box
3 -2              nelx nely
0.0 0.5 2.0 4.0   explicit x edges (nel+1 = 4)
0.0 1.0 1.0       y0 y1 ratio
W  ,W  ,W  ,W  ,
"""
    p = tmp_path / "exp.box"
    p.write_text(box)
    m = mesh_from_box(str(p), order=3)
    assert m.nel == 6  # 3 x 2
    assert abs(float(m.volume) - 4.0) < 1e-12
    xs = np.unique(np.round(np.asarray(m.x[0]).reshape(-1), 12))
    for edge in (0.0, 0.5, 2.0, 4.0):
        assert np.any(np.abs(xs - edge) < 1e-12)


def test_fld_emap_reorder_aligns_with_re2():
    """BF_1cyl0.f00001 was written by a 12-rank run (non-identity element
    map); read_fld's default reorder must land elements in global (.re2)
    order — verified by matching the stored mesh coordinates."""
    from neklab_tpu.mesh.re2 import mesh_from_re2
    from neklab_tpu.utils.fldfile import read_fld

    f = read_fld(f"{REF}/cylinder/stability/direct/BF_1cyl0.f00001")
    assert list(f.emap) == list(range(1, f.nelt + 1))
    mesh = mesh_from_re2(CYL, order=f.lx - 1)
    assert np.abs(f.x - np.asarray(mesh.x)).max() < 1e-5  # f4 storage

    raw = read_fld(f"{REF}/cylinder/stability/direct/BF_1cyl0.f00001", reorder=False)
    assert list(raw.emap) != list(range(1, raw.nelt + 1))


def test_mesh_cache_roundtrip(tmp_path, monkeypatch):
    """The persisted-mesh cache must reproduce the built SemMesh exactly
    (arrays + static aux data) and actually be HIT on the second load
    (VERDICT r3 weak #6: 85 s cold preprocessing on the production mesh)."""
    import os
    import jax

    from neklab_tpu.mesh.re2 import mesh_from_re2

    monkeypatch.setenv("NEKLAB_MESH_CACHE", str(tmp_path))
    m1 = mesh_from_re2(CYL, order=4, cache=True)
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("re2_")
    m2 = mesh_from_re2(CYL, order=4, cache=True)  # hit
    # exact roundtrip: every array leaf and every static field
    l1 = jax.tree_util.tree_leaves(m1)
    l2 = jax.tree_util.tree_leaves(m2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for f in ("ndim", "nel", "nglob", "bc", "fp_nvert", "fp_roll_off", "vs_roll_off"):
        assert getattr(m1, f) == getattr(m2, f), f
    assert m1.basis.n == m2.basis.n and m1.basis.nd == m2.basis.nd
    # different build params get a different entry
    m3 = mesh_from_re2(CYL, order=3, cache=True)
    assert len(os.listdir(tmp_path)) == 2
    assert m3.basis.n == 4
