"""Krylov vector spaces over SEM flow fields.

The stability-analysis vector is {u: [ndim, nel, ...], theta: [nscal, ...]}
(velocity + active/passive scalars). Pressure and time-integration history are
NOT part of the vector: the propagator is self-starting (BDF ramp), which
makes it an exactly linear, exactly transposable map on these fields alone —
replacing the reference's lagged-slot plumbing
(/root/reference/src/vectors/neklab_vectors.f90:30-35, v*rst).

dot: mass-weighted global inner product over u and theta, pressure excluded —
the reference's semantics (real_vectors.f90:208-233). rand: Gaussian noise
made C0-conforming and BC-compliant via dsavg + masks (real_vectors.f90:99-114
semantics: opdssum + vmult + bcdirvc).

The extended space adds a scalar period T for UPO continuation
(nek_ext_dvector, neklab_vectors.f90:121-147): dot adds T*T, rand randomizes
T, get_size is DOFs + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .krylov.space import VectorSpace
from .mesh.core import SemMesh
from .ops import sem


def flow_vector(mesh: SemMesh, nscal: int, u=None, theta=None) -> dict:
    shape = mesh.bm1.shape
    dtype = mesh.bm1.dtype
    if u is None:
        u = jnp.zeros((mesh.ndim,) + shape, dtype)
    if theta is None:
        theta = jnp.zeros((nscal,) + shape, dtype)
    return {"u": u, "theta": theta}


def project_c0(mesh: SemMesh, vec: dict) -> dict:
    """Make a vector admissible: C0-continuous and BC-masked."""
    out = dict(vec)
    out["u"] = mesh.vmask * sem.dsavg(mesh, vec["u"])
    out["theta"] = mesh.tmask * sem.dsavg(mesh, vec["theta"])
    return out


def flow_vector_space(mesh: SemMesh, nscal: int) -> VectorSpace:
    def dot_fn(x, y):
        return jnp.sum(x["u"] * y["u"] * mesh.bm1) + jnp.sum(x["theta"] * y["theta"] * mesh.bm1)

    def rand_fn(key):
        ku, kt = jax.random.split(key)
        shape = mesh.bm1.shape
        dtype = mesh.bm1.dtype
        u = jax.random.normal(ku, (mesh.ndim,) + shape, dtype)
        theta = jax.random.normal(kt, (nscal,) + shape, dtype)
        return project_c0(mesh, {"u": u, "theta": theta})

    return VectorSpace(dot_fn=dot_fn, rand_fn=rand_fn)


def ext_flow_vector(mesh: SemMesh, nscal: int, u=None, theta=None, T=0.0) -> dict:
    v = flow_vector(mesh, nscal, u, theta)
    v["T"] = jnp.asarray(T, mesh.bm1.dtype)
    return v


def ext_flow_vector_space(mesh: SemMesh, nscal: int) -> VectorSpace:
    base = flow_vector_space(mesh, nscal)

    def dot_fn(x, y):
        return (
            jnp.sum(x["u"] * y["u"] * mesh.bm1)
            + jnp.sum(x["theta"] * y["theta"] * mesh.bm1)
            + x["T"] * y["T"]
        )

    def rand_fn(key):
        k1, k2 = jax.random.split(key)
        v = base.rand_fn(k1)
        v["T"] = jax.random.normal(k2, (), mesh.bm1.dtype)
        return v

    return VectorSpace(dot_fn=dot_fn, rand_fn=rand_fn)


def get_size(mesh: SemMesh, nscal: int, extended: bool = False) -> int:
    """Active DOF count (the reference's get_size, real_vectors.f90:235-247)."""
    n = (mesh.ndim + nscal) * int(mesh.bm1.size)
    return n + 1 if extended else n
