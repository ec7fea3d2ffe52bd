"""P(N)/P(N-2) divergence/gradient pair and the pressure (E) operator.

The pressure lives on the element-interior Gauss grid (mesh 2) and is
discontinuous across elements, so it needs no boundary conditions and no
gather-scatter — incompressibility and all pressure coupling happen through
the div/grad pair:

  div_weak(u)[q]  = (q, div u)      : velocity -> pressure space
  grad_weak_t(p)  = div_weak^T p    : the (p, div v) momentum term

grad_weak_t is the hand-written exact Euclidean transpose of div_weak (there
is an adjointness unit test), so the fractional-step scheme's E operator

  E = div ( (dt/g0) Binv_masked dssum( grad^T . ) )

is symmetric positive semi-definite by construction and solved with CG.

Reference parity: Nek5000's `opdiv`/`opgradt` multiplication by the E
("consistent Poisson") operator in plan 3; the scheme has *no* artificial
pressure boundary condition — BCs enter only through the velocity masks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..mesh.core import SemMesh
from ..ops import sem
from ..ops import tensor as _tensor
from ..ops.tensor import grad_rst, grad_rst_t, interp_nd, interp_nd_t


def tensor_precision():
    return _tensor.PRECISION


def _d(mesh: SemMesh):
    return jnp.asarray(mesh.basis.d, dtype=mesh.bm1.dtype)


def _j12(mesh: SemMesh):
    return jnp.asarray(mesh.basis.j12, dtype=mesh.bm1.dtype)


def div_weak(mesh: SemMesh, u: jnp.ndarray) -> jnp.ndarray:
    """(q, div u) for all pressure test functions q: [ndim, nel, ...] ->
    [nel, (n-2)^ndim]."""
    d = _d(mesh)
    divu = None
    for k in range(mesh.ndim):
        duk = grad_rst(u[k], d, mesh.ndim)  # tuple over ref axes
        term = sum(mesh.rx[a, k] * duk[a] for a in range(mesh.ndim))
        divu = term if divu is None else divu + term
    return interp_nd(_j12(mesh), divu, mesh.ndim) * mesh.bm2


def grad_weak_t(mesh: SemMesh, p: jnp.ndarray) -> jnp.ndarray:
    """Exact transpose of div_weak: pressure -> velocity residual space.

    out_k = sum_a D_a^T ( rx[a,k] * I12^T (bm2 * p) ).
    """
    d = _d(mesh)
    w = interp_nd_t(_j12(mesh), p * mesh.bm2, mesh.ndim)
    nd = mesh.ndim
    return jnp.stack(
        [
            grad_rst_t(tuple(mesh.rx[a, k] * w for a in range(nd)), d, nd)
            for k in range(nd)
        ]
    )


def pressure_correct_velocity(mesh: SemMesh, dp: jnp.ndarray, dt_over_g0) -> jnp.ndarray:
    """du = (dt/g0) * Binv * vmask * dssum(grad^T dp): the velocity update
    consistent with the E operator."""
    gp = grad_weak_t(mesh, dp)
    return dt_over_g0 * mesh.binv * mesh.vmask * sem.dssum(mesh, gp)


def e_op(mesh: SemMesh, dp: jnp.ndarray, dt_over_g0) -> jnp.ndarray:
    """The SPD pressure Schur-complement approximation E dp."""
    return div_weak(mesh, pressure_correct_velocity(mesh, dp, dt_over_g0))


def remove_pressure_mean(mesh: SemMesh, p: jnp.ndarray) -> jnp.ndarray:
    """Normalize a pressure field: zero bm2-weighted (physical) mean."""
    mean = jnp.sum(p * mesh.bm2) / jnp.sum(mesh.bm2)
    return p - mean


def project_onto_range(rhs: jnp.ndarray) -> jnp.ndarray:
    """Project an E-solve RHS onto range(E) = {r : sum r = 0} (EUCLIDEAN —
    the nullspace of the symmetric E is the constant vector, so consistency
    is unweighted; using the bm2-weighted mean here would *introduce*
    inconsistency and blow up CG)."""
    return rhs - jnp.mean(rhs)
