"""Abstract distributed vector space over JAX pytrees.

The Krylov algorithms (eigs/svds/gmres/newton) see vectors only through this
interface — dot, axpby, scale, rand — exactly the layering the reference
inherits from LightKrylov's `abstract_vector_rdp` (SURVEY section 5,
"communication backend": algorithms are communication-agnostic; all
collectives live inside the operator and the dot).

A vector is any pytree of arrays. The inner product is supplied by the
application layer (e.g. the mass-weighted SEM dot that ignores pressure and
history slots, mirroring /root/reference/src/vectors/real_vectors.f90:208-233)
and must itself contain whatever `psum` the sharding needs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import numpy as np
import jax.numpy as jnp

Vector = Any


def tree_axpby(a, x: Vector, b, y: Vector) -> Vector:
    return jax.tree_util.tree_map(lambda xi, yi: a * xi + b * yi, x, y)


def tree_scale(a, x: Vector) -> Vector:
    return jax.tree_util.tree_map(lambda xi: a * xi, x)


def tree_add(x: Vector, y: Vector) -> Vector:
    return jax.tree_util.tree_map(jnp.add, x, y)


def tree_sub(x: Vector, y: Vector) -> Vector:
    return jax.tree_util.tree_map(jnp.subtract, x, y)


def tree_zeros_like(x: Vector) -> Vector:
    return jax.tree_util.tree_map(jnp.zeros_like, x)


@dataclasses.dataclass
class VectorSpace:
    """Bundle of the space-defining callables.

    dot_fn: (x, y) -> jnp scalar (must psum under SPMD; semi-inner products
            allowed — leaves not participating in dot still flow linearly
            through axpby, like the reference's lagged-history slots).
    rand_fn: (key) -> random vector in the admissible set (e.g. C0-continuous,
            BC-masked — real_vectors.f90:99-114 semantics).
    """

    dot_fn: Callable[[Vector, Vector], jnp.ndarray]
    rand_fn: Callable[[jax.Array], Vector] | None = None

    def __post_init__(self):
        self._jit_dot = jax.jit(self.dot_fn)

    def dot(self, x: Vector, y: Vector) -> float:
        return float(self._jit_dot(x, y))

    def norm(self, x: Vector) -> float:
        return float(np.sqrt(max(self.dot(x, x), 0.0)))

    def rand(self, key) -> Vector:
        if self.rand_fn is None:
            raise ValueError("VectorSpace has no rand_fn")
        return self.rand_fn(key)

    # -- basis utilities -----------------------------------------------------

    def dots_against(self, basis: list[Vector], w: Vector) -> np.ndarray:
        return np.array([self.dot(v, w) for v in basis])

    def orthogonalize_against(
        self, basis: list[Vector], w: Vector, passes: int = 2
    ) -> tuple[Vector, np.ndarray]:
        """CGS with `passes` sweeps (CGS2 by default — the reference's
        reorthogonalization scheme). Returns (w_orth, h) with h the summed
        projection coefficients onto `basis`."""
        h = np.zeros(len(basis))
        for _ in range(passes):
            c = self.dots_against(basis, w)
            h += c
            for v, ci in zip(basis, c):
                if ci != 0.0:
                    w = tree_axpby(1.0, w, -ci, v)
        return w, h

    def normalize(self, w: Vector) -> tuple[Vector, float]:
        nrm = self.norm(w)
        if nrm > 0:
            w = tree_scale(1.0 / nrm, w)
        return w, nrm


def euclidean_space(rand_template: Vector | None = None) -> VectorSpace:
    """Plain Euclidean dot over all leaves — used by the dense unit tests."""

    def dot_fn(x, y):
        leaves_x = jax.tree_util.tree_leaves(x)
        leaves_y = jax.tree_util.tree_leaves(y)
        return sum(jnp.vdot(a, b).real for a, b in zip(leaves_x, leaves_y))

    rand_fn = None
    if rand_template is not None:

        def rand_fn(key):
            leaves, treedef = jax.tree_util.tree_flatten(rand_template)
            keys = jax.random.split(key, len(leaves))
            new = [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
            return jax.tree_util.tree_unflatten(treedef, new)

    return VectorSpace(dot_fn=dot_fn, rand_fn=rand_fn)
