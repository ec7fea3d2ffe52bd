"""Pytree dataclass helper.

`@pytree_dataclass` registers a frozen dataclass with JAX so instances flow
through jit/vmap/scan/linear_transpose. Fields annotated in `meta_fields` are
static (hashable aux data); everything else is a leaf/subtree.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(f.name for f in dataclasses.fields(c) if f.name not in meta_fields)
        jax.tree_util.register_dataclass(c, data_fields, tuple(meta_fields))
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **kwargs):
    return dataclasses.replace(obj, **kwargs)
