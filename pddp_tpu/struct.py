"""Pytree dataclass helpers.

The whole framework is built out of frozen dataclasses registered as JAX
pytrees: array fields are leaves (traced/jitted/vmapped), configuration
fields are static metadata (trigger recompilation when changed).

This replaces the reference's ``torch.nn.Module`` statefulness
(e.g. /root/reference/pddp/costs/base.py:21) with pure, functional
containers that compose with jit/vmap/scan/pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from jax.tree_util import register_dataclass

__all__ = ["pytree_dataclass", "replace", "field", "static_field"]


def field(**kwargs) -> Any:
    """A regular (pytree-leaf) dataclass field."""
    return dataclasses.field(**kwargs)


def static_field(**kwargs) -> Any:
    """A static (metadata) dataclass field: not traced, part of the jit key."""
    f = dataclasses.field(**kwargs)
    f.metadata = {**f.metadata, "static": True}
    return f


def pytree_dataclass(cls=None, *, meta: tuple = ()):
    """Decorator: freeze a class into a dataclass and register it as a pytree.

    Args:
        meta: Names of fields to treat as static metadata. Fields declared
            with :func:`static_field` are always static.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        meta_names = set(meta)
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_names.add(f.name)
        data_fields = [
            f.name for f in dataclasses.fields(c) if f.name not in meta_names
        ]
        return register_dataclass(
            c, data_fields=data_fields, meta_fields=sorted(meta_names))

    if cls is not None:
        return wrap(cls)
    return wrap


replace = dataclasses.replace
