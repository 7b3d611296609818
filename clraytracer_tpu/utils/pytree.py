"""Pytree dataclass helper.

Scene state (triangles, BVH, materials, atlas, instances) travels through
``jit`` / ``shard_map`` as pytrees. ``pytree_dataclass`` registers a frozen
dataclass with JAX, with opt-in static (hashable, non-array) fields.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax

_T = TypeVar("_T")

_STATIC_MARKER = "clraytracer_static"


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as static pytree metadata (not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_MARKER] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Register ``cls`` as a frozen dataclass pytree node.

    Fields declared with :func:`static_field` become aux data (hashed into the
    jit cache key); all other fields are traced children.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_MARKER, False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self: _T, **updates: Any) -> _T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
