"""Frozen-dataclass pytrees with static (meta) fields.

The reference encodes configuration in JsonSerializable C++ objects
(src/core/io/JsonSerializable.hpp); here every domain object is a frozen
dataclass registered with JAX so hyperparameters are differentiable pytree
leaves while structural flags stay static for tracing.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def struct(cls=None, *, meta: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``meta`` (or with ``metadata={'static': True}``) are
    hashable aux data; everything else is a traced leaf/subtree.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        meta_fields = []
        data_fields = []
        for f in dataclasses.fields(c):
            if f.name in meta or f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def static_field(default: Any = dataclasses.MISSING, **kw):
    """A dataclass field treated as static pytree metadata."""
    return dataclasses.field(
        default=default, metadata={"static": True}, **kw
    )


def replace(obj, **changes):
    return dataclasses.replace(obj, **changes)
