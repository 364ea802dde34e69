"""Pytree dataclass helper.

Falcor passes host<->device structs as constant-buffer blobs (e.g. VAOData,
reference Source/RenderPasses/SVAO/VAOData.slang:33). The JAX-native
equivalent is a frozen dataclass registered as a pytree so structs flow
through `jax.jit` as traced leaves while config-like fields stay static.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T] | None = None, *, static: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in `static` become aux_data (hashable, trigger recompiles on
    change — the JAX analogue of Falcor's DefineList shader specialization,
    reference Source/RenderPasses/SVAO/SVAO.cpp:221-238).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static]
        meta_fields = [f.name for f in dataclasses.fields(c) if f.name in static]
        jax.tree_util.register_dataclass(c, data_fields, meta_fields)
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: _T, **kwargs) -> _T:
    return dataclasses.replace(obj, **kwargs)
