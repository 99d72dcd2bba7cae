"""Pytree dataclass helpers.

Every array-carrying structure in idto_tpu is a frozen dataclass registered as
a JAX pytree.  Fields marked ``static()`` are hashable auxiliary data (jit
recompiles when they change); everything else is a traced array leaf.

This replaces the reference's mutable C++ state/cache objects
(`optimizer/trajectory_optimizer_state.h:38-194`) with immutable pytrees:
under jit there is no lazy cache -- XLA CSE does the sharing.
"""
from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static(**kwargs) -> Any:
    """Mark a dataclass field as static (pytree aux data)."""
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Register a frozen dataclass as a pytree with static-field support."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = dataclasses.fields(cls)
    data_names = [f.name for f in fields if not f.metadata.get("static")]
    meta_names = [f.name for f in fields if f.metadata.get("static")]

    jax.tree_util.register_dataclass(
        cls, data_fields=data_names, meta_fields=meta_names
    )

    def _replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace
    return cls
