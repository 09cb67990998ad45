"""Trainer registry (ref: habitat's baseline_registry names used by
scripts/run_exp.py:31-38). Names preserved so reference configs port over."""

from __future__ import annotations

from typing import Callable, Dict, Type

_REGISTRY: Dict[str, type] = {}


def register_trainer(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls
        return cls

    return deco


def get_trainer(name: str) -> type:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown trainer {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_trainers():
    return sorted(_REGISTRY)
