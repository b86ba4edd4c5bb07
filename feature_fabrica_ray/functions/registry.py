"""Transformation registry: maps YAML ``_name_`` keys (and dotted
``_target_`` paths) to transformation classes.

Mirrors the reference's auto-registration surface (reference:
feature_fabrica/transform/registry.py:1-17, base.py:31-33): subclassing
``Transformation`` with a ``_name_`` makes the op usable in YAML specs and
expression strings immediately — the user-extension contract."""

from __future__ import annotations

import importlib

_REGISTRY: dict[str, type] = {}


class UnknownTransformationError(KeyError):
    pass


def register(name: str, cls: type) -> None:
    _REGISTRY[name] = cls


def get(name: str) -> type:
    """Resolve a registry ``_name_`` or a dotted import path."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if "." in name:
        mod, _, attr = name.rpartition(".")
        try:
            cls = getattr(importlib.import_module(mod), attr)
        except (ImportError, AttributeError) as e:
            raise UnknownTransformationError(name) from e
        return cls
    raise UnknownTransformationError(
        f"unknown transformation {name!r}; registered: {sorted(_REGISTRY)}")


def known(name: str) -> bool:
    return name in _REGISTRY


def all_names() -> list[str]:
    return sorted(_REGISTRY)
