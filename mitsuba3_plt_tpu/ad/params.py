"""SceneParameters: dotted-key view over the scene pytree.

Functional twin of mi.traverse / SceneParameters (reference
src/python/python/util.py): keys like "materials.base_color" address leaves
of the Scene dataclass tree; `update` returns a NEW scene (scenes are
immutable pytrees — the XLA-friendly analog of params.update()).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax


def _is_dc(x):
    return dataclasses.is_dataclass(x) and not isinstance(x, type)


def _walk(obj, prefix=""):
    out = {}
    if _is_dc(obj):
        for f in dataclasses.fields(obj):
            if f.metadata.get("static"):
                continue
            child = getattr(obj, f.name)
            key = f"{prefix}{f.name}"
            if _is_dc(child):
                out.update(_walk(child, key + "."))
            elif child is not None and hasattr(child, "dtype"):
                out[key] = child
    return out


class SceneParameters(dict):
    """dict of dotted-key -> array, bound to a source scene."""

    def __init__(self, scene):
        super().__init__(_walk(scene))
        self._scene = scene

    def update(self, overrides: Dict[str, Any] | None = None):
        """Return a new scene with this dict's (possibly modified) leaves."""
        vals = dict(self)
        if overrides:
            vals.update(overrides)
        return _apply(self._scene, vals, "")


def _apply(obj, vals, prefix):
    if not _is_dc(obj):
        return obj
    changes = {}
    for f in dataclasses.fields(obj):
        if f.metadata.get("static"):
            continue
        child = getattr(obj, f.name)
        key = f"{prefix}{f.name}"
        if _is_dc(child):
            new = _apply(child, vals, key + ".")
            if new is not child:
                changes[f.name] = new
        elif key in vals and vals[key] is not child:
            changes[f.name] = vals[key]
    return dataclasses.replace(obj, **changes) if changes else obj


def traverse(scene) -> SceneParameters:
    return SceneParameters(scene)
