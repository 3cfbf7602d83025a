"""Core data records (pytrees of batched arrays).

Functional twins of Mitsuba's Ray3f / SurfaceInteraction3f / BSDFSample3f /
DirectionSample3f — flattened SoA, one entry per wavefront lane.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ray:
    o: Any   # [N, 3]
    d: Any   # [N, 3] (normalized)
    maxt: Any  # [N]

    @staticmethod
    def create(o, d, maxt=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(o=o, d=d, maxt=maxt)

    def at(self, t):
        return self.o + self.d * t[..., None]


def spawn_ray(p, n, d):
    """Offset ray origin along the geometric normal to avoid self-intersection."""
    o = p + n * jnp.where(fr.dot(d, n) >= 0, m.RayEpsilon, -m.RayEpsilon)[..., None]
    return Ray.create(o, d)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SurfaceInteraction:
    """Hit record. Shading frame is (sh_s, sh_t, sh_n); wi is stored in that
    local frame (Mitsuba convention)."""

    valid: Any      # [N] bool — hit anything
    t: Any          # [N] distance
    p: Any          # [N, 3]
    n: Any          # [N, 3] geometric normal
    sh_s: Any       # [N, 3]
    sh_t: Any       # [N, 3]
    sh_n: Any       # [N, 3] shading normal
    uv: Any         # [N, 2]
    wi: Any         # [N, 3] local incident direction (toward origin of ray)
    prim_idx: Any   # [N] int32 triangle index
    mat_idx: Any    # [N] int32 material index
    emitter_idx: Any  # [N] int32 emitter index, -1 if none
    shape_idx: Any  # [N] int32
    # interpolated per-vertex color (mesh_attribute texture role,
    # src/textures/mesh_attribute.cpp); None when the scene has no
    # vertex-color meshes
    vcol: Any = None

    def frame(self):
        return (self.sh_s, self.sh_t, self.sh_n)

    def to_local(self, v_world):
        return jnp.stack(
            [
                fr.dot(v_world, self.sh_s),
                fr.dot(v_world, self.sh_t),
                fr.dot(v_world, self.sh_n),
            ],
            axis=-1,
        )

    def to_world(self, v_local):
        return (
            self.sh_s * v_local[..., 0:1]
            + self.sh_t * v_local[..., 1:2]
            + self.sh_n * v_local[..., 2:3]
        )

    def wi_world(self):
        return self.to_world(self.wi)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BSDFSample:
    wo: Any              # [N, 3] local outgoing direction
    pdf: Any             # [N]
    eta: Any             # [N] relative IOR of the sampled event
    sampled_type: Any    # [N] uint32 BSDFFlags of the chosen lobe
    sampled_component: Any  # [N] int32

    @staticmethod
    def zeros(n):
        return BSDFSample(
            wo=jnp.zeros((n, 3), jnp.float32),
            pdf=jnp.zeros((n,), jnp.float32),
            eta=jnp.ones((n,), jnp.float32),
            sampled_type=jnp.zeros((n,), jnp.uint32),
            sampled_component=jnp.full((n,), -1, jnp.int32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectionSample:
    """Emitter direction sample (NEE)."""

    p: Any        # [N, 3] point on the emitter
    n: Any        # [N, 3] emitter normal
    uv: Any       # [N, 2]
    d: Any        # [N, 3] direction from reference point to emitter (world)
    dist: Any     # [N]
    pdf: Any      # [N] solid-angle density
    delta: Any    # [N] bool — degenerate (point/directional)
    emitter_idx: Any  # [N] int32
