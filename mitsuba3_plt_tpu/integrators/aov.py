"""Utility integrators: depth, AOV (albedo/normals/position/uv), moment.

Functional twins of the reference plugins src/integrators/{depth,aov,
moment}.cpp. The AOV integrator emits named channel groups alongside an
optional nested integrator's radiance, the moment integrator appends
second-moment channels for variance estimation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

from ..config import RenderConfig
from ..core.rng import Sampler
from ..librender import bsdfs
from ..librender.bsdf import BSDFContext
from ..librender.records import Ray


@dataclasses.dataclass(frozen=True)
class DepthIntegrator:
    """Distance to the first intersection (src/integrators/depth.cpp)."""

    n_out_channels: int = 1

    def sample(self, scene, sampler: Sampler, ray: Ray, wavelengths,
               cfg: RenderConfig):
        si = scene.ray_intersect(ray, coherent=True)
        depth = jnp.where(si.valid, si.t, 0.0)
        return depth[..., None], jnp.ones(ray.o.shape[0], bool)


@dataclasses.dataclass(frozen=True)
class AOVIntegrator:
    """Albedo + shading normal + depth + position AOVs
    (src/integrators/aov.cpp). Channels: [albedo.rgb, n.xyz, depth, p.xyz]."""

    n_out_channels: int = 10

    def sample(self, scene, sampler: Sampler, ray: Ray, wavelengths,
               cfg: RenderConfig):
        si = scene.ray_intersect(ray, coherent=True)
        p = scene.materials.gather(jnp.maximum(si.mat_idx, 0))
        albedo = bsdfs.eval_color(p, "base_color", cfg, wavelengths)
        if cfg.spectral:
            albedo = albedo[..., :3]
        v = si.valid[..., None]
        out = jnp.concatenate(
            [
                jnp.where(v, albedo, 0.0),
                jnp.where(v, si.sh_n, 0.0),
                jnp.where(si.valid, si.t, 0.0)[..., None],
                jnp.where(v, si.p, 0.0),
            ],
            axis=-1,
        )
        return out, jnp.ones(ray.o.shape[0], bool)


@dataclasses.dataclass(frozen=True)
class MomentIntegrator:
    """Wraps an inner integrator; appends per-channel second moments
    (src/integrators/moment.cpp) — develop yields E[X] and E[X^2] for
    variance estimation."""

    inner: Any

    @property
    def n_out_channels(self):
        return 2 * getattr(self.inner, "n_out_channels", 3)

    def sample(self, scene, sampler: Sampler, ray: Ray, wavelengths,
               cfg: RenderConfig):
        vals, valid = self.inner.sample(scene, sampler, ray, wavelengths, cfg)
        return jnp.concatenate([vals, vals * vals], axis=-1), valid
