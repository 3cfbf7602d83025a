"""Participating media: homogeneous medium + phase functions.

Functional twin of the reference's media/phase layer (src/media/
homogeneous.cpp, src/phase/{hg,isotropic,rayleigh}.cpp) for the round-1
scope: ONE global homogeneous medium filling the scene (fog) with
Henyey-Greenstein phase; heterogeneous grids ride on the same interface in a
later round.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    sigma_t: Any   # [3] extinction
    albedo: Any    # [3] single-scattering albedo (sigma_s = albedo * sigma_t)
    g: Any         # scalar HG asymmetry
    phase_type: int = dataclasses.field(default=PHASE_HG, metadata=dict(static=True))

    @staticmethod
    def create(sigma_t=(0.5, 0.5, 0.5), albedo=(0.8, 0.8, 0.8), g=0.0,
               phase_type=PHASE_HG):
        return Medium(
            sigma_t=jnp.asarray(sigma_t, jnp.float32),
            albedo=jnp.asarray(albedo, jnp.float32),
            g=jnp.asarray(g, jnp.float32),
            phase_type=phase_type,
        )

    def transmittance(self, dist):
        """exp(-sigma_t * d) [N, 3] (homogeneous Beer-Lambert)."""
        return jnp.exp(-self.sigma_t[None, :] * dist[..., None])

    def sample_distance(self, u, channel):
        """Free-flight distance sampled from the `channel` extinction
        (reference homogeneous.cpp sample_interaction); returns t."""
        s = self.sigma_t[channel]
        return -jnp.log(jnp.maximum(1.0 - u, 1e-20)) / jnp.maximum(s, 1e-8)

    def pdf_distance(self, t, channel):
        s = self.sigma_t[channel]
        return s * jnp.exp(-s * t)

    def pdf_surface(self, t, channel):
        """Probability of flying past distance t without interaction."""
        s = self.sigma_t[channel]
        return jnp.exp(-s * t)


# --- Henyey-Greenstein phase (reference src/phase/hg.cpp) ------------------

def hg_eval(g, cos_theta):
    """cos_theta is measured against the PROPAGATION direction (forward
    scattering = +1, where the g>0 peak sits)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return m.InvFourPi * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12
    )


def hg_sample(g, u2):
    """Sample wo about +z; returns (wo_local [N,3], pdf [N])."""
    u1 = u2[..., 0]
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr_term = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u1)
    cos_theta = jnp.where(
        jnp.abs(g) < 1e-3,
        1.0 - 2.0 * u1,  # isotropic limit
        (1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe),
    )
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * m.Pi * u2[..., 1]
    wo = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
        axis=-1,
    )
    # note: HG sampled about the INCOMING propagation direction; cos_theta is
    # measured against it, so eval(g, cos) == pdf
    return wo, hg_eval(g, cos_theta)


def rayleigh_eval(cos_theta):
    return (3.0 / (16.0 * m.Pi)) * (1.0 + cos_theta * cos_theta)


def phase_eval(medium: Medium, cos_theta):
    if medium.phase_type == PHASE_HG:
        return hg_eval(medium.g, cos_theta)
    if medium.phase_type == PHASE_RAYLEIGH:
        return rayleigh_eval(cos_theta)
    return jnp.full_like(cos_theta, m.InvFourPi)


def phase_sample(medium: Medium, wi_world, u2):
    """Sample a world-space scattering direction about the propagation
    direction d = -wi_world. Returns (wo_world, pdf)."""
    d = -wi_world  # propagation direction
    if medium.phase_type == PHASE_HG:
        wo_local, pdf = hg_sample(medium.g, u2)
    else:
        from ..core import warp

        wo_local = warp.square_to_uniform_sphere(u2)
        pdf = jnp.full(wo_local.shape[:-1], m.InvFourPi)
        if medium.phase_type == PHASE_RAYLEIGH:
            pdf = rayleigh_eval(wo_local[..., 2])  # approximate via reuse
    s, t = fr.coordinate_system(d)
    wo_world = (
        s * wo_local[..., 0:1] + t * wo_local[..., 1:2] + d * wo_local[..., 2:3]
    )
    return wo_world, pdf
