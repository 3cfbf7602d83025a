"""Participating media: homogeneous + heterogeneous (grid) media + phase
functions.

Functional twin of the reference's media/phase/volume layer (src/media/
{homogeneous,heterogeneous}.cpp, src/volumes/grid.cpp, src/phase/
{hg,isotropic,rayleigh}.cpp): ONE global medium filling the scene.
Heterogeneous transport is TPU-native null-collision tracking: distance
sampling by delta tracking and transmittance by ratio tracking, both as
fixed-trip-count lax.scan sweeps with active masks (no data-dependent
loop bounds under jit).
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

# fixed null-collision sweep length: majorant-normalized free paths per
# lane; enough for optical depths ~ tens (masked lanes idle, XLA-friendly)
TRACK_STEPS = 64


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Medium:
    sigma_t: Any   # [3] extinction (heterogeneous: scaled by density)
    albedo: Any    # [3] single-scattering albedo (sigma_s = albedo * sigma_t)
    g: Any         # scalar HG asymmetry
    phase_type: int = dataclasses.field(default=PHASE_HG, metadata=dict(static=True))
    # heterogeneous density grid (reference src/volumes/grid.cpp):
    # density [Dz, Dy, Dx] sampled trilinearly inside the world-space box
    # [box_min, box_max]; density outside is 0
    density: Any = None
    box_min: Any = None
    box_max: Any = None
    majorant: Any = None  # scalar: max density (delta-tracking bound)
    heterogeneous: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @staticmethod
    def create(sigma_t=(0.5, 0.5, 0.5), albedo=(0.8, 0.8, 0.8), g=0.0,
               phase_type=PHASE_HG):
        return Medium(
            sigma_t=jnp.asarray(sigma_t, jnp.float32),
            albedo=jnp.asarray(albedo, jnp.float32),
            g=jnp.asarray(g, jnp.float32),
            phase_type=phase_type,
        )

    @staticmethod
    def create_heterogeneous(density, box_min=(-1, -1, -1), box_max=(1, 1, 1),
                             sigma_t=(1.0, 1.0, 1.0), albedo=(0.8, 0.8, 0.8),
                             g=0.0, phase_type=PHASE_HG):
        import numpy as np

        density = jnp.asarray(density, jnp.float32)
        return Medium(
            sigma_t=jnp.asarray(sigma_t, jnp.float32),
            albedo=jnp.asarray(albedo, jnp.float32),
            g=jnp.asarray(g, jnp.float32),
            phase_type=phase_type,
            density=density,
            box_min=jnp.asarray(box_min, jnp.float32),
            box_max=jnp.asarray(box_max, jnp.float32),
            majorant=jnp.asarray(
                float(np.asarray(density).max()), jnp.float32
            ),
            heterogeneous=True,
        )

    # ------------------------------------------------------------------
    def density_at(self, p):
        """Trilinear density lookup at world positions p [N, 3] -> [N]
        (grid.cpp eval); zero outside the box."""
        rel = (p - self.box_min) / (self.box_max - self.box_min)
        inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
        D = jnp.asarray(self.density)
        dz, dy, dx = D.shape
        # grid sample coords (cell centers at integer + 0.5 like bitmap)
        gx = jnp.clip(rel[..., 0] * dx - 0.5, 0.0, dx - 1.0)
        gy = jnp.clip(rel[..., 1] * dy - 0.5, 0.0, dy - 1.0)
        gz = jnp.clip(rel[..., 2] * dz - 0.5, 0.0, dz - 1.0)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        z0 = jnp.floor(gz).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, dx - 1)
        y1 = jnp.minimum(y0 + 1, dy - 1)
        z1 = jnp.minimum(z0 + 1, dz - 1)
        fx, fy, fz = gx - x0, gy - y0, gz - z0
        c000 = D[z0, y0, x0]
        c001 = D[z0, y0, x1]
        c010 = D[z0, y1, x0]
        c011 = D[z0, y1, x1]
        c100 = D[z1, y0, x0]
        c101 = D[z1, y0, x1]
        c110 = D[z1, y1, x0]
        c111 = D[z1, y1, x1]
        c00 = c000 * (1 - fx) + c001 * fx
        c01 = c010 * (1 - fx) + c011 * fx
        c10 = c100 * (1 - fx) + c101 * fx
        c11 = c110 * (1 - fx) + c111 * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        return jnp.where(inside, c0 * (1 - fz) + c1 * fz, 0.0)

    def transmittance(self, dist):
        """exp(-sigma_t * d) [N, 3] (homogeneous Beer-Lambert)."""
        return jnp.exp(-self.sigma_t[None, :] * dist[..., None])

    def transmittance_ratio(self, o, d, dist, sampler, dim0):
        """Heterogeneous transmittance by ratio tracking
        (heterogeneous.cpp's unbiased estimator): [N] scalar estimate of
        exp(-int sigma_t0 density ds) along o + t d, t in [0, dist]."""
        n = o.shape[0]
        s0 = jnp.maximum(self.sigma_t[0] * self.majorant, 1e-8)

        def body(carry, i):
            t, tr, alive = carry
            u = sampler.next_1d(dim0 + 2 * i)
            t_new = t - jnp.log(jnp.maximum(1.0 - u, 1e-20)) / s0
            esc = t_new >= dist
            dens = self.density_at(o + d * t_new[..., None])
            ratio = 1.0 - dens / jnp.maximum(self.majorant, 1e-8)
            tr_new = jnp.where(alive & ~esc, tr * ratio, tr)
            alive = alive & ~esc & (tr_new > 1e-5)
            return (jnp.where(alive, t_new, t), tr_new, alive), None

        init = (
            jnp.zeros((n,), jnp.float32), jnp.ones((n,), jnp.float32),
            jnp.ones((n,), bool),
        )
        (t, tr, alive), _ = jax.lax.scan(
            body, init, jnp.arange(TRACK_STEPS, dtype=jnp.uint32)
        )
        # lanes still alive after the sweep: conservative zero (deep media)
        return jnp.where(alive, 0.0, tr)

    def sample_distance_delta(self, o, d, t_max, sampler, dim0):
        """Heterogeneous free-flight by delta tracking
        (heterogeneous.cpp sample_interaction): returns (t, is_real) where
        is_real marks a real collision before t_max; the estimator weight
        of the chain is 1 (null collisions cancel)."""
        n = o.shape[0]
        s0 = jnp.maximum(self.sigma_t[0] * self.majorant, 1e-8)

        def body(carry, i):
            t, done, real = carry
            u = sampler.next_1d(dim0 + 2 * i)
            u2 = sampler.next_1d(dim0 + 2 * i + 1)
            t_new = t - jnp.log(jnp.maximum(1.0 - u, 1e-20)) / s0
            esc = t_new >= t_max
            dens = self.density_at(o + d * t_new[..., None])
            p_real = dens / jnp.maximum(self.majorant, 1e-8)
            hit_real = u2 < p_real
            newly_done = ~done & (esc | hit_real)
            real = jnp.where(newly_done, hit_real & ~esc, real)
            t = jnp.where(done, t, jnp.where(esc, t_max, t_new))
            done = done | newly_done
            return (t, done, real), None

        init = (
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), bool),
            jnp.zeros((n,), bool),
        )
        (t, done, real), _ = jax.lax.scan(
            body, init, jnp.arange(TRACK_STEPS, dtype=jnp.uint32)
        )
        # unfinished lanes: treat as escaped (bounded optical depth)
        real = real & done
        t = jnp.where(done, t, t_max)
        return t, real

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
