"""Dedicated direct-illumination MIS estimator (reference
src/integrators/direct.cpp:120-208).

For each camera hit, `emitter_samples` NEE samples and `bsdf_samples`
BSDF samples are combined with the power heuristic, each strategy's pdf
scaled by its sample fraction and each sample weighted 1/count
(direct.cpp:107-111). Round-1 aliased `direct` to a depth-2 path tracer
(single sample per strategy, path-style weights); this is the real
estimator, vectorized over the wavefront with static Python loops over
the (small) sample counts — each sample index draws from its own
bounce-dim block so streams never collide.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import frame as fr
from ..core import math as mth
from ..core.rng import Sampler, bounce_dim
from ..librender import bsdfs
from ..librender.bsdf import BSDFContext, BSDFFlags
from ..librender.records import Ray, DirectionSample
from ..scene import emitters as em_mod
from .common import mis_weight
from .path import _to_channels


@dataclasses.dataclass(frozen=True)
class DirectIntegrator:
    emitter_samples: int = 1
    bsdf_samples: int = 1
    hide_emitters: bool = False

    def sample(self, scene, sampler: Sampler, ray: Ray, wavelengths,
               cfg: RenderConfig):
        """Returns (L [N, C], valid [N])."""
        if cfg.polarized:
            # single-scattering transport with unpolarized emitters: the
            # S0 of the one-bounce Mueller chain is EXACTLY the scalar
            # value (row 0 of M @ (s, 0, 0, 0) is m00 * s), so the film's
            # S0 comes from the scalar estimator with no approximation
            import dataclasses as _dc

            return self.sample(
                scene, sampler, ray, wavelengths,
                _dc.replace(cfg, polarized=False),
            )
        n = ray.o.shape[0]
        C = cfg.n_channels
        em = scene.emitters
        geo = scene.geo
        ctx = BSDFContext()
        E, B = self.emitter_samples, self.bsdf_samples
        total = max(E + B, 1)
        frac_lum = E / total
        frac_bsdf = B / total

        si = scene.ray_intersect(ray, coherent=True)
        valid_ray = si.valid
        L = jnp.zeros((n, C), jnp.float32)

        # ---- visible emitters (direct.cpp:130-135) ----------------------
        if not self.hide_emitters and em.count > 0:
            vis_em = si.valid & (si.emitter_idx >= 0) & (
                fr.cos_theta(si.wi) > 0
            )
            e_val = em_mod.emitter_value(
                em, si.emitter_idx, ray.d,
                jnp.where(si.valid, si.t, 1.0), vis_em, cfg, wavelengths,
            )
            if not cfg.spectral:
                e_val = _to_channels(e_val, cfg)
            L = L + jnp.where(vis_em[..., None], e_val, 0.0)
            if scene.env_emitter >= 0:
                env_val = _to_channels(em_mod.eval_env(em, ray.d), cfg)
                L = L + jnp.where((~si.valid)[..., None], env_val, 0.0)

        active = si.valid
        midx = jnp.maximum(si.mat_idx, 0)
        mat_flags = scene.materials.flags[midx]
        smooth = (mat_flags & BSDFFlags.Smooth) != 0

        # ---- emitter sampling (direct.cpp:146-171) -----------------------
        if em.count > 0 and E > 0:
            w_lum = 1.0 / E
            for i in range(E):
                act_e = active & smooth
                u1 = sampler.next_1d(bounce_dim(i, 8))
                u2 = sampler.next_2d(bounce_dim(i, 9))
                ds = em_mod.sample_emitter_direction(
                    em, geo, si.p, u1, u2, act_e
                )
                occ_ray = Ray(
                    o=jnp.where(
                        act_e[..., None],
                        si.p + si.n * jnp.where(
                            fr.dot(ds.d, si.n) >= 0,
                            mth.RayEpsilon, -mth.RayEpsilon
                        )[..., None],
                        1e8,
                    ),
                    d=ds.d,
                    maxt=jnp.where(
                        act_e, ds.dist * (1.0 - mth.ShadowEpsilon), 0.0
                    ),
                )
                vis = act_e & ~scene.ray_test(occ_ray, coherent=True) & (ds.pdf > 0)
                wo_local = si.to_local(ds.d)
                bsdf_val, bsdf_pdf = bsdfs.eval_pdf(
                    scene.materials, midx, si, wo_local, ctx, cfg,
                    wavelengths,
                )
                mis = jnp.where(
                    ds.delta, 1.0,
                    mis_weight(ds.pdf * frac_lum, bsdf_pdf * frac_bsdf),
                ) * w_lum
                e_val = em_mod.emitter_value(
                    em, ds.emitter_idx, ds.d, ds.dist, vis, cfg, wavelengths
                )
                if not cfg.spectral:
                    e_val = _to_channels(e_val, cfg)
                contrib = bsdf_val * e_val * (
                    mis / jnp.maximum(ds.pdf, 1e-20)
                )[..., None]
                L = L + jnp.where(vis[..., None], contrib, 0.0)

        # ---- BSDF sampling (direct.cpp:174-206) --------------------------
        if em.count > 0 and B > 0:
            w_bsdf = 1.0 / B
            for i in range(B):
                u1 = sampler.next_1d(bounce_dim(i, 0))
                u2 = sampler.next_2d(bounce_dim(i, 1))
                bs, weight, ok = bsdfs.sample(
                    scene.materials, midx, si, u1, u2, ctx, cfg, wavelengths
                )
                act_b = active & ok & (bs.pdf > 0)
                wo_world = si.to_world(bs.wo)
                o2 = jnp.where(
                    act_b[..., None],
                    si.p + si.n * jnp.where(
                        fr.dot(wo_world, si.n) >= 0,
                        mth.RayEpsilon, -mth.RayEpsilon
                    )[..., None],
                    1e8,
                )
                si2 = scene.ray_intersect(Ray.create(o2, wo_world))
                hit_em = act_b & si2.valid & (si2.emitter_idx >= 0) & (
                    fr.cos_theta(si2.wi) > 0
                )
                is_delta = (bs.sampled_type & jnp.uint32(BSDFFlags.Delta)) != 0
                ds2 = DirectionSample(
                    p=si2.p, n=si2.n, uv=si2.uv, d=wo_world,
                    dist=jnp.where(si2.valid, si2.t, 1.0),
                    pdf=jnp.zeros((n,)), delta=jnp.zeros((n,), bool),
                    emitter_idx=si2.emitter_idx,
                )
                em_pdf = jnp.where(
                    is_delta, 0.0,
                    em_mod.pdf_emitter_direction(em, geo, si.p, ds2),
                )
                e_val = em_mod.emitter_value(
                    em, si2.emitter_idx, wo_world, ds2.dist, hit_em, cfg,
                    wavelengths,
                )
                if not cfg.spectral:
                    e_val = _to_channels(e_val, cfg)
                mis = mis_weight(bs.pdf * frac_bsdf, em_pdf * frac_lum)
                L = L + jnp.where(
                    hit_em[..., None], weight * e_val * (mis * w_bsdf)[..., None], 0.0
                )
                # escaped BSDF sample -> environment
                if scene.env_emitter >= 0:
                    esc = act_b & ~si2.valid
                    env_val = _to_channels(em_mod.eval_env(em, wo_world), cfg)
                    env_pdf = jnp.where(
                        is_delta, 0.0, em_mod.escape_pdf(em, wo_world)
                    )
                    mis_env = mis_weight(
                        bs.pdf * frac_bsdf, env_pdf * frac_lum
                    )
                    L = L + jnp.where(
                        esc[..., None],
                        weight * env_val * (mis_env * w_bsdf)[..., None],
                        0.0,
                    )

        return L, valid_ray
