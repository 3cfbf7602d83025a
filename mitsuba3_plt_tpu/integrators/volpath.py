"""Volumetric path tracer: global homogeneous medium + surfaces.

Functional twin of the reference `volpath`/`volpathmis` plugins
(src/integrators/volpath.cpp) restricted to the round-1 medium scope
(scene-filling homogeneous medium, scene/media.py): per bounce, sample a
free-flight distance against the hit distance; medium events scatter with
the phase function and do NEE with analytic transmittance; surface events
follow the classic path-tracer logic with transmittance-attenuated
throughput.
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
from ..librender.records import Ray
from ..scene import emitters as em_mod
from ..scene import media as med
from .common import mis_weight
from .path import _to_channels


@dataclasses.dataclass(frozen=True)
class VolPathIntegrator:
    max_depth: int = 8
    rr_depth: int = 5
    # volpathmis (src/integrators/volpathmis.cpp): spectral MIS over the
    # per-channel free-flight strategies — the sampling channel is drawn
    # uniformly and the balance heuristic averages the channel pdfs. For
    # gray media this reduces to the plain estimator.
    spectral_mis: bool = False
    # diagnostic switches (kept: cheap, static, useful for AD triage)
    debug_no_nee: bool = False
    debug_no_hit: bool = False
    debug_unroll: bool = False

    def sample(self, scene, sampler: Sampler, ray: Ray, wavelengths,
               cfg: RenderConfig):
        if cfg.polarized:
            # full Mueller volumetric transport (see sample_stokes): the
            # film records the S0 component
            S = self.sample_stokes(scene, sampler, ray, wavelengths, cfg)
            n = ray.o.shape[0]
            return S[:, 0, :], jnp.ones((n,), bool)
        n = ray.o.shape[0]
        C = cfg.n_channels
        em = scene.emitters
        geo = scene.geo
        medium = scene.medium
        assert medium is not None, "volpath needs scene.medium"
        ctx = BSDFContext()

        L = jnp.zeros((n, C), jnp.float32)
        beta = jnp.ones((n, C), jnp.float32)
        active = jnp.ones((n,), bool)
        prev_pdf = jnp.ones((n,), jnp.float32)
        prev_delta = jnp.ones((n,), bool)

        def nee(point, normal, is_medium, wi_world, si, b):
            """Shared next-event estimation from a surface or medium vertex."""
            u1 = sampler.next_1d(bounce_dim(b, 5))
            u2 = sampler.next_2d(bounce_dim(b, 3))
            ds = em_mod.sample_emitter_direction(
                em, geo, point, u1, u2, jnp.ones((n,), bool)
            )
            offset = jnp.where(
                is_medium[..., None],
                jnp.zeros_like(normal),
                normal * jnp.where(
                    fr.dot(ds.d, normal) >= 0, mth.RayEpsilon, -mth.RayEpsilon
                )[..., None],
            )
            occ = scene.ray_test(
                Ray(o=point + offset, d=ds.d,
                    maxt=ds.dist * (1.0 - mth.ShadowEpsilon))
            )
            vis = ~occ & (ds.pdf > 0)
            # transmittance to the light: ratio tracking for grids,
            # analytic Beer-Lambert otherwise
            if medium.heterogeneous:
                from ..core.rng import DIM_MEDIUM_BASE

                tr1 = medium.transmittance_ratio(
                    point + offset, ds.d, ds.dist, sampler,
                    DIM_MEDIUM_BASE + b * 512 + 256,
                )
                tr = jnp.broadcast_to(tr1[..., None], (n, C))
            else:
                tr = medium.transmittance(ds.dist)[..., :C]

            # scattering kernel value toward the light (full directions —
            # SGGX is azimuth-dependent)
            ph = med.phase_eval_dir(medium, wi_world, ds.d)
            sigma_s = (medium.albedo * medium.sigma_t)[None, :C]
            f_medium = sigma_s * ph[..., None] / jnp.maximum(
                medium.sigma_t[None, :C], 1e-8
            )  # albedo * phase (collision-normalized)
            pdf_medium = ph

            wo_local = si.to_local(ds.d)
            f_surf, pdf_surf = bsdfs.eval_pdf(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, wo_local,
                ctx, cfg, wavelengths,
            )
            f = jnp.where(is_medium[..., None], f_medium, f_surf)
            pdf_b = jnp.where(is_medium, pdf_medium, pdf_surf)
            mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
            e_val = em_mod.emitter_value(
                em, ds.emitter_idx, ds.d, ds.dist, vis, cfg, wavelengths
            )
            if not cfg.spectral:
                e_val = _to_channels(e_val, cfg)
            # double-where reciprocal: unlike the path tracer, the NEE
            # vertex here carries sigma_t tangents (its position comes from
            # the sampled flight distance), so 1/pdf is differentiated —
            # and d(1/pdf) = -1/pdf^2 overflows f32 on degenerate lanes
            # whose vertex lands near the light. Gating BOTH branches keeps
            # the unselected reciprocal's gradient at exactly zero.
            pdf_ok = ds.pdf > 1e-12
            inv_pdf = jnp.where(
                pdf_ok, 1.0 / jnp.maximum(ds.pdf, 1e-12), 0.0
            )
            contrib = f * e_val * tr * (mis_em * inv_pdf)[..., None]
            return jnp.where((vis & pdf_ok)[..., None], contrib, 0.0)

        def body(carry, b, coherent=False):
            ray_o, ray_d, L, beta, active, prev_pdf, prev_delta = carry
            b_arr = jnp.asarray(b)
            coh0 = (b_arr == 0) if b_arr.ndim == 0 else False
            ray_b = Ray.create(ray_o, ray_d)
            si = scene.ray_intersect(ray_b, coherent=coh0)
            t_surf = jnp.where(si.valid, si.t, 1e8)

            # --- free-flight sampling --------------------------------
            if medium.heterogeneous:
                # delta tracking (heterogeneous.cpp sample_interaction):
                # the null-collision chain has unit weight for gray
                # extinction — no throughput update
                from ..core.rng import DIM_MEDIUM_BASE

                t_med, is_real = medium.sample_distance_delta(
                    ray_o, ray_d, t_surf, sampler,
                    DIM_MEDIUM_BASE + b * 512,
                )
                is_medium = active & is_real
                hit_surface = active & si.valid & ~is_real
            elif self.spectral_mis:
                # uniform channel choice + balance heuristic over the
                # per-channel exponential pdfs (volpathmis.cpp)
                u_c = sampler.next_1d(bounce_dim(b, 8))
                ch = jnp.clip((u_c * 3).astype(jnp.int32), 0, 2)
                s_c = jnp.sum(
                    jnp.where(ch[..., None] == jnp.arange(3),
                              medium.sigma_t[None, :], 0.0), -1,
                )
                u_t = sampler.next_1d(bounce_dim(b, 7))
                t_med = -jnp.log(jnp.maximum(1.0 - u_t, 1e-20)) / jnp.maximum(
                    s_c, 1e-8
                )
                is_medium = active & (t_med < t_surf)
                hit_surface = active & si.valid & ~is_medium

                tr_med = medium.transmittance(t_med)[..., :3]
                tr_surf = medium.transmittance(t_surf)[..., :3]
                pdf_med = jnp.mean(
                    medium.sigma_t[None, :] * tr_med, axis=-1
                )
                pdf_srf = jnp.mean(tr_surf, axis=-1)
                # sigma_s/sigma_t = albedo applies at the scatter vertex;
                # the flight weight is Tr * sigma_t / pdf_avg
                # denominators clamped at 1e-6: the VJP divides by the
                # SQUARE of these, and 1e-20^2 underflows f32 -> NaN
                # gradients leak through the masked where branches
                w_medium = tr_med * medium.sigma_t[None, :] / jnp.maximum(
                    pdf_med, 1e-6
                )[..., None]
                w_surface = tr_surf / jnp.maximum(pdf_srf, 1e-6)[..., None]
                beta = beta * jnp.where(
                    is_medium[..., None], w_medium[..., : beta.shape[-1]],
                    jnp.where(hit_surface[..., None],
                              w_surface[..., : beta.shape[-1]], 1.0),
                )
            else:
                # DETACHED-SAMPLING estimator (the reference AD stance,
                # prbvolpath role): the sampled flight distance and every
                # discrete event decision are detached; gradients flow
                # through the ATTACHED density/transmittance factors of
                # the weight w = sigma_c Tr_c(t) / pdf_0_detached(t) =
                # (s_c/s0_det) exp(-(s_c - s0_det) t_det), evaluated in
                # log-ratio form (the direct quotient's VJP divides by
                # Tr_0^2, which underflows f32 and leaks NaNs through
                # masked where branches). A pathwise (reparameterized)
                # t(u, sigma) would instead need moving-boundary terms at
                # the medium/surface event switch — measurably biased.
                sg = jax.lax.stop_gradient
                u_t = sampler.next_1d(bounce_dim(b, 7))
                t_med = sg(medium.sample_distance(u_t, 0))
                is_medium = active & (t_med < t_surf)
                hit_surface = active & si.valid & ~is_medium

                sigma0_det = sg(jnp.maximum(medium.sigma_t[0], 1e-8))
                ds_c = medium.sigma_t[None, :3] - sigma0_det
                t_surf_eff = sg(jnp.where(si.valid, si.t, 0.0))
                w_medium = jnp.exp(-ds_c * t_med[..., None]) * (
                    medium.sigma_t[None, :3] / sigma0_det
                )
                w_surface = jnp.exp(-ds_c * t_surf_eff[..., None])
                beta = beta * jnp.where(
                    is_medium[..., None], w_medium[..., : beta.shape[-1]],
                    jnp.where(hit_surface[..., None],
                              w_surface[..., : beta.shape[-1]], 1.0),
                )

            p_medium = ray_o + ray_d * t_med[..., None]
            point = jnp.where(is_medium[..., None], p_medium, si.p)

            # --- emitter hit (surface path only) -------------------------
            hit_emitter = hit_surface & (si.emitter_idx >= 0) & (
                fr.cos_theta(si.wi) > 0
            )
            from ..librender.records import DirectionSample

            ds_hit = DirectionSample(
                p=si.p, n=si.n, uv=si.uv, d=ray_d,
                dist=jnp.where(si.valid, si.t, 1.0),
                pdf=jnp.zeros((n,)), delta=jnp.zeros((n,), bool),
                emitter_idx=si.emitter_idx,
            )
            em_pdf = em_mod.pdf_emitter_direction(em, geo, ray_o, ds_hit)
            em_pdf = jnp.where(prev_delta, 0.0, em_pdf)
            mis_b = mis_weight(prev_pdf, em_pdf)
            e_val = em_mod.emitter_value(
                em, si.emitter_idx, ray_d, ds_hit.dist, hit_emitter, cfg,
                wavelengths,
            )
            if not cfg.spectral:
                e_val = _to_channels(e_val, cfg)
            if not self.debug_no_hit:
                L = L + beta * e_val * jnp.where(
                    hit_emitter, mis_b, 0.0
                )[..., None]

            active_next = (is_medium | hit_surface) & (b + 1 < self.max_depth)

            # --- NEE from the vertex ------------------------------------
            if not self.debug_no_nee:
                L = L + beta * nee(point, si.n, is_medium, -ray_d, si, b) * \
                    active_next[..., None]

            # --- continuation sampling ----------------------------------
            u1 = sampler.next_1d(bounce_dim(b, 0))
            u2 = sampler.next_2d(bounce_dim(b, 1))
            # medium: phase sample
            wo_med, pdf_med = med.phase_sample(medium, -ray_d, u2)
            w_med = jnp.ones((n, C), jnp.float32) * medium.albedo[None, :C]
            # surface: bsdf sample
            bs, w_surf, ok_s = bsdfs.sample(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, u1, u2,
                ctx, cfg, wavelengths,
            )
            wo_world_s = si.to_world(bs.wo)
            wo = jnp.where(is_medium[..., None], wo_med, wo_world_s)
            w = jnp.where(is_medium[..., None], w_med, w_surf)
            pdf_cont = jnp.where(is_medium, pdf_med, bs.pdf)
            ok = jnp.where(is_medium, pdf_med > 0, ok_s & (bs.pdf > 0))

            new_o = jnp.where(
                is_medium[..., None],
                p_medium,
                si.p + si.n * jnp.where(
                    fr.dot(wo_world_s, si.n) >= 0, mth.RayEpsilon,
                    -mth.RayEpsilon,
                )[..., None],
            )
            beta_next = beta * w
            active_next = active_next & ok & (jnp.max(beta_next, -1) > 0)

            # --- Russian roulette ---------------------------------------
            bmax = jnp.max(beta_next, axis=-1)
            rr_prob = jnp.minimum(bmax, 0.95)
            rr_on = b + 1 >= self.rr_depth
            u_rr = sampler.next_1d(bounce_dim(b, 6))
            rr_go = ~rr_on | (u_rr < rr_prob)
            beta_next = beta_next * jnp.where(
                rr_on, 1.0 / jnp.maximum(rr_prob, 1e-6), 1.0
            )[..., None]
            active_next = active_next & rr_go

            is_delta = ~is_medium & (
                (bs.sampled_type & jnp.uint32(BSDFFlags.Delta)) != 0
            )
            carry = (
                new_o, wo, L,
                jnp.where(active_next[..., None], beta_next, beta),
                active_next,
                jnp.where(active_next, pdf_cont, prev_pdf),
                jnp.where(active_next, is_delta, prev_delta),
            )
            return carry, None

        carry = (ray.o, ray.d, L, beta, active, prev_pdf, prev_delta)
        if getattr(self, "debug_unroll", False):
            for b in range(self.max_depth):
                carry, _ = body(carry, jnp.uint32(b))
        else:
            carry, _ = jax.lax.scan(
                body, carry, jnp.arange(self.max_depth, dtype=jnp.uint32)
            )
        return carry[2], jnp.ones((n,), bool)

    # ------------------------------------------------------------------
    def sample_stokes(self, scene, sampler: Sampler, ray: Ray, wavelengths,
                      cfg: RenderConfig):
        """FULL Mueller volumetric transport -> Stokes [N, 4, C] (implicit
        basis stokes_basis(-ray.d)); the StokesIntegrator inner surface.

        Medium events are DEPOLARIZERS (the shipped phase functions are
        scalar — the reference's polarized variants lift them the same
        way), so each scatter contributes a single live planar plane;
        surface events use the planar Mueller machinery of the polarized
        path tracer. Flight/transmittance weights are unpolarized scalars
        and fold in via p_scale. Sampler dims mirror sample() exactly, so
        S0 equals the scalar estimator bit-for-bit on S0-separable scenes
        (tests/test_volpath.py::test_polarized_volpath_s0_matches_scalar)
        and polarizing surfaces in fog produce genuine S1/S2."""
        assert cfg.polarized
        from ..librender import mueller as mu
        from .stokes import _s_add, _s_scale, _s_stack

        n = ray.o.shape[0]
        C = cfg.n_channels
        em = scene.emitters
        geo = scene.geo
        medium = scene.medium
        assert medium is not None, "volpath needs scene.medium"
        ctx = BSDFContext()
        ucfg = dataclasses.replace(cfg, polarized=False)

        L0 = tuple(jnp.zeros((n, C), jnp.float32) for _ in range(4))
        T0 = mu.MuellerP.identity().materialize(n, C)

        def nee_stokes(point, normal, is_medium, wi_world, si, b, T):
            u1 = sampler.next_1d(bounce_dim(b, 5))
            u2 = sampler.next_2d(bounce_dim(b, 3))
            ds = em_mod.sample_emitter_direction(
                em, geo, point, u1, u2, jnp.ones((n,), bool)
            )
            offset = jnp.where(
                is_medium[..., None],
                jnp.zeros_like(normal),
                normal * jnp.where(
                    fr.dot(ds.d, normal) >= 0, mth.RayEpsilon,
                    -mth.RayEpsilon,
                )[..., None],
            )
            occ = scene.ray_test(
                Ray(o=point + offset, d=ds.d,
                    maxt=ds.dist * (1.0 - mth.ShadowEpsilon))
            )
            vis = ~occ & (ds.pdf > 0)
            if medium.heterogeneous:
                from ..core.rng import DIM_MEDIUM_BASE

                tr1 = medium.transmittance_ratio(
                    point + offset, ds.d, ds.dist, sampler,
                    DIM_MEDIUM_BASE + b * 512 + 256,
                )
                tr = jnp.broadcast_to(tr1[..., None], (n, C))
            else:
                tr = medium.transmittance(ds.dist)[..., :C]

            ph = med.phase_eval_dir(medium, wi_world, ds.d)
            sigma_s = (medium.albedo * medium.sigma_t)[None, :C]
            f_medium = sigma_s * ph[..., None] / jnp.maximum(
                medium.sigma_t[None, :C], 1e-8
            )
            pdf_medium = ph

            wo_local = si.to_local(ds.d)
            M_surf = bsdfs.eval_(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, wo_local,
                ctx, cfg, wavelengths,
            )
            M_surf = bsdfs.to_world_mueller(si, M_surf, -wo_local, si.wi)
            pdf_surf = bsdfs.pdf(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, wo_local,
                ctx, ucfg,
            )
            M = mu.p_where(
                is_medium, mu.MuellerP.depolarizer(f_medium), M_surf
            )
            pdf_b = jnp.where(is_medium, pdf_medium, pdf_surf)
            mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_b))
            e_val = em_mod.emitter_value(
                em, ds.emitter_idx, ds.d, ds.dist, vis, cfg, wavelengths
            )
            if not cfg.spectral:
                e_val = _to_channels(e_val, cfg)
            pdf_ok = ds.pdf > 1e-12
            inv_pdf = jnp.where(
                pdf_ok, 1.0 / jnp.maximum(ds.pdf, 1e-12), 0.0
            )
            s0 = e_val * tr
            w = jnp.where(vis & pdf_ok, mis_em * inv_pdf, 0.0)
            return _s_scale(
                mu.p_apply(T, mu.p_apply(M, (s0, None, None, None))), w
            )

        def body(carry, b):
            ray_o, ray_d, L, T, active, prev_pdf, prev_delta = carry
            b_arr = jnp.asarray(b)
            coh0 = (b_arr == 0) if b_arr.ndim == 0 else False
            ray_b = Ray.create(ray_o, ray_d)
            si = scene.ray_intersect(ray_b, coherent=coh0)
            t_surf = jnp.where(si.valid, si.t, 1e8)

            # --- free-flight sampling (mirrors sample(); all weights are
            # unpolarized [N, C] scalars applied to T via p_scale) -------
            if medium.heterogeneous:
                from ..core.rng import DIM_MEDIUM_BASE

                t_med, is_real = medium.sample_distance_delta(
                    ray_o, ray_d, t_surf, sampler,
                    DIM_MEDIUM_BASE + b * 512,
                )
                is_medium = active & is_real
                hit_surface = active & si.valid & ~is_real
                flight_w = jnp.ones((n, C), jnp.float32)
            elif self.spectral_mis:
                u_c = sampler.next_1d(bounce_dim(b, 8))
                ch = jnp.clip((u_c * 3).astype(jnp.int32), 0, 2)
                s_c = jnp.sum(
                    jnp.where(ch[..., None] == jnp.arange(3),
                              medium.sigma_t[None, :], 0.0), -1,
                )
                u_t = sampler.next_1d(bounce_dim(b, 7))
                t_med = -jnp.log(
                    jnp.maximum(1.0 - u_t, 1e-20)
                ) / jnp.maximum(s_c, 1e-8)
                is_medium = active & (t_med < t_surf)
                hit_surface = active & si.valid & ~is_medium
                tr_med = medium.transmittance(t_med)[..., :3]
                tr_surf = medium.transmittance(t_surf)[..., :3]
                pdf_med = jnp.mean(medium.sigma_t[None, :] * tr_med, -1)
                pdf_srf = jnp.mean(tr_surf, -1)
                w_medium = tr_med * medium.sigma_t[None, :] / jnp.maximum(
                    pdf_med, 1e-6
                )[..., None]
                w_surface = tr_surf / jnp.maximum(pdf_srf, 1e-6)[..., None]
                flight_w = jnp.where(
                    is_medium[..., None], w_medium[..., :C],
                    jnp.where(hit_surface[..., None],
                              w_surface[..., :C], 1.0),
                )
            else:
                sg = jax.lax.stop_gradient
                u_t = sampler.next_1d(bounce_dim(b, 7))
                t_med = sg(medium.sample_distance(u_t, 0))
                is_medium = active & (t_med < t_surf)
                hit_surface = active & si.valid & ~is_medium
                sigma0_det = sg(jnp.maximum(medium.sigma_t[0], 1e-8))
                ds_c = medium.sigma_t[None, :3] - sigma0_det
                t_surf_eff = sg(jnp.where(si.valid, si.t, 0.0))
                w_medium = jnp.exp(-ds_c * t_med[..., None]) * (
                    medium.sigma_t[None, :3] / sigma0_det
                )
                w_surface = jnp.exp(-ds_c * t_surf_eff[..., None])
                flight_w = jnp.where(
                    is_medium[..., None], w_medium[..., :C],
                    jnp.where(hit_surface[..., None],
                              w_surface[..., :C], 1.0),
                )
            T = mu.p_scale(T, flight_w)

            p_medium = ray_o + ray_d * t_med[..., None]
            point = jnp.where(is_medium[..., None], p_medium, si.p)

            # --- emitter hit (surface path only) ------------------------
            hit_emitter = hit_surface & (si.emitter_idx >= 0) & (
                fr.cos_theta(si.wi) > 0
            )
            from ..librender.records import DirectionSample

            ds_hit = DirectionSample(
                p=si.p, n=si.n, uv=si.uv, d=ray_d,
                dist=jnp.where(si.valid, si.t, 1.0),
                pdf=jnp.zeros((n,)), delta=jnp.zeros((n,), bool),
                emitter_idx=si.emitter_idx,
            )
            em_pdf = em_mod.pdf_emitter_direction(em, geo, ray_o, ds_hit)
            em_pdf = jnp.where(prev_delta, 0.0, em_pdf)
            mis_b = mis_weight(prev_pdf, em_pdf)
            e_val = em_mod.emitter_value(
                em, si.emitter_idx, ray_d, ds_hit.dist, hit_emitter, cfg,
                wavelengths,
            )
            if not cfg.spectral:
                e_val = _to_channels(e_val, cfg)
            if not self.debug_no_hit:
                L = _s_add(L, _s_scale(
                    mu.p_apply(T, (e_val, None, None, None)),
                    jnp.where(hit_emitter, mis_b, 0.0),
                ))

            active_next = (is_medium | hit_surface) & (
                b + 1 < self.max_depth
            )

            # --- NEE from the vertex ------------------------------------
            if not self.debug_no_nee:
                contrib = nee_stokes(
                    point, si.n, is_medium, -ray_d, si, b, T
                )
                L = _s_add(L, _s_scale(
                    contrib, active_next.astype(jnp.float32)
                ))

            # --- continuation sampling ----------------------------------
            u1 = sampler.next_1d(bounce_dim(b, 0))
            u2 = sampler.next_2d(bounce_dim(b, 1))
            wo_med, pdf_med = med.phase_sample(medium, -ray_d, u2)
            w_med = jnp.ones((n, C), jnp.float32) * medium.albedo[None, :C]
            bs, W_surf, ok_s = bsdfs.sample(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, u1, u2,
                ctx, cfg, wavelengths,
            )
            W_surf = bsdfs.to_world_mueller(si, W_surf, -bs.wo, si.wi)
            wo_world_s = si.to_world(bs.wo)
            wo = jnp.where(is_medium[..., None], wo_med, wo_world_s)
            W = mu.p_where(
                is_medium, mu.MuellerP.depolarizer(w_med), W_surf
            )
            pdf_cont = jnp.where(is_medium, pdf_med, bs.pdf)
            ok = jnp.where(is_medium, pdf_med > 0, ok_s & (bs.pdf > 0))

            new_o = jnp.where(
                is_medium[..., None],
                p_medium,
                si.p + si.n * jnp.where(
                    fr.dot(wo_world_s, si.n) >= 0, mth.RayEpsilon,
                    -mth.RayEpsilon,
                )[..., None],
            )
            T_next = mu.p_matmul(T, W)
            thr = jnp.max(jnp.broadcast_to(T_next.m00(), (n, C)), axis=-1)
            active_next = active_next & ok & (thr > 0)

            # --- Russian roulette ---------------------------------------
            rr_prob = jnp.minimum(thr, 0.95)
            rr_on = b + 1 >= self.rr_depth
            u_rr = sampler.next_1d(bounce_dim(b, 6))
            rr_go = ~rr_on | (u_rr < rr_prob)
            T_next = mu.p_scale(T_next, jnp.where(
                rr_on, 1.0 / jnp.maximum(rr_prob, 1e-6), 1.0
            )[..., None])
            active_next = active_next & rr_go

            is_delta = ~is_medium & (
                (bs.sampled_type & jnp.uint32(BSDFFlags.Delta)) != 0
            )
            carry = (
                new_o, wo, L,
                mu.p_where(active_next, T_next, T),
                active_next,
                jnp.where(active_next, pdf_cont, prev_pdf),
                jnp.where(active_next, is_delta, prev_delta),
            )
            return carry, None

        carry = (
            ray.o, ray.d, L0, T0, jnp.ones((n,), bool),
            jnp.ones((n,), jnp.float32), jnp.ones((n,), bool),
        )
        carry, _ = jax.lax.scan(
            body, carry, jnp.arange(self.max_depth, dtype=jnp.uint32)
        )
        return _s_stack(carry[2], n, C)
