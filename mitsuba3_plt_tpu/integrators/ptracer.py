"""Adjoint particle tracer: light paths splatted to the sensor.

Functional twin of the reference `ptracer` plugin
(src/integrators/ptracer.cpp + AdjointIntegrator::render,
src/render/integrator.cpp:545-649): particles start on emitters, random-walk
through the scene, and every vertex connects to the sensor with a visibility
ray; contributions are splatted to the film at the projected position. The
wavefront layout and RNG discipline mirror the camera-side integrators, so
the same sharded render path applies.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core import frame as fr
from ..core import math as mth
from ..core import warp
from ..core.rng import Sampler, bounce_dim
from ..librender import bsdfs
from ..librender.bsdf import BSDFContext, TransportMode, BSDFFlags
from ..librender.records import Ray
from ..scene import emitters as em_mod
from ..scene.emitters import EMITTER_AREA, EMITTER_POINT, EMITTER_CONSTANT, \
    EMITTER_DIRECTIONAL, EMITTER_SPOT, EMITTER_DIRECTIONALAREA


@dataclasses.dataclass(frozen=True)
class ParticleTracer:
    max_depth: int = 6
    rr_depth: int = 5

    def trace(self, scene, sampler: Sampler, n_particles: int,
              cfg: RenderConfig):
        """Returns (uv [N*(D+1), 2], values [N*(D+1), C], active) — sensor
        splats for every path vertex (host splats them into an ImageBlock)."""
        em = scene.emitters
        geo = scene.geo
        n = n_particles
        C = cfg.n_channels
        ctx = BSDFContext(mode=TransportMode.Importance)
        sensor = scene.sensor

        # --- emit: position + direction on a uniformly-chosen emitter ----
        u_e = sampler.next_1d(0)
        u_pos = sampler.next_2d(1)
        u_dir = sampler.next_2d(3)
        e_count = em.count
        e_idx = jnp.clip((u_e * e_count).astype(jnp.int32), 0, e_count - 1)
        ep = em.gather(e_idx)

        # area emitters: uniform triangle position, cosine direction
        ds = em_mod._sample_area(em, geo, jnp.zeros((n, 3)), e_idx, u_pos, ep)
        pos_area = ds.p
        n_area = ds.n
        d_local = warp.square_to_cosine_hemisphere(u_dir)
        s_a, t_a = fr.coordinate_system(n_area)
        dir_area = (
            s_a * d_local[..., 0:1] + t_a * d_local[..., 1:2]
            + n_area * d_local[..., 2:3]
        )
        # power weight: L * area * pi / (p_pick)  (cosine dir pdf cancels
        # against the cosine in the exitant power integrand)
        w_area = ep["radiance"] * (ep["area"] * mth.Pi * e_count)[..., None]

        # point emitters: uniform sphere direction
        dir_point = warp.square_to_uniform_sphere(u_dir)
        w_point = ep["radiance"] * (4.0 * mth.Pi * e_count)

        # directionalarea: position on the surface, direction = the surface
        # normal exactly (delta); power weight = L * area
        # (directionalarea.cpp:87-113 sample_ray returns m_area * wav_weight)
        is_darea = ep["etype"] == EMITTER_DIRECTIONALAREA
        w_darea = ep["radiance"] * (ep["area"] * e_count)[..., None]

        is_area = ep["etype"] == EMITTER_AREA
        is_surface = is_area | is_darea
        is_point = (ep["etype"] == EMITTER_POINT) | (ep["etype"] == EMITTER_SPOT)
        p0 = jnp.where(is_surface[..., None], pos_area, ep["position"])
        d0 = jnp.where(
            is_darea[..., None], n_area,
            jnp.where(is_area[..., None], dir_area, dir_point),
        )
        beta = jnp.where(
            is_darea[..., None], w_darea,
            jnp.where(
                is_area[..., None], w_area,
                jnp.where(is_point[..., None], w_point, 0.0),
            ),
        )[:, :C] / n_particles
        nrm0 = jnp.where(is_surface[..., None], n_area, d0)

        # polarized adjoint transport carries the particle's STOKES VECTOR
        # directly (the light-side start is known unpolarized): each bounce
        # is one planar matrix-VECTOR apply, and the sensor splat records
        # S0 — exact, no Mueller chain needed (cf. the camera-side
        # integrators which must carry the full prefix matrix)
        pol = cfg.polarized
        if pol:
            from ..librender import mueller as mu

            def s_concrete(s):
                return tuple(
                    jnp.broadcast_to(
                        jnp.zeros((), jnp.float32) if x is None else x,
                        (n, C),
                    )
                    for x in s
                )

        def connect(p, nvec, beta_c, si_opt, wi_world, is_emitter_vertex, b,
                    s_c=None):
            """Connect a vertex to the sensor; returns (uv, value, ok).

            Polarized: s_c is the particle's planar Stokes 4-tuple; the
            connection BSDF's Mueller applies to it and the splat is S0."""
            cam_pos = sensor.to_world[:3, 3]
            to_cam = cam_pos[None, :] - p
            dist = fr.norm(to_cam)
            d = to_cam / jnp.maximum(dist, 1e-8)[..., None]
            # project into the film
            R = sensor.to_world[:3, :3]
            d_cam = -d @ R  # direction from camera toward p in camera frame
            z = d_cam[..., 2]
            valid_z = z > 1e-6
            x = d_cam[..., 0] / jnp.maximum(z, 1e-6)
            y = d_cam[..., 1] / jnp.maximum(z, 1e-6)
            tx = sensor.tan_half_x
            ty = sensor.tan_half_x / sensor.aspect
            u = (1.0 - x / tx) * 0.5
            v = (1.0 - y / ty) * 0.5
            in_film = valid_z & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)

            occ = scene.ray_test(
                Ray(
                    o=p + nvec * jnp.where(
                        fr.dot(d, nvec) >= 0, mth.RayEpsilon, -mth.RayEpsilon
                    )[..., None],
                    d=d,
                    maxt=dist * (1.0 - mth.ShadowEpsilon),
                )
            )
            vis = in_film & ~occ

            # importance: perspective camera W_e = dist_factor / (A_film cos^3)
            cos_cam = z
            W, Hh = sensor.resolution
            film_area = 4.0 * tx * ty
            importance = 1.0 / jnp.maximum(
                film_area * cos_cam ** 3 * dist * dist, 1e-9
            )

            if si_opt is None:
                # emission vertex: cosine-weighted exitance toward camera
                # (unpolarized emission: S0 is the scalar value exactly)
                cos_e = jnp.maximum(fr.dot(d, nvec), 0.0)
                f = beta_c * (cos_e * mth.InvPi)[..., None]
                f = jnp.where(is_emitter_vertex[..., None], f, 0.0)
            else:
                wo_local = si_opt.to_local(d)
                f_bsdf = bsdfs.eval_(
                    scene.materials, jnp.maximum(si_opt.mat_idx, 0), si_opt,
                    wo_local, ctx, cfg, None,
                )
                if pol:
                    # light arrives along the particle's travel dir
                    # (-si.wi local) and leaves toward the camera (wo_local)
                    M_w = bsdfs.to_world_mueller(
                        si_opt, f_bsdf, -si_opt.wi, wo_local
                    )
                    s_out = mu.p_apply(M_w, s_c)
                    f = jnp.broadcast_to(
                        jnp.zeros((), jnp.float32)
                        if s_out[0] is None else s_out[0],
                        (n, C),
                    )
                else:
                    f = beta_c * f_bsdf
            value = f * importance[..., None]
            return jnp.stack([u, v], -1), jnp.where(vis[..., None], value, 0.0)

        uvs = []
        vals = []
        # connect the emission vertex itself (area emitters only)
        uv0, v0 = connect(p0, nrm0, beta * mth.InvPi / mth.InvPi, None, None,
                          is_area, 0)
        # emission radiance toward camera: L (not power/pi); rescale:
        v0 = jnp.where(
            is_area[..., None],
            v0 / jnp.maximum((ep["area"] * mth.Pi)[..., None][:, :1], 1e-9)
            * ep["area"][..., None][:, :1] * mth.Pi,
            v0,
        )
        uvs.append(uv0)
        vals.append(v0)

        def body(carry, b):
            if pol:
                o, d, s_c, active = carry
                beta_c = s_c[0]
            else:
                o, d, beta_c, active = carry
                s_c = None
            si = scene.ray_intersect(Ray.create(o, d))
            hit = si.valid & active

            uv_b, val_b = connect(si.p, si.n, beta_c, si, -d, hit, b,
                                  s_c=s_c)
            val_b = jnp.where(hit[..., None], val_b, 0.0)

            u1 = sampler.next_1d(bounce_dim(b, 0))
            u2 = sampler.next_2d(bounce_dim(b, 1))
            bs, w, ok = bsdfs.sample(
                scene.materials, jnp.maximum(si.mat_idx, 0), si, u1, u2,
                ctx, cfg, None,
            )
            wo_world = si.to_world(bs.wo)
            if pol:
                W_w = bsdfs.to_world_mueller(si, w, -si.wi, bs.wo)
                s_next = s_concrete(mu.p_apply(W_w, s_c))
                beta_next = s_next[0]
            else:
                beta_next = beta_c * w
            new_o = si.p + si.n * jnp.where(
                fr.dot(wo_world, si.n) >= 0, mth.RayEpsilon, -mth.RayEpsilon
            )[..., None]
            active_next = hit & ok & (bs.pdf > 0) & (
                jnp.max(beta_next, -1) > 0
            ) & (b + 1 < self.max_depth)

            u_rr = sampler.next_1d(bounce_dim(b, 6))
            bmax = jnp.max(beta_next, -1)
            rr_p = jnp.minimum(bmax / jnp.maximum(bmax.mean(), 1e-9), 0.95)
            rr_on = b + 1 >= self.rr_depth
            keep = ~rr_on | (u_rr < rr_p)
            rr_scale = jnp.where(
                rr_on, 1.0 / jnp.maximum(rr_p, 1e-6), 1.0
            )[..., None]
            active_next = active_next & keep

            if pol:
                s_next = tuple(x * rr_scale for x in s_next)
                s_kept = tuple(
                    jnp.where(active_next[..., None], sn, sc)
                    for sn, sc in zip(s_next, s_c)
                )
                carry = (new_o, wo_world, s_kept, active_next)
            else:
                beta_next = beta_next * rr_scale
                carry = (new_o, wo_world,
                         jnp.where(active_next[..., None], beta_next, beta_c),
                         active_next)
            return carry, (uv_b, val_b)

        w0 = beta if not pol else s_concrete((beta, None, None, None))
        carry = (p0 + nrm0 * mth.RayEpsilon, d0, w0, jnp.ones((n,), bool))
        _, (uv_s, val_s) = jax.lax.scan(
            body, carry, jnp.arange(self.max_depth, dtype=jnp.uint32)
        )
        # stack: [1 + D, N, .]
        all_uv = jnp.concatenate([uvs[0][None], uv_s], axis=0).reshape(-1, 2)
        all_val = jnp.concatenate([vals[0][None], val_s], axis=0).reshape(
            -1, vals[0].shape[-1]
        )
        return all_uv, all_val


def render_ptracer(scene, n_particles: int = 1 << 20, seed: int = 0,
                   cfg: RenderConfig = RenderConfig(), integrator=None):
    """Adjoint render: splat particle connections into the film.

    Note: the film weight uses the particle count (no per-pixel filter
    normalization — splatting estimators are measure-valued, reference
    AdjointIntegrator::render integrator.cpp:545-649)."""
    from ..librender.film import ImageBlock

    integ = integrator or ParticleTracer()
    W, H = scene.sensor.resolution

    @jax.jit
    def run(scene, seed):
        sampler = Sampler.create(0, n_particles)
        sampler = dataclasses.replace(
            sampler, seed=jnp.asarray(seed, jnp.uint32)
        )
        uv, val = integ.trace(scene, sampler, n_particles, cfg)
        block = ImageBlock.create(W, H, val.shape[-1])
        ok = jnp.all(jnp.isfinite(val), -1) & jnp.all(
            (uv >= 0) & (uv < 1), -1
        )
        block = block.put(uv, val, ok)
        # splatting estimator: divide by particles per pixel area, not by
        # the hit-count weight channel
        img = block.data[:, :-1] * (W * H)
        return img.reshape(H, W, -1)

    return run(scene, seed)
