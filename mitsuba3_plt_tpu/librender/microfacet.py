"""Microfacet distributions (Beckmann / GGX), Smith shadowing, VNDF sampling.

Anisotropic (alpha_u, alpha_v). Both NDFs use visible-normal sampling
(GGX: Heitz 2018; Beckmann: Heitz & d'Eon 2014 with the erf-domain Newton
inversion), matching the reference's default sample_visible behaviour.
Reference surface for parity: /root/reference/include/mitsuba/render/microfacet.h.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr

GGX = 0
BECKMANN = 1


def ndf_eval(mu, alpha_u, alpha_v, mtype: int):
    """D(m) for local microfacet normal mu [..., 3]."""
    ct2 = mu[..., 2] * mu[..., 2]
    cos4 = ct2 * ct2
    # slopes
    inv_ct = 1.0 / jnp.maximum(jnp.abs(mu[..., 2]), 1e-12)
    sx = -mu[..., 0] * inv_ct
    sy = -mu[..., 1] * inv_ct
    su = sx / alpha_u
    sv = sy / alpha_v
    s2 = su * su + sv * sv
    if mtype == BECKMANN:
        d = jnp.exp(-s2) / (m.Pi * alpha_u * alpha_v * jnp.maximum(cos4, 1e-20))
    else:
        tmp = 1.0 + s2
        d = 1.0 / (m.Pi * alpha_u * alpha_v * tmp * tmp * jnp.maximum(cos4, 1e-20))
    return jnp.where(mu[..., 2] > 0, d, 0.0)


def smith_g1(v, mu, alpha_u, alpha_v, mtype: int):
    """Monodirectional Smith shadowing term G1(v, m)."""
    xy_alpha_2 = (alpha_u * v[..., 0]) ** 2 + (alpha_v * v[..., 1]) ** 2
    tan_theta_alpha_2 = xy_alpha_2 / jnp.maximum(v[..., 2] * v[..., 2], 1e-20)

    if mtype == BECKMANN:
        a = m.safe_rsqrt(tan_theta_alpha_2)
        a2 = a * a
        approx = (3.535 * a + 2.181 * a2) / (1.0 + 2.276 * a + 2.577 * a2)
        # the rational fit slightly overshoots 1 near a=1.6; clamp
        g = jnp.minimum(jnp.where(a >= 1.6, 1.0, approx), 1.0)
    else:
        g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))

    # perpendicular incidence -> no shadowing; sidedness check vs the normal
    g = jnp.where(xy_alpha_2 == 0.0, 1.0, g)
    backfacing = fr.dot(v, mu) * v[..., 2] <= 0.0
    return jnp.where(backfacing, 0.0, g)


def g_smith(wi, wo, mu, alpha_u, alpha_v, mtype: int):
    return smith_g1(wi, mu, alpha_u, alpha_v, mtype) * smith_g1(
        wo, mu, alpha_u, alpha_v, mtype
    )


def project_roughness(v, alpha_u, alpha_v):
    """Effective isotropic roughness seen from direction v."""
    inv_st2 = 1.0 / jnp.maximum(fr.sin_theta_2(v), 1e-12)
    cos_phi2 = v[..., 0] * v[..., 0] * inv_st2
    sin_phi2 = v[..., 1] * v[..., 1] * inv_st2
    iso = fr.sin_theta_2(v) <= 1e-12
    cos_phi2 = jnp.where(iso, 1.0, cos_phi2)
    sin_phi2 = jnp.where(iso, 0.0, sin_phi2)
    return jnp.sqrt(cos_phi2 * alpha_u * alpha_u + sin_phi2 * alpha_v * alpha_v)


def sample_vndf_ggx(wi, u, alpha_u, alpha_v):
    """Heitz 2018 visible-normal sampling for GGX. wi in upper hemisphere
    (caller flips). Returns (m, pdf)."""
    # stretch
    vh = fr.normalize(
        jnp.stack(
            [alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], axis=-1
        )
    )
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = m.safe_rsqrt(lensq)
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len, jnp.zeros_like(inv_len)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), vh.shape),
    )
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * m.Pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * m.safe_sqrt(1.0 - p1 * p1) + s * p2
    p3 = m.safe_sqrt(1.0 - p1 * p1 - p2 * p2)
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    # unstretch
    mvec = fr.normalize(
        jnp.stack(
            [
                alpha_u * nh[..., 0],
                alpha_v * nh[..., 1],
                jnp.maximum(nh[..., 2], 1e-6),
            ],
            axis=-1,
        )
    )
    pdf = pdf_vndf(wi, mvec, alpha_u, alpha_v, GGX)
    return mvec, pdf


def sample_vndf_beckmann(wi, u, alpha_u, alpha_v):
    """Visible-normal sampling for Beckmann (Heitz & d'Eon 2014), using the
    numerically-robust erf-domain inversion with three Newton iterations —
    the same scheme as the reference's sample_visible_11
    (include/mitsuba/render/microfacet.h). wi in the upper hemisphere.
    Returns (m, pdf)."""
    from jax.scipy.special import erf, erfinv

    # step 1: stretch wi by the roughness
    wi_p = fr.normalize(
        jnp.stack(
            [alpha_u * wi[..., 0], alpha_v * wi[..., 1], wi[..., 2]], axis=-1
        )
    )
    sin2d = wi_p[..., 0] ** 2 + wi_p[..., 1] ** 2
    inv_l = m.safe_rsqrt(sin2d)
    near_n = sin2d < 1e-14
    cos_phi = jnp.where(near_n, 1.0, wi_p[..., 0] * inv_l)
    sin_phi = jnp.where(near_n, 0.0, wi_p[..., 1] * inv_l)
    ct = jnp.clip(wi_p[..., 2], 1e-6, 1.0)

    # step 2: sample the slope distribution of visible normals at alpha=1
    tan_t = m.safe_sqrt(1.0 - ct * ct) / ct
    cot_t = 1.0 / jnp.maximum(tan_t, 1e-12)
    maxval = erf(jnp.minimum(cot_t, 6.0))
    ux = jnp.clip(u[..., 0], 1e-6, 1.0 - 1e-6)
    uy = jnp.clip(u[..., 1], 1e-6, 1.0 - 1e-6)
    inv_sqrt_pi = 0.5641895835477563
    x = maxval - (maxval + 1.0) * erf(jnp.sqrt(-jnp.log(ux)))
    ux = ux * (
        1.0 + maxval + inv_sqrt_pi * tan_t * jnp.exp(-(cot_t * cot_t))
    )
    for _ in range(3):
        x = jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)
        slope = erfinv(x)
        value = (
            1.0 + x + inv_sqrt_pi * tan_t * jnp.exp(-(slope * slope)) - ux
        )
        deriv = 1.0 - slope * tan_t
        x = x - value / jnp.where(jnp.abs(deriv) > 1e-6, deriv,
                                  jnp.where(deriv >= 0, 1e-6, -1e-6))
    x = jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)
    slope_x = erfinv(x)
    slope_y = erfinv(2.0 * uy - 1.0)

    # step 3: rotate and unstretch the slopes
    sx = (cos_phi * slope_x - sin_phi * slope_y) * alpha_u
    sy = (sin_phi * slope_x + cos_phi * slope_y) * alpha_v

    # step 4: normal + visible pdf
    mvec = fr.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], axis=-1))
    pdf = pdf_vndf(wi, mvec, alpha_u, alpha_v, BECKMANN)
    return mvec, pdf


def sample_vndf(wi, u, alpha_u, alpha_v, mtype: int):
    """Visible-normal sampling, NDF-dispatched (static mtype)."""
    if mtype == BECKMANN:
        return sample_vndf_beckmann(wi, u, alpha_u, alpha_v)
    return sample_vndf_ggx(wi, u, alpha_u, alpha_v)


def pdf_vndf(wi, mu, alpha_u, alpha_v, mtype: int):
    """Visible-normal pdf: G1(wi) * |wi.m| * D(m) / |cos_theta_i|."""
    d = ndf_eval(mu, alpha_u, alpha_v, mtype)
    g1 = smith_g1(wi, mu, alpha_u, alpha_v, mtype)
    return (
        g1 * jnp.abs(fr.dot(wi, mu)) * d / jnp.maximum(jnp.abs(wi[..., 2]), 1e-12)
    )


def sample_ndf(u, alpha_u, alpha_v, mtype: int):
    """Classic D-proportional sampling (anisotropic). Returns (m, pdf)."""
    u1 = u[..., 0]
    u2 = u[..., 1]
    phi = jnp.arctan2(alpha_v * jnp.sin(2.0 * m.Pi * u1), alpha_u * jnp.cos(2.0 * m.Pi * u1))
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    alpha2 = 1.0 / jnp.maximum(
        (cp / jnp.maximum(alpha_u, 1e-12)) ** 2 + (sp / jnp.maximum(alpha_v, 1e-12)) ** 2,
        1e-20,
    )
    if mtype == BECKMANN:
        tt2 = -alpha2 * jnp.log(jnp.maximum(1.0 - u2, 1e-38))
    else:
        tt2 = alpha2 * u2 / jnp.maximum(1.0 - u2, 1e-12)
    ct = 1.0 / jnp.sqrt(1.0 + tt2)
    st = m.safe_sqrt(1.0 - ct * ct)
    mvec = jnp.stack([st * cp, st * sp, ct], axis=-1)
    pdf = ndf_eval(mvec, alpha_u, alpha_v, mtype) * ct
    return mvec, pdf


def sample(wi, u, alpha_u, alpha_v, mtype: int, sample_visible: bool = True):
    """Sample a microfacet normal. Flips wi into the upper hemisphere as the
    reference does. Returns (m, pdf)."""
    if sample_visible:
        flip = wi[..., 2] < 0
        wi_u = jnp.where(flip[..., None], -wi, wi)
        mvec, pdf = sample_vndf(wi_u, u, alpha_u, alpha_v, mtype)
        return mvec, pdf
    return sample_ndf(u, alpha_u, alpha_v, mtype)


def pdf(wi, mu, alpha_u, alpha_v, mtype: int, sample_visible: bool = True):
    if sample_visible:
        flip = wi[..., 2] < 0
        wi_u = jnp.where(flip[..., None], -wi, wi)
        return pdf_vndf(wi_u, mu, alpha_u, alpha_v, mtype)
    return ndf_eval(mu, alpha_u, alpha_v, mtype) * jnp.maximum(mu[..., 2], 0.0)
