"""Warping functions: [0,1)^2 -> distributions on disks/spheres/hemispheres.

All functions batched over leading dims; sample inputs are [..., 2].
Parity target (independent implementation): Mitsuba's warp.h semantics —
identical pdfs, same concentric-disk construction for low distortion.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def square_to_uniform_disk_concentric(u):
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    is_zero = jnp.logical_and(x == 0.0, y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)

    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    r_safe = jnp.where(r == 0.0, 1.0, r)
    phi = 0.25 * m.Pi * rp / r_safe
    phi = jnp.where(quadrant_1_or_3, 0.5 * m.Pi - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric_pdf(p):
    inside = p[..., 0] ** 2 + p[..., 1] ** 2 <= 1.0
    return jnp.where(inside, m.InvPi, 0.0)


def square_to_cosine_hemisphere(u):
    p = square_to_uniform_disk_concentric(u)
    z = m.safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * m.InvPi


def square_to_uniform_hemisphere(u):
    # Concentric-disk based mapping (area preserving, low distortion)
    p = square_to_uniform_disk_concentric(u)
    z = 1.0 - (p[..., 0] ** 2 + p[..., 1] ** 2)
    scale = jnp.sqrt(jnp.maximum(2.0 - (p[..., 0] ** 2 + p[..., 1] ** 2), 0.0))
    return jnp.stack([p[..., 0] * scale, p[..., 1] * scale, z], axis=-1)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.where(v[..., 2] >= 0, m.InvTwoPi, 0.0)


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * m.Pi * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], m.InvFourPi)


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in a cone of angle acos(cos_cutoff) around +z."""
    one_minus = 1.0 - cos_cutoff
    cos_theta = 1.0 - one_minus * u[..., 1]
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * m.Pi * u[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_cone_pdf(v, cos_cutoff):
    return jnp.where(
        v[..., 2] >= cos_cutoff, m.InvTwoPi / jnp.maximum(1.0 - cos_cutoff, 1e-12), 0.0
    )


def square_to_uniform_triangle(u):
    """Barycentric (b0, b1) uniform over the unit triangle."""
    t = m.safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - t, t * u[..., 1]], axis=-1)


def square_to_beckmann(u, alpha):
    """Beckmann-distributed microfacet normal around +z."""
    phi = 2.0 * m.Pi * u[..., 0]
    tan_theta_2 = -(alpha * alpha) * jnp.log(jnp.maximum(1.0 - u[..., 1], 1e-38))
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_beckmann_pdf(v, alpha):
    ct = v[..., 2]
    ct2 = ct * ct
    tt2 = jnp.maximum(0.0, 1.0 - ct2) / jnp.maximum(ct2, 1e-20)
    a2 = alpha * alpha
    d = jnp.exp(-tt2 / a2) / (m.Pi * a2 * jnp.maximum(ct2 * ct, 1e-20))
    return jnp.where(ct > 0, d * ct, 0.0)


def square_to_ggx(u, alpha):
    """GGX-distributed microfacet normal around +z (non-visible sampling)."""
    phi = 2.0 * m.Pi * u[..., 0]
    tan_theta_2 = alpha * alpha * u[..., 1] / jnp.maximum(1.0 - u[..., 1], 1e-12)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta_2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_std_normal(u):
    """Box-Muller transform to a 2D standard normal."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38)))
    phi = 2.0 * m.Pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def interval_to_nonuniform_tent(u, a, b, c):
    """Warp [0,1] to a tent on [a, c] with peak at b."""
    factor = jnp.where(u < (b - a) / (c - a), a - b, c - b)
    u2 = jnp.where(u < (b - a) / (c - a), u * ((a - c) / (a - b)), ((a - c) / (b - c)) * (u - (a - b) / (a - c)))
    return b + factor * (1.0 - m.safe_sqrt(jnp.clip(u2, 0.0, 1.0)))
