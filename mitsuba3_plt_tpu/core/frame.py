"""Orthonormal frames and spherical helpers (batched, [..., 3] vectors).

Parity notes: coordinate_system follows Duff et al. 2017 exactly as the
reference does (/root/reference/include/mitsuba/core/vector.h:116-137), which
matters for Stokes-basis conventions (mueller.stokes_basis uses its first
output).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math as m


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.linalg.norm(a, axis=-1)


def squared_norm(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps=0.0):
    """Safe normalize: returns 0 for (near-)zero vectors and — unlike
    a / linalg.norm(a) — has a NaN-free reverse-mode derivative there
    (norm's vjp is x/||x|| = 0/0 at the origin)."""
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    lo = (eps * eps) if eps else 1e-24
    return a * jax.lax.rsqrt(jnp.maximum(n2, lo))


def norm(a, axis=-1, keepdims=False):
    """NaN-free-gradient Euclidean norm (0 -> 0 with zero gradient)."""
    n2 = jnp.sum(a * a, axis=axis, keepdims=keepdims)
    pos = n2 > 0
    return jnp.sqrt(jnp.where(pos, n2, 1.0)) * pos.astype(a.dtype)


def coordinate_system(n):
    """Complete unit vector n to an orthonormal basis; returns (s, t).

    Branchless Duff/Burgess/Christensen/Hery/Kensler/Liani/Villemin (JCGT 2017).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = m.sign(nz)
    a = -1.0 / (sign + nz)
    b = nx * ny * a

    s = jnp.stack(
        [m.mulsign(nx * nx * a, nz) + 1.0, m.mulsign(b, nz), m.mulsign_neg(nx, nz)],
        axis=-1,
    )
    t = jnp.stack([b, ny * ny * a + sign, -ny], axis=-1)
    return s, t


class Frame:
    """A stateless namespace of frame ops. A frame is the tuple (s, t, n)."""

    @staticmethod
    def from_normal(n):
        s, t = coordinate_system(n)
        return s, t, n

    @staticmethod
    def to_local(frame, v):
        s, t, n = frame
        return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)

    @staticmethod
    def to_world(frame, v):
        s, t, n = frame
        return (
            s * v[..., 0:1] + t * v[..., 1:2] + n * v[..., 2:3]
        )


def to_local(n, v):
    """Transform world vector v into the local frame implied by normal n."""
    return Frame.to_local(Frame.from_normal(n), v)


def to_world(n, v):
    return Frame.to_world(Frame.from_normal(n), v)


# --- local-frame trig helpers (z-up shading frame) -------------------------

def cos_theta(v):
    return v[..., 2]


def cos_theta_2(v):
    return v[..., 2] * v[..., 2]


def abs_cos_theta(v):
    return jnp.abs(v[..., 2])


def sin_theta_2(v):
    return jnp.maximum(0.0, 1.0 - cos_theta_2(v))


def sin_theta(v):
    return m.safe_sqrt(sin_theta_2(v))


def tan_theta(v):
    return sin_theta(v) / jnp.where(jnp.abs(v[..., 2]) > 1e-12, v[..., 2], 1e-12)


def tan_theta_2(v):
    c2 = cos_theta_2(v)
    return jnp.maximum(0.0, 1.0 - c2) / jnp.maximum(c2, 1e-20)


def sin_phi_cos_phi(v):
    st = sin_theta(v)
    inv = jnp.where(st > 1e-9, 1.0 / jnp.maximum(st, 1e-9), 0.0)
    cp = jnp.where(st > 1e-9, v[..., 0] * inv, 1.0)
    sp = jnp.where(st > 1e-9, v[..., 1] * inv, 0.0)
    cp = jnp.clip(cp, -1.0, 1.0)
    sp = jnp.clip(sp, -1.0, 1.0)
    return sp, cp


def sph_to_dir(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def dir_to_sph(v):
    theta = m.safe_acos(v[..., 2])
    phi = jnp.arctan2(v[..., 1], v[..., 0])
    return theta, phi


def reflect(wi):
    """Local-frame mirror reflection around +z of *incident* dir wi (pointing away)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def reflect_n(wi, n):
    """Reflect wi (pointing away from surface) around arbitrary normal n."""
    return 2.0 * dot(wi, n)[..., None] * n - wi


def refract(wi, cos_theta_t, eta_ti):
    """Local-frame refraction; cos_theta_t signed, eta_ti = 1/eta_it."""
    scale = -eta_ti
    return jnp.stack(
        [scale * wi[..., 0], scale * wi[..., 1], cos_theta_t], axis=-1
    )


def refract_n(wi, n, cos_theta_t, eta_ti):
    """Refraction about an arbitrary normal n (Mitsuba vector.h refract):
    wo = n * (dot(wi, n) * eta_ti + cos_theta_t) - wi * eta_ti."""
    return (
        n * (dot(wi, n) * eta_ti + cos_theta_t)[..., None]
        - wi * eta_ti[..., None]
    )
