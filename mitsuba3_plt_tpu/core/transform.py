"""4x4 affine/projective transforms (host-side construction in numpy is fine;
application is JAX-traceable).

Mirrors the semantics of Mitsuba's Transform4f (translate/rotate/scale/
look_at composition order; normals transform by inverse-transpose).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity():
    return np.eye(4, dtype=np.float32)


def translate(v):
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = v
    return t


def scale(v):
    v = np.broadcast_to(np.asarray(v, np.float32), (3,))
    t = np.eye(4, dtype=np.float32)
    t[0, 0], t[1, 1], t[2, 2] = v
    return t


def rotate(axis, angle_deg):
    """Rotation of angle_deg degrees around `axis` (normalized internally)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s = np.sin(np.deg2rad(angle_deg))
    c = np.cos(np.deg2rad(angle_deg))
    x, y, z = a
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = R.astype(np.float32)
    return t


def look_at(origin, target, up):
    """Mitsuba convention: camera space +z points toward target, +x right, +y up."""
    origin = np.asarray(origin, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    d = target - origin
    d = d / np.linalg.norm(d)
    left = np.cross(up / np.linalg.norm(up), d)
    left = left / np.linalg.norm(left)
    new_up = np.cross(d, left)
    t = np.eye(4, dtype=np.float32)
    t[:3, 0] = left
    t[:3, 1] = new_up
    t[:3, 2] = d
    t[:3, 3] = origin
    return t.astype(np.float32)


def perspective_projection(fov_x_deg, near, far, aspect):
    """Camera-space -> normalized sample space projection, Mitsuba-style.

    Returns a matrix mapping camera space (z forward) so that the image plane
    [0,1]^2 is covered; used by the perspective sensor's sample_ray.
    """
    recip = 1.0 / (far - near)
    tan_half = np.tan(np.deg2rad(fov_x_deg) * 0.5)
    cot = 1.0 / tan_half
    P = np.array(
        [
            [cot, 0, 0, 0],
            [0, cot, 0, 0],
            [0, 0, far * recip, -near * far * recip],
            [0, 0, 1, 0],
        ],
        dtype=np.float32,
    )
    S = scale([-0.5, -0.5 * aspect, 1.0])
    T = translate([-1.0, -1.0 / aspect, 0.0])
    return S @ T @ P


def compose(*mats):
    out = np.eye(4, dtype=np.float32)
    for m_ in mats:
        out = out @ m_
    return out


def inverse(t):
    return np.linalg.inv(np.asarray(t, np.float64)).astype(np.float32)


# --- JAX application helpers (work on [..., 3] batches) ---------------------

def apply_point(t, p):
    t = jnp.asarray(t)
    ph = p @ t[:3, :3].T + t[:3, 3]
    w = p @ t[3, :3].T + t[3, 3]
    return ph / w[..., None]


def apply_vector(t, v):
    t = jnp.asarray(t)
    return v @ t[:3, :3].T


def apply_normal(t_inv, n):
    """Apply to a normal given the *inverse* matrix (inverse-transpose rule)."""
    t_inv = jnp.asarray(t_inv)
    return n @ t_inv[:3, :3]
