"""Analytic diffraction-grating model (sinusoidal / rectangular / linear,
optionally radial), vectorized over wavefront lanes.

TPU-native functional twin of the reference DiffractionGrating
(include/mitsuba/plt/diffractiongrating.h:32-290). Key differences from the
reference's formulation, chosen for TPU efficiency:

  * lobe intensities for ALL orders 0..L are computed in one shot from a
    single Miller-recurrence Bessel sweep (core/math.bessel_jn) instead of
    per-order Bessel calls — the lobes x wavelengths loop becomes one
    vectorized gather;
  * the per-lane lobe count is a static MAX over the scene with masking
    (no data-dependent loop bounds under jit).

Units follow the reference: wavelengths enter in micrometers (um); inv_period
is 1/um; height q is um; wavenumber k = 2*pi/wl_um.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core import math as m

# DiffractionGratingType (reference diffractiongrating.h:13-20)
SINUSOIDAL = 0x00
RECTANGULAR = 0x01
LINEAR = 0x02
RADIAL = 0x10
TYPE_MASK = 0xF

MAX_LOBES = 9  # diffractionGratingsMaxLobes (diffractiongrating.h:24)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Grating:
    """Per-lane grating parameters (gathered from the material table)."""

    grating_dir: Any  # [N, 2] normalized grating direction in tangent plane
    inv_period: Any   # [N, 2] 1/um
    q: Any            # [N] height (um)
    lobes: Any        # [N] int32 total lobe count (odd; lobes//2 per side)
    gtype: Any        # [N] int32 type bits
    multiplier: Any   # [N]

    @staticmethod
    def create(grating_angle, inv_period, q, lobes, gtype, multiplier, uv):
        """Build per-lane grating state (reference ctor
        diffractiongrating.h:49-67); radial gratings derive their direction
        from the uv coordinate."""
        ca = jnp.cos(grating_angle)
        sa = jnp.sin(grating_angle)
        lin_dir = jnp.stack([ca, sa], axis=-1)

        radial = uv - 0.5
        rnorm = jnp.linalg.norm(radial, axis=-1, keepdims=True)
        radial = radial / jnp.maximum(rnorm, 1e-12)
        # rotation matrix applied to (radial.x, -radial.y)
        rx = radial[..., 0]
        ry = -radial[..., 1]
        rad_dir = jnp.stack([ca * rx + sa * ry, -sa * rx + ca * ry], axis=-1)

        is_radial = (gtype & RADIAL) != 0
        gdir = jnp.where(is_radial[..., None], rad_dir, lin_dir)
        return Grating(
            grating_dir=gdir,
            inv_period=inv_period,
            q=q,
            lobes=lobes.astype(jnp.int32),
            gtype=gtype.astype(jnp.int32),
            multiplier=multiplier,
        )

    def is_1d(self):
        """1D grating: no modulation along v (diffractiongrating.h:73)."""
        return self.inv_period[..., 1] < m.Epsilon

    def alpha(self, wi, k):
        """Far-field 'roughness' exp(-(cos_i q k)^2) (diffractiongrating.h:78-83).

        wi: [N, 3] local, k: [N] or [N, C] wavenumber (1/um)."""
        ct = wi[..., 2]
        if k.ndim > ct.ndim:
            ct = ct[..., None]
        a = m.sqr(ct * self.q.reshape(ct.shape[:1] + (1,) * (ct.ndim - 1)) * k)
        return jnp.exp(-a)


def order_intensities(g: Grating, wi, wl_um, n_orders: int):
    """Intensity of diffraction orders 0..n_orders for each lane/wavelength.

    wi: [N, 3] local incident dir; wl_um: [...] wavelength(s) in um
    broadcastable against [N]. Returns [..., n_orders+1].

    One Bessel sweep delivers all orders (vs the reference's per-order
    bessel_j calls, diffractiongrating.h:228-272).
    """
    # a = 4*pi*q / (wl * |cos_theta|)   (diffractiongrating.h:234)
    cos_t = jnp.abs(wi[..., 2])
    q = g.q
    # broadcast lane params against wavelength axis if present
    extra = wl_um.ndim - cos_t.ndim
    if extra > 0:
        cos_t = cos_t.reshape(cos_t.shape + (1,) * extra)
        q = q.reshape(q.shape + (1,) * extra)
    a = 4.0 * m.Pi * q / jnp.maximum(wl_um * cos_t, 1e-12)

    orders = jnp.arange(n_orders + 1, dtype=jnp.float32)

    gt = (g.gtype & TYPE_MASK).reshape(q.shape[:1] + (1,) * (a.ndim - 1 + 1))

    # sinusoidal: J_l(a)^2, order 0 -> 1
    jn = m.bessel_jn_fast(a, n_orders)  # [..., n_orders+1]
    sin_i = jnp.square(jn)
    sin_i = sin_i.at[..., 0].set(1.0)

    # rectangular: sin(a/2) * sinc(pi l / 2), order 0 -> 1
    rect = jnp.sin(a * 0.5)[..., None] * m.sinc(m.Pi * orders * 0.5)
    rect = rect.at[..., 0].set(1.0)
    # note: the reference does NOT square this term (diffractiongrating.h:251-259)

    # linear: 1/sqrt(|l|), order 0 -> 1
    lin = 1.0 / jnp.sqrt(jnp.maximum(orders, 1.0))

    out = jnp.where(gt == SINUSOIDAL, sin_i,
                    jnp.where(gt == RECTANGULAR, rect,
                              jnp.broadcast_to(lin, sin_i.shape)))
    return out


def lobe_intensity_xy(g: Grating, lobe_xy, wi, wl_um, n_orders: int,
                      base=None):
    """Separable intensity of 2D lobe (lx, ly): I(|lx|) * I(|ly|) with 1D
    gratings reusing the x intensity (diffractiongrating.h:228-272).

    lobe_xy: [..., 2] int32 (broadcast against lanes); returns multiplier *
    ix * iy. Pass `base` to reuse an order_intensities sweep."""
    if base is None:
        base = order_intensities(g, wi, wl_um, n_orders)  # [..., n_orders+1]
    lx = jnp.abs(lobe_xy[..., 0])
    ly = jnp.abs(lobe_xy[..., 1])
    ix = m.select_along(base, lx)
    iy_2d = m.select_along(base, ly)
    is1d = g.is_1d()
    is1d = is1d.reshape(is1d.shape + (1,) * (ix.ndim - is1d.ndim))
    iy = jnp.where(is1d, ix, iy_2d)
    mult = g.multiplier.reshape(
        g.multiplier.shape + (1,) * (ix.ndim - g.multiplier.ndim)
    )
    return mult * ix * iy


def _halfside_intensities(g: Grating, wi, wl_um, half: int, base=None):
    """Intensities of one-side orders 0..half with the order-0 halving used
    by the sampling CDF (diffractiongrating.h:111-118), masked beyond the
    per-lane lobe count."""
    ints = order_intensities(g, wi, wl_um, half) if base is None else base
    ints = ints * g.multiplier[..., None]
    ints = ints.at[..., 0].multiply(0.5)
    orders = jnp.arange(half + 1, dtype=jnp.int32)
    live = orders[None, :] <= (g.lobes[..., None] // 2)
    return jnp.where(live, ints, 0.0)


def sample_lobe(g: Grating, sample2, wi, wl_um, half: int, base=None):
    """Sample a 2D diffraction lobe (diffractiongrating.h:105-151).

    Uses the reference's folded-uniform scheme: rn = 2(u - .5) in [-1, 1];
    |rn| walks the one-sided CDF, the sign picks the mirror order. Returns
    (lobe [N,2] int32, pdf_xy [N,2]).
    """
    ints = _halfside_intensities(g, wi, wl_um, half, base)  # [N, half+1]
    total = jnp.sum(ints, axis=-1, keepdims=True)
    p = ints / jnp.maximum(total, 1e-30)  # [N, half+1]
    cdf = jnp.cumsum(p, axis=-1)

    rn = (sample2 - 0.5) * 2.0  # [N, 2]
    rnd_sign = m.sign(rn)

    # index of first order with |rn| <= cdf (reference walks: selected lobe =
    # last l whose cumulative cdf (exclusive) is < |rn|)
    def pick(r):
        # reference loop: lobe=l where |r| > cdf_exclusive(l); final selection
        # is the largest such l.
        cdf_excl = jnp.concatenate(
            [jnp.zeros_like(cdf[..., :1]), cdf[..., :-1]], axis=-1
        )
        sel = jnp.abs(r)[..., None] > cdf_excl  # [N, half+1]
        idx = jnp.sum(sel.astype(jnp.int32), axis=-1) - 1
        return jnp.clip(idx, 0, half)

    lx = pick(rn[..., 0])
    ly = pick(rn[..., 1])
    # per-axis pdf: p(l) for l=0, p(l)/2 for mirrored orders
    px = m.select_along(p, lx)
    py = m.select_along(p, ly)
    px = jnp.where(lx == 0, px, px * 0.5)
    py = jnp.where(ly == 0, py, py * 0.5)

    lobe = jnp.stack(
        [lx * rnd_sign[..., 0].astype(jnp.int32),
         ly * rnd_sign[..., 1].astype(jnp.int32)], axis=-1
    )
    # (1D gratings: the y marginal equals the x marginal and diffract()
    # ignores ly since inv_period.y == 0 — same behavior as the reference.)
    pdf = jnp.stack([px, py], axis=-1)
    return lobe, pdf


def lobe_pdf(g: Grating, lobe_xy, wi, wl_um, half: int):
    """pdf of a given 2D lobe under the sampling scheme
    (diffractiongrating.h:164-190)."""
    ints = _halfside_intensities(g, wi, wl_um, half)
    total = jnp.sum(ints, axis=-1)
    lx = jnp.clip(jnp.abs(lobe_xy[..., 0]), 0, half)
    ly = jnp.clip(jnp.abs(lobe_xy[..., 1]), 0, half)
    ix = m.select_along(ints, lx)
    iy = m.select_along(ints, ly)
    return (ix / jnp.maximum(total, 1e-30)) * (iy / jnp.maximum(total, 1e-30))


def diffract(g: Grating, wi, lobe_xy, wl_um):
    """Diffracted direction for a lobe: the grating equation on the
    reciprocal lattice (diffractiongrating.h:201-226).

    wi: [N, 3] local; lobe_xy: [..., 2] int32; wl_um broadcastable.
    Returns (wo [..., 3], valid mask)."""
    wi_x, wi_y, wi_z = wi[..., 0], wi[..., 1], wi[..., 2]
    px = jnp.sqrt(wi_x * wi_x + wi_z * wi_z)
    py = jnp.sqrt(wi_y * wi_y + wi_z * wi_z)
    sin_ix = jnp.where(px > m.Epsilon, wi_x / jnp.maximum(px, 1e-20), 0.0)
    sin_iy = jnp.where(py > m.Epsilon, wi_y / jnp.maximum(py, 1e-20), 0.0)

    cg = g.grating_dir[..., 0]
    sg = g.grating_dir[..., 1]
    lx = lobe_xy[..., 0].astype(jnp.float32)
    ly = lobe_xy[..., 1].astype(jnp.float32)

    extra = lx.ndim - cg.ndim
    if extra > 0:
        sh = cg.shape + (1,) * extra
        cg, sg = cg.reshape(sh), sg.reshape(sh)
        inv_p = g.inv_period.reshape(g.inv_period.shape[:1] + (1,) * extra + (2,))
        sin_ix = sin_ix.reshape(sin_ix.shape + (1,) * extra)
        sin_iy = sin_iy.reshape(sin_iy.shape + (1,) * extra)
    else:
        inv_p = g.inv_period

    lob_rx = cg * lx - sg * ly
    lob_ry = sg * lx + cg * ly

    sin_ox = wl_um * lob_rx * inv_p[..., 0] - sin_ix
    sin_oy = wl_um * lob_ry * inv_p[..., 1] - sin_iy

    a, b = sin_ox, sin_oy
    mm = (m.sqr(a) - 1.0) / jnp.where(
        jnp.abs(m.sqr(a * b) - 1.0) > 1e-12, m.sqr(a * b) - 1.0, 1e-12
    )
    qq = 1.0 - m.sqr(b) * mm
    wo = jnp.stack(
        [
            a * m.safe_sqrt(qq),
            b * m.safe_sqrt(mm),
            m.safe_sqrt(1.0 - m.sqr(a) * qq - m.sqr(b) * mm),
        ],
        axis=-1,
    )
    valid = (jnp.abs(a) <= 1.0) & (jnp.abs(b) <= 1.0)
    return wo, valid
