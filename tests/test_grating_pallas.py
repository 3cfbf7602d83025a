"""Pallas grating lobe-sum kernel vs the pure-XLA eval chain.

The TPU render path swaps the [N, C, L] lobe-sum broadcast of
RoughGratingW.wbsdf_eval for the fused kernel in ops/grating_pallas.py
(reference algebra: roughgrating.cpp:676-970). This runs the kernel in
interpret mode on CPU against the XLA chain for every grating profile and
both lobe-grid layouts. Tolerance covers the kernel's polynomial asin
(|err| <= 6.8e-5 rad) inside the coherence Gaussian.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba3_plt_tpu.plt.grating as gr
from mitsuba3_plt_tpu.core import math as m
from mitsuba3_plt_tpu.ops.grating_pallas import grating_lobe_sum
from mitsuba3_plt_tpu.plt.coherence import Coherence


def _rand_dir(rng, n):
    v = rng.normal(size=(n, 3))
    v[:, 2] = np.abs(v[:, 2]) + 0.1
    return jnp.asarray(
        (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
    )


def _xla_lobe_sum(g, wi, wo, wl, coh, a_cone, half, separable):
    """The wbsdf.py eval chain, reduced to the per-wavelength sum."""
    N, C = wl.shape
    wl_um = wl * 1e-3
    k = 2.0 * m.Pi / jnp.maximum(wl_um, 1e-6)
    side = np.arange(-half, half + 1)
    if separable:
        lx_g, ly_g = side, np.zeros_like(side)
    else:
        gx, gy = np.meshgrid(side, side, indexing="ij")
        lx_g, ly_g = gx.ravel(), gy.ravel()
    lane_half = (g.lobes // 2)[:, None, None]
    live = (jnp.asarray(np.abs(lx_g))[None, None, :] <= lane_half) & (
        jnp.asarray(np.abs(ly_g))[None, None, :] <= lane_half
    )
    base = gr.order_intensities(g, wi, wl_um, half)
    ix = base[:, :, np.abs(lx_g)]
    iy = jnp.where(g.is_1d()[:, None, None], ix, base[:, :, np.abs(ly_g)])
    lobe_int = g.multiplier[:, None, None] * ix * iy
    wi_x, wi_y, wi_z = wi[..., 0], wi[..., 1], wi[..., 2]
    px = jnp.sqrt(wi_x * wi_x + wi_z * wi_z)
    py = jnp.sqrt(wi_y * wi_y + wi_z * wi_z)
    sin_ix = jnp.where(px > m.Epsilon, wi_x / jnp.maximum(px, 1e-20), 0.0)
    sin_iy = jnp.where(py > m.Epsilon, wi_y / jnp.maximum(py, 1e-20), 0.0)
    cg = g.grating_dir[..., 0][:, None, None]
    sg = g.grating_dir[..., 1][:, None, None]
    lxf = jnp.asarray(lx_g, jnp.float32)[None, None, :]
    lyf = jnp.asarray(ly_g, jnp.float32)[None, None, :]
    a = wl_um[:, :, None] * (cg * lxf - sg * lyf) \
        * g.inv_period[:, 0][:, None, None] - sin_ix[:, None, None]
    b = wl_um[:, :, None] * (sg * lxf + cg * lyf) \
        * g.inv_period[:, 1][:, None, None] - sin_iy[:, None, None]
    mm = (m.sqr(a) - 1.0) / jnp.where(
        jnp.abs(m.sqr(a * b) - 1.0) > 1e-12, m.sqr(a * b) - 1.0, 1e-12
    )
    qq = 1.0 - m.sqr(b) * mm
    lobe_ok = (jnp.abs(a) <= 1.0) & (jnp.abs(b) <= 1.0)
    cd_dot_wo = (
        a * m.safe_sqrt(qq) * wo[:, 0][:, None, None]
        + b * m.safe_sqrt(mm) * wo[:, 1][:, None, None]
        + m.safe_sqrt(1.0 - m.sqr(a) * qq - m.sqr(b) * mm)
        * wo[:, 2][:, None, None]
    )
    ang = m.unit_angle_dot(cd_dot_wo)
    in_cone = jnp.abs(ang) < a_cone[:, None, None]
    inv_det = Coherence.isotropic(
        coh, jnp.ones((N,), jnp.float32)
    ).inv_coherence_det(k)
    ang_coh = jnp.exp(-0.5 * ang * ang * inv_det[:, :, None])
    is_zero = jnp.asarray((lx_g == 0) & (ly_g == 0))[None, None, :]
    contrib = jnp.where(
        lobe_ok & in_cone & live,
        lobe_int * jnp.where(is_zero, 1.0, ang_coh), 0.0,
    )
    if separable:
        ny = (2 * (g.lobes // 2) + 1).astype(jnp.float32)[:, None, None]
        corr = jnp.where(
            is_zero & lobe_ok & in_cone & live,
            lobe_int * (ang_coh - 1.0) * (ny - 1.0), 0.0,
        )
        contrib = contrib * ny + corr
    return jnp.sum(contrib, axis=-1)


@pytest.mark.parametrize(
    "half,separable,gtype,ip_y",
    [
        (3, True, gr.SINUSOIDAL, 0.0),
        (3, False, gr.SINUSOIDAL, 1.5),
        (4, True, gr.RECTANGULAR, 0.0),
        (2, True, gr.LINEAR, 0.0),
    ],
)
def test_kernel_matches_xla(half, separable, gtype, ip_y):
    rng = np.random.default_rng(7)
    N, C = 2048, 3
    wi, wo = _rand_dir(rng, N), _rand_dir(rng, N)
    wl = jnp.asarray(rng.uniform(380, 680, (N, C)).astype(np.float32))
    ip_t = jnp.stack([jnp.full((N,), 2.0), jnp.full((N,), ip_y)], -1)
    q = jnp.asarray(rng.uniform(0.02, 0.3, N).astype(np.float32))
    lobes = jnp.asarray(rng.choice([3, 5, 7, 9], N).astype(np.int32))
    gt = jnp.full((N,), gtype, jnp.int32)
    mult = jnp.full((N,), 1.3)
    coh = jnp.asarray(rng.uniform(1.0, 120.0, N).astype(np.float32))
    a_cone = jnp.asarray(rng.uniform(0.05, 0.4, N).astype(np.float32))
    gdir = jnp.stack([jnp.ones((N,)), jnp.zeros((N,))], -1)
    g = gr.Grating(grating_dir=gdir, inv_period=ip_t, q=q, lobes=lobes,
                   gtype=gt, multiplier=mult)

    got = grating_lobe_sum(
        wi, wo, wl, gdir, ip_t, q, lobes, gt, mult, coh, a_cone,
        half=half, separable=separable, n_channels=C, interpret=True,
    )
    want = _xla_lobe_sum(g, wi, wo, wl, coh, a_cone, half, separable)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-5
    )
