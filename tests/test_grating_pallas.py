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


@pytest.mark.parametrize("gtype,ip_y", [(gr.SINUSOIDAL, 0.0),
                                        (gr.RECTANGULAR, 1.5)])
def test_sample_kernel_matches_xla(gtype, ip_y):
    """grating_sample (interpret) vs the XLA wbsdf_sample chain."""
    from mitsuba3_plt_tpu.ops.grating_pallas import grating_sample
    from mitsuba3_plt_tpu.core import frame as fr
    from mitsuba3_plt_tpu.librender import microfacet as mf
    from mitsuba3_plt_tpu.librender import mueller as mu

    rng = np.random.default_rng(11)
    N, half = 2048, 3
    wi = _rand_dir(rng, N)
    u2 = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    lu2 = jnp.asarray(rng.uniform(0, 1, (N, 2)).astype(np.float32))
    wl_um = jnp.asarray(rng.uniform(0.38, 0.68, N).astype(np.float32))
    alpha = jnp.asarray(rng.uniform(0.03, 0.3, (N, 2)).astype(np.float32))
    ip_t = jnp.stack([jnp.full((N,), 2.0), jnp.full((N,), ip_y)], -1)
    q = jnp.asarray(rng.uniform(0.02, 0.3, N).astype(np.float32))
    lobes = jnp.asarray(rng.choice([3, 5, 7], N).astype(np.int32))
    gt = jnp.full((N,), gtype, jnp.int32)
    mult = jnp.full((N,), 1.1)
    gdir = jnp.stack([jnp.ones((N,)), jnp.zeros((N,))], -1)
    g = gr.Grating(grating_dir=gdir, inv_period=ip_t, q=q, lobes=lobes,
                   gtype=gt, multiplier=mult)

    got = grating_sample(wi, u2, lobe_u2=lu2, wl_um=wl_um, alpha=alpha,
                         grating_dir=gdir, inv_period=ip_t, q=q,
                         lobes=lobes, gtype=gt, multiplier=mult,
                         half=half, interpret=True)

    # XLA chain (RoughGratingW.wbsdf_sample fallback branch, verbatim)
    au, av = alpha[..., 0], alpha[..., 1]
    cos_i = wi[..., 2]
    wi_up = jnp.where((cos_i < 0)[..., None], -wi, wi)
    mvec, mpdf = mf.sample_vndf_ggx(wi_up, u2, au, av)
    refl = fr.reflect_n(wi, mvec)
    ms, mt = mu.coordinate_system(mvec)
    wi_m = jnp.stack(
        [fr.dot(wi, ms), fr.dot(wi, mt), fr.dot(wi, mvec)], axis=-1)
    base = gr.order_intensities(g, wi_m, wl_um, half)
    lobe, pdf_xy = gr.sample_lobe(g, lu2, wi_m, wl_um, half, base)
    intensity = gr.lobe_intensity_xy(g, lobe, wi_m, wl_um, half, base)
    wo_m, diff_ok = gr.diffract(g, wi_m, lobe, wl_um)
    wo = ms * wo_m[..., 0:1] + mt * wo_m[..., 1:2] + mvec * wo_m[..., 2:3]
    pdf = mpdf * pdf_xy[..., 0] * pdf_xy[..., 1] / jnp.maximum(
        4.0 * jnp.abs(fr.dot(refl, mvec)), 1e-12)
    ok = (cos_i > 0) & (mpdf > 0) & (fr.cos_theta(wo) > 0) & diff_ok
    w_g1_int = mf.smith_g1(refl, mvec, au, av, mf.GGX) * intensity

    np.testing.assert_allclose(np.asarray(got["mvec"]), np.asarray(mvec),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["lobe"]), np.asarray(lobe))
    m_ok = np.asarray(ok)
    np.testing.assert_array_equal(np.asarray(got["ok"]), m_ok)
    # only compare live lanes for direction-dependent outputs
    np.testing.assert_allclose(np.asarray(got["wo"])[m_ok],
                               np.asarray(wo)[m_ok], rtol=1e-4, atol=1e-5)
    # near-specular lanes can saturate to inf in one path only (1/cos^4 at
    # f32 eps differences); pdfs that large are MIS-equivalent — clip
    got_pdf = np.minimum(np.asarray(got["pdf"])[m_ok], 1e6)
    want_pdf = np.minimum(np.asarray(pdf)[m_ok], 1e6)
    np.testing.assert_allclose(got_pdf, want_pdf, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["w_g1_int"])[m_ok],
                               np.asarray(w_g1_int)[m_ok],
                               rtol=2e-3, atol=1e-6)


def test_lobe_sum_custom_vjp_grads():
    """jax.grad through grating_lobe_sum (primal = kernel, vjp = XLA
    re-implementation) matches grads of the pure-XLA chain — the PLT
    grating parameters (inv_period, height, multiplier, coherence) must
    stay differentiable on TPU where the kernel is the primal."""
    rng = np.random.default_rng(3)
    N, C, half = 512, 3, 3
    wi, wo = _rand_dir(rng, N), _rand_dir(rng, N)
    wl = jnp.asarray(rng.uniform(380, 680, (N, C)).astype(np.float32))
    gdir = jnp.stack([jnp.ones((N,)), jnp.zeros((N,))], -1)
    ip_t = jnp.stack([jnp.full((N,), 2.0), jnp.zeros((N,))], -1)
    q = jnp.asarray(rng.uniform(0.05, 0.2, N).astype(np.float32))
    lobes = jnp.full((N,), 7, jnp.int32)
    gt = jnp.zeros((N,), jnp.int32)
    mult = jnp.full((N,), 1.2)
    coh = jnp.full((N,), 40.0)
    a_cone = jnp.full((N,), 0.3)

    from mitsuba3_plt_tpu.ops.grating_pallas import (
        grating_lobe_sum, _lobe_sum_xla,
    )

    def loss_kernel(qv, ipx, mu, co):
        ip2 = jnp.stack([ipx, jnp.zeros_like(ipx)], -1)
        out = grating_lobe_sum(
            wi, wo, wl, gdir, ip2, qv, lobes, gt, mu, co, a_cone,
            half=half, separable=True, n_channels=C, interpret=True,
        )
        return jnp.sum(out * out)

    def loss_xla(qv, ipx, mu, co):
        ip2 = jnp.stack([ipx, jnp.zeros_like(ipx)], -1)
        out = _lobe_sum_xla(
            wi, wo, wl, gdir, ip2, qv, lobes.astype(jnp.float32),
            gt.astype(jnp.float32), mu, co, a_cone,
            half=half, separable=True,
        )
        return jnp.sum(out * out)

    ipx = ip_t[:, 0]
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, ipx, mult, coh)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, ipx, mult, coh)
    for a, b, name in zip(gk, gx, ("q", "inv_period", "mult", "coh")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=name,
        )
