"""Diffraction-grating model tests (reference parity surface:
include/mitsuba/plt/diffractiongrating.h; the fork ships no tests for it —
SURVEY §4 gap)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import jv

from mitsuba3_plt_tpu.plt import grating as gr
from mitsuba3_plt_tpu.core import math as m


def make_grating(n, inv_period=(2.0, 0.0), q=0.1, lobes=5, gtype=0, mult=1.0):
    return gr.Grating.create(
        grating_angle=jnp.zeros(n),
        inv_period=jnp.tile(jnp.asarray([inv_period], jnp.float32), (n, 1)),
        q=jnp.full(n, q, jnp.float32),
        lobes=jnp.full(n, lobes, jnp.int32),
        gtype=jnp.full(n, gtype, jnp.int32),
        multiplier=jnp.full(n, mult, jnp.float32),
        uv=jnp.full((n, 2), 0.3, jnp.float32),
    )


def unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_grating_equation():
    # sin_o = m * lambda * inv_period - sin_i along the grating axis
    g = make_grating(1)
    wi = jnp.asarray([unit([0.3, 0.0, 0.95])], jnp.float32)
    wl = jnp.asarray([0.5], jnp.float32)  # um
    for order in [-2, -1, 1, 2]:
        lobe = jnp.asarray([[order, 0]], jnp.int32)
        wo, ok = gr.diffract(g, wi, lobe, wl)
        sin_i = float(wi[0, 0] / np.hypot(wi[0, 0], wi[0, 2]))
        sin_o_expect = 0.5 * 2.0 * order - sin_i
        if abs(sin_o_expect) > 1:
            assert not bool(ok[0])
            continue
        sin_o = float(wo[0, 0] / np.hypot(wo[0, 0], wo[0, 2]))
        assert bool(ok[0])
        assert abs(sin_o - sin_o_expect) < 1e-5
        assert abs(float(jnp.linalg.norm(wo[0])) - 1.0) < 1e-5


def test_sinusoidal_intensities_match_bessel():
    g = make_grating(1, q=0.1)
    wi = jnp.asarray([unit([0.2, 0.1, 0.97])], jnp.float32)
    wl = jnp.asarray([0.55], jnp.float32)
    ints = np.asarray(gr.order_intensities(g, wi, wl, 4))[0]
    a = 4 * np.pi * 0.1 / (0.55 * abs(float(wi[0, 2])))
    expect = [1.0] + [jv(l, a) ** 2 for l in range(1, 5)]
    np.testing.assert_allclose(ints, expect, rtol=1e-4, atol=1e-6)


def test_sample_lobe_matches_cdf():
    n = 50000
    g = make_grating(n, lobes=5)
    wi = jnp.broadcast_to(
        jnp.asarray(unit([0.3, 0.0, 0.95]), jnp.float32), (n, 3)
    )
    wl = jnp.full(n, 0.5, jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((n, 2), np.float32))
    lobe, pdf = gr.sample_lobe(g, u, wi, wl, 4)
    lobe = np.asarray(lobe)

    # expected frequencies from the one-sided intensities with order-0 halved
    ints = np.asarray(gr.order_intensities(g, wi[:1], wl[:1], 4))[0]
    ints = ints.copy()
    ints[0] *= 0.5
    ints[3:] = 0.0  # lobes=5 -> orders 0..2
    p = ints / ints.sum()
    for order in [-2, -1, 0, 1, 2]:
        freq = (lobe[:, 0] == order).mean()
        expect = p[0] if order == 0 else p[abs(order)] / 2
        assert abs(freq - expect) < 0.01, (order, freq, expect)


def test_lobe_pdf_normalized():
    # lobe_pdf follows the reference's one-sided convention
    # (diffractiongrating.h:164-190): it does NOT halve mirrored orders, so
    # normalization holds over the one-sided order grid.
    g = make_grating(1, lobes=9)
    wi = jnp.asarray([unit([0.1, 0.2, 0.97])], jnp.float32)
    wl = jnp.asarray([0.6], jnp.float32)
    total = 0.0
    for lx in range(0, 5):
        for ly in range(0, 5):
            total += float(
                gr.lobe_pdf(g, jnp.asarray([[lx, ly]], jnp.int32), wi, wl, 4)[0]
            )
    assert abs(total - 1.0) < 1e-3


def test_alpha_far_field():
    g = make_grating(1, q=0.04)
    wi = jnp.asarray([unit([0.0, 0.0, 1.0])], jnp.float32)
    k = jnp.asarray([2 * np.pi / 0.5], jnp.float32)
    a = float(g.alpha(wi, k)[0])
    expect = np.exp(-((1.0 * 0.04 * 2 * np.pi / 0.5) ** 2))
    assert abs(a - expect) < 1e-5


def test_radial_direction_from_uv():
    n = 2
    g = gr.Grating.create(
        grating_angle=jnp.zeros(n),
        inv_period=jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (n, 1)),
        q=jnp.full(n, 0.1),
        lobes=jnp.full(n, 3, jnp.int32),
        gtype=jnp.full(n, gr.SINUSOIDAL | gr.RADIAL, jnp.int32),
        multiplier=jnp.ones(n),
        uv=jnp.asarray([[0.75, 0.5], [0.5, 0.75]], jnp.float32),
    )
    d = np.asarray(g.grating_dir)
    np.testing.assert_allclose(d[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(d[1], [0.0, -1.0], atol=1e-6)
