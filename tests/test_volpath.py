"""Volumetric path tracer tests (reference src/integrators/volpath.cpp role)."""
import dataclasses

import numpy as np
import jax.numpy as jnp

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.integrators.volpath import VolPathIntegrator
from mitsuba3_plt_tpu.scene.media import Medium, hg_sample, hg_eval
from mitsuba3_plt_tpu.scene.presets import cornell_box


def test_vacuum_matches_path():
    scene, _ = cornell_box(16, 16)
    scene_v = dataclasses.replace(
        scene, medium=Medium.create(sigma_t=(1e-5,) * 3, albedo=(0.9,) * 3)
    )
    img_p = np.asarray(
        render(scene, PathIntegrator(max_depth=3, rr_depth=9).sample,
               spp=32, cfg=RGB)
    )
    img_v = np.asarray(
        render(scene_v, VolPathIntegrator(max_depth=3, rr_depth=9).sample,
               spp=32, cfg=RGB)
    )
    rel = abs(img_v.mean() - img_p.mean()) / img_p.mean()
    assert rel < 2e-3, rel


def test_fog_attenuates_not_nan():
    scene, _ = cornell_box(16, 16)
    scene_f = dataclasses.replace(
        scene, medium=Medium.create(sigma_t=(0.5,) * 3, albedo=(0.8,) * 3,
                                    g=0.2)
    )
    img = np.asarray(
        render(scene_f, VolPathIntegrator(max_depth=5, rr_depth=9).sample,
               spp=32, cfg=RGB)
    )
    assert not np.isnan(img).any()
    assert 0 < img.mean() < 1.0


def test_hg_normalized_and_consistent():
    # MC integral of hg_eval over the sphere = 1; sample/eval agree
    rng = np.random.default_rng(0)
    n = 200000
    z = rng.uniform(-1, 1, n).astype(np.float32)
    integral = 4 * np.pi * np.asarray(hg_eval(0.6, jnp.asarray(z))).mean()
    assert abs(integral - 1.0) < 0.01, integral

    u2 = jnp.asarray(rng.random((n, 2), np.float32))
    wo, pdf = hg_sample(0.6, u2)
    # histogram of cos_theta vs pdf marginal (2*pi*hg(cos))
    cos = np.asarray(wo[:, 2])
    hist, edges = np.histogram(cos, bins=20, range=(-1, 1), density=True)
    centers = 0.5 * (edges[:-1] + edges[1:])
    expect = 2 * np.pi * np.asarray(hg_eval(0.6, jnp.asarray(centers)))
    np.testing.assert_allclose(hist, expect, rtol=0.08, atol=0.01)


def test_volpathmis_agrees_with_volpath():
    """Spectral-MIS free flight (volpathmis.cpp role) must estimate the
    same radiance as channel-0 sampling for colored extinction, at lower
    or comparable variance."""
    import dataclasses
    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.volpath import VolPathIntegrator
    from mitsuba3_plt_tpu.integrators.common import render
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.scene.media import Medium
    import numpy as np

    scene, _ = cornell_box(16, 16)

    # gray extinction: the balance heuristic collapses to the plain
    # channel-0 estimator — results must be bit-identical
    med_gray = Medium.create(sigma_t=(0.4,) * 3, albedo=(0.7,) * 3)
    sc = dataclasses.replace(scene, medium=med_gray)
    a = np.asarray(render(sc, VolPathIntegrator(
        max_depth=4, rr_depth=8).sample, spp=64, cfg=RGB))
    b = np.asarray(render(sc, VolPathIntegrator(
        max_depth=4, rr_depth=8, spectral_mis=True).sample, spp=64, cfg=RGB))
    # identical estimator; only compilation/fusion differs -> ulp-level
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # colored extinction: different estimator, same estimand — finite and
    # same order (fog renders are heavy-tailed; exact agreement needs far
    # more samples than a unit test affords)
    med_rgb = Medium.create(sigma_t=(0.8, 0.3, 0.1), albedo=(0.7,) * 3)
    sc = dataclasses.replace(scene, medium=med_rgb)
    c = np.asarray(render(sc, VolPathIntegrator(
        max_depth=4, rr_depth=8, spectral_mis=True).sample, spp=64, cfg=RGB))
    assert np.isfinite(c).all() and 0 < c.mean() < 1.0


def test_medium_sigma_grad_vs_fd():
    """Volumetric detached-sampling gradients (prbvolpath role,
    reference src/python/python/ad/integrators/prbvolpath.py): d(image)/
    d(sigma_t) through volpath matches finite differences."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mitsuba3_plt_tpu.ad.render import render_differentiable
    from mitsuba3_plt_tpu.scene.media import Medium
    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.volpath import VolPathIntegrator

    scene, _ = cornell_box(16, 16)
    integ = VolPathIntegrator(max_depth=4, rr_depth=99)

    def loss(s, seed=0, spp=96):
        medium = Medium.create(sigma_t=(s, s, s), albedo=(0.7,) * 3, g=0.2)
        sc = dataclasses.replace(scene, medium=medium)
        return jnp.mean(
            render_differentiable(sc, integ.sample, seed=seed, spp=spp,
                                  cfg=RGB)
        )

    g = float(jax.grad(loss)(jnp.float32(0.3)))
    assert np.isfinite(g)
    eps = 0.03
    fd = (float(loss(jnp.float32(0.3 + eps)))
          - float(loss(jnp.float32(0.3 - eps)))) / (2 * eps)
    # detached-sampling estimator vs noisy FD: generous but meaningful
    # (sign + magnitude; a pathwise estimator was 80% off, NaN before that)
    assert np.sign(g) == np.sign(fd)
    assert abs(g - fd) / max(abs(fd), 1e-6) < 0.35, (g, fd)


def test_medium_albedo_grad_vs_fd():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from mitsuba3_plt_tpu.ad.render import render_differentiable
    from mitsuba3_plt_tpu.scene.media import Medium
    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.volpath import VolPathIntegrator

    scene, _ = cornell_box(16, 16)
    integ = VolPathIntegrator(max_depth=4, rr_depth=99)

    def loss(a, seed=0, spp=96):
        medium = Medium.create(sigma_t=(0.3,) * 3, albedo=(a, a, a), g=0.2)
        sc = dataclasses.replace(scene, medium=medium)
        return jnp.mean(
            render_differentiable(sc, integ.sample, seed=seed, spp=spp,
                                  cfg=RGB)
        )

    g = float(jax.grad(loss)(jnp.float32(0.6)))
    eps = 0.05
    fd = (float(loss(jnp.float32(0.6 + eps)))
          - float(loss(jnp.float32(0.6 - eps)))) / (2 * eps)
    assert np.isfinite(g) and np.sign(g) == np.sign(fd)
    assert abs(g - fd) / max(abs(fd), 1e-6) < 0.25, (g, fd)


def test_polarized_volpath_s0_matches_scalar():
    """Full Mueller volumetric transport (round 5): on an all-diffuse fog
    scene the chain is S0-separable, so the polarized S0 must equal the
    scalar estimator (same sampler dims by construction)."""
    from mitsuba3_plt_tpu.config import RGB_POLARIZED

    scene, _ = cornell_box(12, 12)
    scene_f = dataclasses.replace(
        scene, medium=Medium.create(sigma_t=(0.4,) * 3, albedo=(0.8,) * 3,
                                    g=0.2)
    )
    integ = VolPathIntegrator(max_depth=4, rr_depth=9)
    img_s = np.asarray(render(scene_f, integ.sample, spp=16, cfg=RGB))
    img_p = np.asarray(
        render(scene_f, integ.sample, spp=16, cfg=RGB_POLARIZED)
    )
    np.testing.assert_allclose(img_p, img_s, rtol=2e-5, atol=1e-6)


def test_polarized_volpath_fog_conductor_polarizes():
    """A mirror box in fog: oblique conductor reflections through the
    medium must produce genuine S1/S2 (the r4-style scalar approximation
    returned exactly zero there), bounded by DoP <= 1."""
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.stokes import StokesIntegrator

    scene, _ = cornell_box(16, 16, box_material="conductor")
    scene_f = dataclasses.replace(
        scene, medium=Medium.create(sigma_t=(0.1,) * 3, albedo=(0.6,) * 3)
    )
    integ = StokesIntegrator(
        inner=VolPathIntegrator(max_depth=4, rr_depth=9)
    )
    img = np.asarray(
        render(scene_f, integ.sample, spp=24, cfg=RGB, n_out_channels=15)
    )
    assert not np.isnan(img).any()
    s0 = img[..., 3:6]
    lp = np.sqrt(img[..., 6:9] ** 2 + img[..., 9:12] ** 2)
    assert float(lp.max()) > 1e-4 * float(s0.max())
    dop = lp.sum(-1) / np.maximum(s0.sum(-1), 1e-6)
    assert float(dop[s0.sum(-1) > 1e-3].max()) <= 1.0 + 1e-3
