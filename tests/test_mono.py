"""Monochrome variant (reference mitsuba.conf mono modes): one luminance
channel; color inputs collapse via Rec.709 luminance at evaluation time."""
import numpy as np

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.config import MONO, MONO_POLARIZED, RGB
from mitsuba3_plt_tpu.scene.presets import cornell_box, grating_scene


def _gray_box(res=12):
    """All-gray cornell box: luminance transport == per-channel transport,
    so mono must equal any RGB channel exactly."""
    import jax.numpy as jnp
    import dataclasses

    scene, meta = cornell_box(res, res)
    mats = scene.materials
    gray = jnp.mean(mats.base_color, axis=-1, keepdims=True)
    mats = dataclasses.replace(
        mats, base_color=jnp.broadcast_to(gray, mats.base_color.shape)
    )
    em = scene.emitters
    lum = jnp.mean(em.radiance, axis=-1, keepdims=True)
    em = dataclasses.replace(
        em, radiance=jnp.broadcast_to(lum, em.radiance.shape)
    )
    return dataclasses.replace(scene, materials=mats, emitters=em), meta


def test_mono_matches_gray_rgb_channel():
    scene, _ = _gray_box()
    img_rgb = np.asarray(mi.render(scene, spp=8, cfg=RGB, seed=1))
    img_m = np.asarray(mi.render(scene, spp=8, cfg=MONO, seed=1))
    assert img_m.shape == img_rgb.shape[:2] + (1,)
    np.testing.assert_allclose(img_m[..., 0], img_rgb[..., 0],
                               rtol=2e-5, atol=1e-6)


def test_mono_colored_scene_near_luminance():
    """Colored scene: mono transport uses luminance at every interaction —
    close to (not exactly) the luminance of the RGB render."""
    scene, _ = cornell_box(12, 12)
    img_rgb = np.asarray(mi.render(scene, spp=16, cfg=RGB, seed=1))
    img_m = np.asarray(mi.render(scene, spp=16, cfg=MONO, seed=1))
    lum = img_rgb @ np.array([0.212671, 0.715160, 0.072169])
    assert np.isfinite(img_m).all()
    rel = abs(img_m[..., 0].mean() - lum.mean()) / lum.mean()
    assert rel < 0.15, rel


def test_mono_polarized_runs():
    scene, _ = cornell_box(8, 8, box_material="conductor")
    img = np.asarray(mi.render(scene, spp=4, cfg=MONO_POLARIZED, seed=0))
    assert img.shape[-1] == 1
    assert np.isfinite(img).all()


def test_mono_plt_grating():
    from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator

    scene, _ = grating_scene(12, 12, coherence=1e3)
    img = np.asarray(
        mi.render(scene, integrator=PLTIntegrator(max_depth=3), spp=8,
                  cfg=MONO, seed=0)
    )
    assert img.shape[-1] == 1
    assert np.isfinite(img).all() and img.max() > 0
