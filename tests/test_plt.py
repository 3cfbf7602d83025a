"""PLT integrator tests: consistency with the classic path tracer on
classic-material scenes, and wave-effect smoke checks (the fork ships no
integrator tests — SURVEY §4 gap)."""
import numpy as np
import jax
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator
from mitsuba3_plt_tpu.scene.presets import cornell_box, grating_scene


def test_plt_matches_path_on_diffuse_scene():
    """On a grating-free scene the PLT sample-solve estimator targets the
    same integral as the classic path tracer (diffuse wbsdf_weight == albedo
    == f*cos/pdf under cosine sampling)."""
    scene, _ = cornell_box(24, 24)
    img_path = np.asarray(
        render(scene, PathIntegrator(max_depth=4, rr_depth=8).sample,
               seed=0, spp=96, cfg=RGB)
    )
    img_plt = np.asarray(
        render(scene, PLTIntegrator(max_depth=4, rr_depth=8).sample,
               seed=1, spp=96, cfg=RGB)
    )
    assert not np.isnan(img_plt).any()
    # MC noise at 96 spp on 24x24: compare means and per-pixel correlation
    rel = abs(img_plt.mean() - img_path.mean()) / img_path.mean()
    assert rel < 0.06, rel
    corr = np.corrcoef(img_plt.ravel(), img_path.ravel())[0, 1]
    assert corr > 0.97, corr


def test_plt_grating_renders_rainbow():
    scene, _ = grating_scene(32, 32, coherence=1e3)
    img = np.asarray(
        render(scene, PLTIntegrator(max_depth=3, rr_depth=8).sample,
               seed=0, spp=24, cfg=RGB)
    )
    assert not np.isnan(img).any()
    assert img.max() > 0.05
    bright = img[img.sum(-1) > np.percentile(img.sum(-1), 90)]
    sat = (bright.max(-1) - bright.min(-1)) / np.maximum(bright.max(-1), 1e-6)
    # diffraction lobes disperse wavelengths -> saturated colors must appear
    assert float(sat.mean()) > 0.15, float(sat.mean())


def test_plt_no_emitters_black():
    scene, _ = cornell_box(8, 8, light_scale=0.0)
    img = np.asarray(
        render(scene, PLTIntegrator(max_depth=3).sample, seed=0, spp=4, cfg=RGB)
    )
    assert img.max() < 1e-6
