"""Regenerative-wavefront equivalence: sample_regen restarts finished lanes
on new strided camera samples mid-flight, but every sample's radiance is a
pure function of (seed, sample id, dim) — so a regen render must match the
scan-megakernel render sample-for-sample (same estimator, different
schedule). Reference analog: the respawn variant of the megakernel loop in
src/integrators/path.cpp (wavefront scheduling is Dr.Jit's job there)."""
import numpy as np
import pytest


def _render_pair(scene, integ, **kw):
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.common import render

    cfg = kw.pop("cfg", RGB)
    a = np.asarray(render(scene, integ.sample, seed=3, cfg=cfg, **kw))
    b = np.asarray(
        render(scene, integ.sample, seed=3, cfg=cfg, regen=True, **kw)
    )
    return a, b


def test_regen_matches_scan_cornell():
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(64, 64)
    integ = PathIntegrator(max_depth=4, rr_depth=2)  # RR exercises respawn
    a, b = _render_pair(scene, integ, spp=16)
    # same samples, same splat — only the fp summation grouping differs
    assert np.allclose(a, b, rtol=2e-5, atol=2e-6), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_regen_matches_scan_open_scene():
    """Open scene (most paths escape at depth 1-2): the case regen targets."""
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.scene.presets import grating_scene

    scene, _ = grating_scene(64, 64, coherence=1e3)
    integ = PathIntegrator(max_depth=6, rr_depth=9)
    a, b = _render_pair(scene, integ, spp=16)
    assert np.allclose(a, b, rtol=2e-5, atol=2e-6), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_regen_matches_scan_filtered_and_stratified():
    """Non-box rfilter + stratified sampler: uv recompute path must agree."""
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.librender.film import FILTER_GAUSSIAN
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(64, 64)
    integ = PathIntegrator(max_depth=3, rr_depth=9)
    a, b = _render_pair(
        scene, integ, spp=16, rfilter=FILTER_GAUSSIAN,
        sampler_type="stratified",
    )
    assert np.allclose(a, b, rtol=2e-5, atol=2e-6), (
        np.abs(a - b).max(), np.abs(a).max()
    )


def test_regen_spectral():
    from mitsuba3_plt_tpu.config import SPECTRAL
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(48, 48)
    integ = PathIntegrator(max_depth=3, rr_depth=9)
    a, b = _render_pair(scene, integ, spp=32, cfg=SPECTRAL)
    assert np.allclose(a, b, rtol=2e-5, atol=2e-6), (
        np.abs(a - b).max(), np.abs(a).max()
    )
