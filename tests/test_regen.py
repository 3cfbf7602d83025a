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


def test_morton_pixel_order():
    """Morton sample layout (bench mesh82k / clu2 tiles): the arithmetic
    in-kernel decode must match the host permutation, and a regen render in
    morton order must produce the same image as scanline up to MC noise
    (different sample->pixel assignment, same estimator)."""
    import jax.numpy as jnp

    from mitsuba3_plt_tpu.integrators.common import (
        morton_pixel_of, morton_pixel_perm,
    )

    W = H = 32
    mp = morton_pixel_perm(W, H)
    # permutation property
    assert np.sort(mp).tolist() == list(range(W * H))
    # device decode == host decode
    dev = np.asarray(morton_pixel_of(jnp.arange(W * H, dtype=jnp.uint32), W))
    np.testing.assert_array_equal(dev, mp)

    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(W, H)
    integ = PathIntegrator(max_depth=3, rr_depth=2)
    spp = 16
    total = W * H * spp

    vals_sl = np.asarray(integ.sample_regen(
        scene, jnp.uint32(0), W, H, spp, RGB, total // 4))
    vals_mo = np.asarray(integ.sample_regen(
        scene, jnp.uint32(0), W, H, spp, RGB, total // 4,
        pixel_order="morton"))
    img_sl = vals_sl.reshape(W * H, spp, 3).mean(1)
    inv = np.empty_like(mp)
    inv[mp] = np.arange(len(mp))
    img_mo = vals_mo.reshape(W * H, spp, 3).mean(1)[inv]
    # same estimator, different per-pixel sample ids: images agree to noise
    err = np.abs(img_sl - img_mo).mean() / max(img_sl.mean(), 1e-9)
    assert err < 0.35, err
    # global means agree to the heavy-tailed emitter-hit noise at 16 spp
    assert abs(img_sl.mean() - img_mo.mean()) / img_sl.mean() < 0.06
