"""Polarized transport tests: Mueller path tracer consistency + physics.

Parity surface: src/integrators/stokes.cpp, stokes_fw.cpp, the polarized
variant semantics of mueller.h."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.integrators.stokes import StokesIntegrator
from mitsuba3_plt_tpu.librender import mueller as mu
from mitsuba3_plt_tpu.scene.presets import cornell_box


def test_s0_matches_unpolarized_path():
    scene, _ = cornell_box(16, 16)
    img_s = np.asarray(
        render(scene, StokesIntegrator().sample, seed=0, spp=16, cfg=RGB,
               n_out_channels=15)
    )
    img_p = np.asarray(
        render(scene, PathIntegrator(max_depth=6, rr_depth=5).sample,
               seed=0, spp=16, cfg=RGB)
    )
    s0 = img_s[..., 3:6]
    np.testing.assert_allclose(s0, img_p, rtol=1e-3, atol=1e-4)


def test_diffuse_scene_unpolarized():
    scene, _ = cornell_box(16, 16)
    img = np.asarray(
        render(scene, StokesIntegrator().sample, seed=0, spp=16, cfg=RGB,
               n_out_channels=15)
    )
    s0 = img[..., 3:6]
    s123 = img[..., 6:15]
    assert np.abs(s123).max() < 1e-3 * max(s0.max(), 1.0)


def test_dielectric_polarizes():
    scene, _ = cornell_box(24, 24, box_material="dielectric")
    img = np.asarray(
        render(scene, StokesIntegrator().sample, seed=0, spp=24, cfg=RGB,
               n_out_channels=15)
    )
    s0 = img[..., 3:6]
    dop = np.sqrt(img[..., 6:9] ** 2 + img[..., 9:12] ** 2) / np.maximum(
        s0, 1e-6
    )
    assert float(dop.max()) > 0.1  # Brewster-region reflections
    # physical bound: DOP <= 1 wherever there is signal
    assert float(dop[s0 > 1e-3].max()) <= 1.0 + 1e-3


def test_conductor_mueller_vs_analytic():
    # n = 0.2 + 3.9i at 45 deg (free-space side)
    ct = jnp.asarray([np.cos(np.deg2rad(45.0))])
    M = np.asarray(
        mu.specular_reflection_conductor(ct, jnp.asarray([0.2]), jnp.asarray([3.9]))
    )[0]
    n_c = 0.2 + 3.9j
    th = np.deg2rad(45)
    cos_t = np.sqrt(1 - (np.sin(th) / n_c) ** 2)
    r_s = (np.cos(th) - n_c * cos_t) / (np.cos(th) + n_c * cos_t)
    r_p = (n_c * np.cos(th) - cos_t) / (n_c * np.cos(th) + cos_t)
    Rs, Rp = abs(r_s) ** 2, abs(r_p) ** 2
    assert abs(M[0, 0] - 0.5 * (Rs + Rp)) < 1e-4
    assert abs(abs(M[0, 1]) - 0.5 * (Rs - Rp)) < 1e-4


def test_polvis_false_color():
    """polvis (src/python/python/polvis.py role): DoLP/AoLP false-color
    maps from a stokes render of a polarizing scene."""
    import numpy as np
    from mitsuba3_plt_tpu.utils.polvis import polvis, split_stokes, dolp

    # synthetic stokes image: left half unpolarized, right half fully
    # horizontally polarized (s1 = s0)
    H = W = 8
    img = np.zeros((H, W, 15), np.float32)
    img[..., 0:3] = 1.0
    img[..., 3:6] = 1.0           # S0
    img[:, W // 2:, 6:9] = 1.0    # S1 on the right half
    d = dolp(*split_stokes(img)[1:])
    assert d[:, : W // 2].max() < 1e-6
    np.testing.assert_allclose(d[:, W // 2 :], 1.0, atol=1e-6)
    vis = polvis(img, "dolp")
    assert vis.shape == (H, W, 3)
    vis_aolp = polvis(img, "aolp")
    assert np.all((vis_aolp >= 0) & (vis_aolp <= 1))
    vis_s1 = polvis(img, "s1")
    assert vis_s1[:, W // 2 :, 0].min() > 0.9   # +s1 -> red
    assert vis_s1[:, : W // 2].max() < 1e-6


def test_compat16_layout():
    """StokesIntegrator(compat16=True) emits the reference's 16-channel
    layout [R, G, B, A, S0..S3] (polvis.py:16 asserts 16 channels, S0 at
    4:7) and polvis.split_stokes auto-detects it."""
    from mitsuba3_plt_tpu.utils.polvis import split_stokes

    scene, _ = cornell_box(8, 8)
    integ = StokesIntegrator(compat16=True)
    assert integ.n_out_channels == 16
    img = np.asarray(
        render(scene, integ.sample, seed=0, spp=4, cfg=RGB,
               n_out_channels=16)
    )
    assert img.shape[-1] == 16
    np.testing.assert_allclose(img[..., 3], 1.0)  # alpha
    rgb, s0, s1, s2, s3 = split_stokes(img)
    np.testing.assert_allclose(s0, img[..., 4:7])
    np.testing.assert_allclose(rgb, s0, rtol=1e-5, atol=1e-6)


def test_depolarizer_collapse_equivalence():
    """The static depolarizer collapse (stokes.py _S0_SEPARABLE_TYPES) must
    be EXACT: on an all-diffuse scene the full [N,4,4,C] Mueller transport
    and the collapsed scalar path produce the same Stokes image (same
    sampler dims, same RR chain; S1..S3 identically zero)."""
    from mitsuba3_plt_tpu.integrators.stokes import (
        PolarizedPathIntegrator, depolarizer_collapse_ok,
    )

    scene, _ = cornell_box(16, 16)
    assert depolarizer_collapse_ok(scene)
    img_fast = np.asarray(
        render(scene, StokesIntegrator().sample, seed=0, spp=8, cfg=RGB,
               n_out_channels=15)
    )
    full = StokesIntegrator(inner=PolarizedPathIntegrator(force_full=True))
    img_full = np.asarray(
        render(scene, full.sample, seed=0, spp=8, cfg=RGB,
               n_out_channels=15)
    )
    np.testing.assert_allclose(img_fast, img_full, rtol=2e-5, atol=1e-6)
    # and a polarizing scene must NOT collapse
    scene_d, _ = cornell_box(8, 8, box_material="dielectric")
    assert not depolarizer_collapse_ok(scene_d)


def test_path_scene_renders_under_polarized_variant():
    """A plain `path` scene under a polarized variant must transparently
    switch to Mueller transport (reference: the polarized Spectrum type
    does this at compile time); previously this raised a broadcast error.
    The film gets S0, which matches the unpolarized render up to the
    polarized estimator's different sample stream."""
    import numpy as np
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.config import RGB, RGB_POLARIZED
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(24, 24)
    img_u = np.asarray(mi.render(scene, spp=16, cfg=RGB, seed=3))
    img_p = np.asarray(mi.render(scene, spp=16, cfg=RGB_POLARIZED, seed=3))
    assert img_p.shape == img_u.shape
    assert not np.isnan(img_p).any()
    # S0 of the polarized transport estimates the same radiance
    assert abs(img_p.mean() - img_u.mean()) / img_u.mean() < 0.1
