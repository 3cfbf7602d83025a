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


def test_fused_vs_two_phase_equivalence():
    """plt.py:493-499 claim pinned (VERDICT r4 item 5): the fused single
    scan equals sample_phase + solve_phase to f32 tolerance, RGB and
    polarized, on a grating + diffuse mix."""
    import jax.numpy as jnp

    from mitsuba3_plt_tpu.config import RGB_POLARIZED
    from mitsuba3_plt_tpu.core.rng import Sampler
    from mitsuba3_plt_tpu.integrators.common import sample_rays

    scene, _ = grating_scene(16, 16, coherence=1e3)
    integ = PLTIntegrator(max_depth=4, rr_depth=8)
    W = H = 16
    spp = 4
    for cfg in (RGB, RGB_POLARIZED):
        sampler = Sampler.create(0, W * H * spp)
        ray, _uv, wl, _ = sample_rays(scene, sampler, W, H, spp, cfg)
        fused = np.asarray(integ._sample_impl(scene, sampler, ray, wl, cfg))
        bounces, wl2 = integ.sample_phase(scene, sampler, ray, cfg)
        solved = np.asarray(
            integ.solve_phase(scene, sampler, bounces, wl2, cfg)
        )
        np.testing.assert_allclose(fused, solved, rtol=2e-4, atol=1e-5,
                                   err_msg=f"cfg={cfg.name}")


def test_polarized_wave_path_stokes():
    """Full Mueller transport through the PLT chain (VERDICT r4 item 2):
    the wave path's diffraction + conductor Fresnel produces genuinely
    polarized radiance — S1/S2 from the grating scene are nonzero where
    there is signal, DoLP <= 1, and S0 stays finite and positive."""
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.stokes import StokesIntegrator

    scene, _ = grating_scene(24, 24, coherence=1e3)
    integ = StokesIntegrator(inner=PLTIntegrator(max_depth=3, rr_depth=8))
    img = np.asarray(
        render(scene, integ.sample, seed=0, spp=32, cfg=RGB,
               n_out_channels=15)
    )
    assert not np.isnan(img).any()
    s0 = img[..., 3:6]
    s1 = img[..., 6:9]
    s2 = img[..., 9:12]
    assert s0.max() > 0.01
    # oblique conductor reflections through the grating polarize
    lp = np.sqrt(s1 ** 2 + s2 ** 2)
    sig = s0 > 0.05 * s0.max()
    assert float(lp[sig].max()) > 1e-4 * float(s0.max())
    dolp = np.sqrt((s1 ** 2 + s2 ** 2).sum(-1)) / np.maximum(
        s0.sum(-1), 1e-6
    )
    assert float(dolp[s0.sum(-1) > 1e-3].max()) <= 1.0 + 1e-3


def test_measure_beam_contract():
    """measure() decision record (VERDICT r3 item 9): the beam reaching
    the sensor is LIVE — propagation grows coherence opl by the covered
    distance (beam.h:167-171), the Stokes basis lands on the sensor's
    horizontal axis (stokes_fw convention), and the intensity measurement
    equals Li (every shipped sensor is an intensity detector)."""
    import jax.numpy as jnp
    import numpy as np

    from mitsuba3_plt_tpu.core import transform as tf
    from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator
    from mitsuba3_plt_tpu.librender.sensor import Sensor
    from mitsuba3_plt_tpu.plt.beam import PLTBeam

    n = 8
    direction = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    Le = jnp.ones((n, 3))
    beam = PLTBeam.source_area(
        pos=jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1)),
        direction=direction, area=jnp.full((n,), 1e-4),
        dist=jnp.full((n,), 5.0), Le=Le, max_beam_omega=1e-7,
    )
    integ = PLTIntegrator()
    sensor = Sensor.perspective(
        tf.look_at([0, 0, 0], [0, 0, 5], [0, 1, 0]), 45.0, 8, 8
    )
    sensor_p = jnp.zeros((n, 3))
    Li = jnp.full((n, 3), 0.7)

    out = integ.measure(beam, sensor_p, Li, sensor=sensor)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(Li))

    mb = integ.measured_beam(beam, sensor_p, sensor)
    # opl grew by the propagation distance (non-distant beam)
    d_opl = np.asarray(mb.coherence.opl - beam.coherence.opl)
    np.testing.assert_allclose(d_opl, 5.0, rtol=1e-5)
    # tangent ends on the sensor's horizontal axis projected across dir
    x_axis = np.asarray(sensor.to_world)[:3, 0]
    tn = np.asarray(mb.tangent)
    assert np.abs(tn @ x_axis).min() > 0.99
    # intensity (S0) is untouched by the collinear basis rotation
    np.testing.assert_allclose(
        np.asarray(mb.sp[:, 0]), np.asarray(beam.sp[:, 0]), rtol=1e-6
    )
