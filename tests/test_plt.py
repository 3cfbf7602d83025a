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
