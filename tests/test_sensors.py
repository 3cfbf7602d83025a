"""Sensor probes: radiancemeter / irradiancemeter oracles (reference
src/sensors/{radiancemeter,irradiancemeter,distant}.cpp)."""
import dataclasses as dc

import numpy as np

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.librender.sensor import Sensor
from mitsuba3_plt_tpu.scene.presets import furnace_scene


def test_radiancemeter_reads_convex_furnace():
    scene, _ = furnace_scene(8, 8, albedo=0.6)
    rm = Sensor.radiancemeter(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]))
    scene = dc.replace(scene, sensor=rm)
    img = np.asarray(
        render(scene, PathIntegrator(max_depth=5, rr_depth=9).sample,
               seed=0, spp=256, cfg=RGB)
    )
    assert img.shape == (1, 1, 3)
    assert abs(float(img.mean()) - 0.6) < 0.02


def test_irradiancemeter_unit_env():
    scene, _ = furnace_scene(8, 8, albedo=0.6)
    im = Sensor.irradiancemeter(tf.look_at([0, 3, 0], [0, 4, 0], [1, 0, 0]))
    scene = dc.replace(scene, sensor=im)
    img = np.asarray(
        render(scene, PathIntegrator(max_depth=2, rr_depth=9).sample,
               seed=0, spp=256, cfg=RGB)
    )
    # cosine-weighted mean radiance of a unit environment = 1
    assert abs(float(img.mean()) - 1.0) < 0.02
