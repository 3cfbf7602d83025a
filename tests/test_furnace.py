"""Furnace energy-conservation oracle: a CONVEX diffuse body in a constant
environment of radiance E has exitant radiance exactly albedo * E (the
cosine-weighted environment integral; reflected rays escape a convex body,
so higher-order terms vanish) — an analytic closed form the whole
loader/intersection/NEE/MIS/env pipeline must reproduce."""
import numpy as np

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.scene.presets import furnace_scene


def test_diffuse_convex_furnace():
    albedo = 0.6
    scene, _ = furnace_scene(24, 24, albedo=albedo, radiance=1.0)
    img = np.asarray(
        render(scene, PathIntegrator(max_depth=6, rr_depth=20).sample,
               seed=0, spp=96, cfg=RGB)
    )
    center = img[8:16, 8:16].mean()  # sphere interior pixels
    assert abs(center - albedo) / albedo < 0.03, (center, albedo)
    # background pixels see the environment directly
    corner = img[:3, :3].mean()
    assert abs(corner - 1.0) < 0.02, corner
