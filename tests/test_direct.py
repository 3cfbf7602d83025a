"""Dedicated direct-illumination estimator (reference direct.cpp).

Consistency: on a direct-lighting-only scene (max_depth=2 path), the
direct estimator and the path tracer estimate the same integral; higher
sample counts reduce variance without shifting the mean.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators import make_integrator
from mitsuba3_plt_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def cbox():
    return cornell_box(24, 24)[0]


def test_direct_matches_depth2_path(cbox):
    d = make_integrator({"type": "direct"})
    p = make_integrator({"type": "path", "max_depth": 2})
    img_d = np.asarray(mi.render(cbox, integrator=d, spp=128, cfg=RGB, seed=5))
    img_p = np.asarray(mi.render(cbox, integrator=p, spp=128, cfg=RGB, seed=9))
    assert not np.isnan(img_d).any()
    # same integral (different estimators/streams): tight mean agreement
    assert abs(img_d.mean() - img_p.mean()) / img_p.mean() < 0.05
    # pixel-level agreement within MC noise
    diff = np.abs(img_d - img_p).mean()
    assert diff < 0.15 * img_p.mean() + 0.05


def test_direct_multi_sample_counts(cbox):
    d1 = make_integrator({"type": "direct", "shading_samples": 1})
    d4 = make_integrator(
        {"type": "direct", "emitter_samples": 4, "bsdf_samples": 4}
    )
    a = np.asarray(mi.render(cbox, integrator=d1, spp=64, cfg=RGB, seed=1))
    b = np.asarray(mi.render(cbox, integrator=d4, spp=64, cfg=RGB, seed=1))
    assert abs(a.mean() - b.mean()) / a.mean() < 0.05
    # more shading samples -> lower pixel variance against a reference
    ref = np.asarray(
        mi.render(cbox, integrator=d4, spp=512, cfg=RGB, seed=123)
    )
    v1 = np.mean((a - ref) ** 2)
    v4 = np.mean((b - ref) ** 2)
    assert v4 < v1
