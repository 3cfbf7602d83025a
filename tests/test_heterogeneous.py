"""Heterogeneous media: grid density lookup, ratio-tracking transmittance,
delta-tracking free flight, and a volumetric render (reference
src/media/heterogeneous.cpp, src/volumes/grid.cpp)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.core.rng import Sampler
from mitsuba3_plt_tpu.scene.media import Medium, TRACK_STEPS


def const_medium(value=1.0, res=8, sigma=1.0):
    return Medium.create_heterogeneous(
        np.full((res, res, res), value, np.float32),
        box_min=(-1, -1, -1), box_max=(1, 1, 1),
        sigma_t=(sigma,) * 3, albedo=(0.8,) * 3,
    )


def test_density_trilinear():
    d = np.zeros((4, 4, 4), np.float32)
    d[:, :, 2:] = 1.0  # step in x
    med = Medium.create_heterogeneous(d)
    p = jnp.asarray([
        [-0.9, 0.0, 0.0],   # left  -> 0
        [0.9, 0.0, 0.0],    # right -> 1
        [0.0, 0.0, 0.0],    # center of the ramp -> 0.5
        [0.0, 0.0, 1.5],    # outside -> 0
    ], jnp.float32)
    v = np.asarray(med.density_at(p))
    assert v[0] == pytest.approx(0.0, abs=1e-6)
    assert v[1] == pytest.approx(1.0, abs=1e-6)
    assert 0.2 < v[2] < 0.8
    assert v[3] == 0.0


def test_ratio_tracking_matches_analytic():
    """Constant grid: ratio tracking must estimate exp(-sigma * L)."""
    sigma = 1.3
    med = const_medium(1.0, sigma=sigma)
    n = 20000
    sampler = Sampler.create(7, n)
    o = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    dist = jnp.full((n,), 2.0)
    tr = np.asarray(med.transmittance_ratio(o, d, dist, sampler, 0))
    expect = np.exp(-sigma * 2.0)
    assert abs(tr.mean() - expect) < 0.01, (tr.mean(), expect)


def test_delta_tracking_matches_analytic():
    """Constant grid: collision probability before t_max = 1 - exp(-s t)."""
    sigma = 0.9
    med = const_medium(1.0, sigma=sigma)
    n = 20000
    sampler = Sampler.create(3, n)
    o = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    t_max = jnp.full((n,), 2.0)
    t, real = med.sample_distance_delta(o, d, t_max, sampler, 0)
    t, real = np.asarray(t), np.asarray(real)
    p_col = real.mean()
    expect = 1.0 - np.exp(-sigma * 2.0)
    assert abs(p_col - expect) < 0.02, (p_col, expect)
    # collision distances follow the truncated exponential
    ts = t[real]
    expect_mean = (1.0 / sigma) - 2.0 * np.exp(-sigma * 2.0) / expect
    assert abs(ts.mean() - expect_mean) < 0.05, (ts.mean(), expect_mean)


def test_heterogeneous_volpath_render():
    """A dense blob in front of the Cornell light darkens the image vs an
    empty grid; renders stay finite."""
    import dataclasses

    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.volpath import VolPathIntegrator
    from mitsuba3_plt_tpu.integrators.common import render
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(24, 24)
    z = np.linspace(-1, 1, 8)
    zz, yy, xx = np.meshgrid(z, z, z, indexing="ij")
    blob = np.exp(-4.0 * (xx**2 + yy**2 + zz**2)).astype(np.float32)

    def run(density_scale):
        med = Medium.create_heterogeneous(
            blob * density_scale, box_min=(-1, -1, -1), box_max=(1, 1, 1),
            sigma_t=(2.0,) * 3, albedo=(0.5,) * 3,
        )
        sc = dataclasses.replace(scene, medium=med)
        integ = VolPathIntegrator(max_depth=4, rr_depth=8)
        img = np.asarray(render(sc, integ.sample, spp=16, cfg=RGB))
        return img

    img_thin = run(1e-5)
    img_dense = run(1.0)
    assert np.isfinite(img_thin).all() and np.isfinite(img_dense).all()
    assert img_dense.mean() < img_thin.mean() * 0.95
