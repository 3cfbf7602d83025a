"""SDF-grid shape (reference src/shapes/sdfgrid.cpp): sphere-traced grid,
compared against the analytic sphere it samples; .vol IO roundtrip."""
import os

import numpy as np
import jax.numpy as jnp

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.librender.records import Ray
from mitsuba3_plt_tpu.scene.sdf import sphere_sdf_grid


def _scene(extra=None):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0.5, 0.5, 3.0], [0.5, 0.5, 0.5],
                                   [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "sdf": {
            "type": "sdfgrid",
            "grid": sphere_sdf_grid(res=48, radius=0.35),
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
    }
    if extra:
        d.update(extra)
    return mi.load_dict(d)[0]


def test_vol_roundtrip(tmp_path):
    from mitsuba3_plt_tpu.utils.io import read_vol, write_vol

    g = sphere_sdf_grid(res=16)
    path = os.path.join(tmp_path, "s.vol")
    write_vol(path, g)
    back, lo, hi = read_vol(path)
    np.testing.assert_allclose(back[..., 0], g, rtol=1e-6)


def test_sdf_intersection_matches_analytic_sphere():
    scene = _scene()
    assert len(scene.sdfs) == 1
    n = 3
    o = jnp.asarray([[0.5, 0.5, 2.0], [0.5 + 0.2, 0.5, 2.0],
                     [0.5 + 0.5, 0.5, 2.0]], jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    si = scene.ray_intersect(Ray.create(o, d))
    valid = np.asarray(si.valid)
    assert valid[0] and valid[1]
    assert not valid[2]  # misses the radius-0.35 sphere
    # central hit: t = 2 - (0.5 + 0.35) = 1.15
    np.testing.assert_allclose(float(si.t[0]), 1.15, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(si.sh_n)[0], [0, 0, 1], atol=0.03
    )
    # occlusion
    occ = scene.ray_test(Ray(
        o=jnp.asarray([[0.5, 0.5, 2.0]], jnp.float32),
        d=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
        maxt=jnp.asarray([4.0], jnp.float32),
    ))
    assert bool(occ[0])


def test_sdf_render_smoke():
    img = np.asarray(mi.render(_scene(), spp=16, seed=0))
    assert np.all(np.isfinite(img)) and img.mean() > 0.1
