"""Analytic disk + cylinder primitives (reference src/shapes/disk.cpp,
src/shapes/cylinder.cpp): exact intersections, normals/uv, shadow tests."""
import numpy as np
import jax.numpy as jnp

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.librender.records import Ray


def _scene(shape):
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "point", "position": [0, 0, 3],
                  "intensity": [20, 20, 20]},
        "obj": shape,
    })[0]


def test_disk_analytic_intersection():
    scene = _scene({
        "type": "disk",
        "bsdf": {"type": "diffuse", "reflectance": 0.8},
    })
    assert scene.geo.n_disks == 1
    n = 4
    o = jnp.asarray([[0.3, 0.2, 2.0], [0.99, 0.0, 2.0],
                     [1.2, 0.0, 2.0], [0.0, 0.0, -2.0]], jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    d = jnp.where(jnp.asarray([[False], [False], [False], [True]]), -d, d)
    si = scene.ray_intersect(Ray.create(o, d))
    valid = np.asarray(si.valid)
    assert valid[0] and valid[1] and valid[3]
    assert not valid[2]  # outside radius 1
    np.testing.assert_allclose(np.asarray(si.t)[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(si.sh_n)[0]), [0, 0, 1], atol=1e-6
    )
    # uv: radial fraction in [0, 1]
    uv = np.asarray(si.uv)[0]
    np.testing.assert_allclose(uv[0], np.hypot(0.3, 0.2), rtol=1e-4)


def test_disk_render_matches_tessellated():
    """Analytic disk render must closely match a finely tessellated one."""
    img_a = np.asarray(mi.render(_scene({
        "type": "disk", "bsdf": {"type": "diffuse", "reflectance": 0.8},
    }), spp=64, seed=0))
    # force the tessellated path by attaching a null-radiance area emitter?
    # simpler: rectangle comparison is not equivalent; tessellate via mesh
    from mitsuba3_plt_tpu.scene import shape as shp

    disk_mesh = shp.make_disk()
    img_b = np.asarray(mi.render(_scene({
        "type": "mesh", "mesh": disk_mesh,
        "bsdf": {"type": "diffuse", "reflectance": 0.8},
    }), spp=64, seed=0))
    # identical geometry up to tessellation error at the rim
    diff = np.abs(img_a - img_b).mean()
    assert diff < 0.02, diff


def test_cylinder_analytic_intersection():
    scene = _scene({
        "type": "cylinder", "radius": 0.5,
        "p0": [0, -1, 0], "p1": [0, 1, 0],
        "bsdf": {"type": "diffuse", "reflectance": 0.8},
    })
    assert scene.geo.n_cylinders == 1
    o = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 1.5, 2.0],
                     [0.6, -2.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0],
                     [0.0, 1.0, 0.0]], jnp.float32)
    si = scene.ray_intersect(Ray.create(o, d))
    valid = np.asarray(si.valid)
    assert valid[0]
    assert not valid[1]  # above the cylinder extent
    assert not valid[2]  # passes outside the radius
    np.testing.assert_allclose(np.asarray(si.t)[0], 1.5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(si.sh_n)[0], [0, 0, 1], atol=1e-5
    )


def test_cylinder_inside_hit_and_shadow():
    scene = _scene({
        "type": "cylinder", "radius": 1.0,
        "p0": [0, 0, -1], "p1": [0, 0, 1],
        "bsdf": {"type": "diffuse", "reflectance": 0.8},
    })
    # ray starting inside exits through the far wall
    o = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    si = scene.ray_intersect(Ray.create(o, d))
    assert bool(si.valid[0])
    np.testing.assert_allclose(float(si.t[0]), 1.0, rtol=1e-5)
    # occlusion: shadow ray crossing the cylinder
    occ = scene.ray_test(Ray(
        o=jnp.asarray([[-2.0, 0.0, 0.0]], jnp.float32),
        d=jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        maxt=jnp.asarray([4.0], jnp.float32),
    ))
    assert bool(occ[0])
    # unobstructed ray parallel above
    occ2 = scene.ray_test(Ray(
        o=jnp.asarray([[-2.0, 0.0, 2.0]], jnp.float32),
        d=jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        maxt=jnp.asarray([4.0], jnp.float32),
    ))
    assert not bool(occ2[0])


def test_cylinder_render_smoke():
    img = np.asarray(mi.render(_scene({
        "type": "cylinder", "radius": 0.6,
        "p0": [0, -1, 0], "p1": [0, 1, 0],
        "bsdf": {"type": "roughconductor", "material": "cu", "alpha": 0.2},
    }), spp=32, seed=0))
    assert np.all(np.isfinite(img)) and img.max() > 0
