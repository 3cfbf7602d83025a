"""Analytic spheres: exact intersection vs fine tessellation, occlusion,
and sphere-emitter sampling consistency against a tessellated area light
(reference src/shapes/sphere.cpp:240-330 + sample_direction)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.librender.records import Ray
from mitsuba3_plt_tpu.scene.loader import (
    LoadedBSDF, assemble_scene, default_bsdf,
)
from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.core import transform as tf


def sphere_scene(analytic=True, emitter=False, subdiv=4):
    """Floor + sphere at (0, 1, 0) r=0.4, seen from +z; optionally emissive."""
    meshes, mats, ems = [], [], []
    bsdfs = [default_bsdf()]
    floor = shp.make_rectangle().transformed(
        (tf.translate([0, 0, 0]) @ tf.rotate([1, 0, 0], -90)
         @ tf.scale([4, 4, 1])).astype(np.float32)
    )
    meshes.append(floor)
    mats.append(0)
    ems.append(-1)

    emitters = []
    spheres = None
    center, radius = np.array([0.0, 1.0, 0.0], np.float32), 0.4
    if emitter:
        emitters.append({
            "type": "sphere_area" if analytic else "area",
            "center": center, "radius": radius,
            "mesh_index": 1, "radiance": (8.0, 8.0, 8.0),
        })
    if analytic:
        spheres = [{
            "center": center, "radius": radius, "mat": 0,
            "emitter": 0 if emitter else -1, "shape": 10000,
        }]
    else:
        sph = shp.make_sphere(subdiv=subdiv).transformed(
            (tf.translate(center) @ tf.scale(radius)).astype(np.float32)
        )
        meshes.append(sph)
        mats.append(0)
        ems.append(0 if emitter else -1)

    from mitsuba3_plt_tpu.librender.sensor import Sensor

    sensor = Sensor.perspective(
        tf.look_at([0, 1.0, 4.0], [0, 1.0, 0], [0, 1, 0]), 40.0, 24, 24
    )
    scene, meta = assemble_scene(
        meshes, mats, ems, bsdfs, emitters, sensor,
        {"type": "path", "max_depth": 3}, 16, rfilter="box",
        spheres=spheres,
    )
    return scene, meta


def test_analytic_hit_matches_fine_tessellation():
    sc_a, _ = sphere_scene(analytic=True)
    sc_t, _ = sphere_scene(analytic=False, subdiv=5)
    n = 256
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0.0, 1.0, 4.0]], np.float32), (n, 1))
    tgt = rng.uniform(-0.35, 0.35, (n, 3)).astype(np.float32)
    tgt[:, 1] += 1.0
    tgt[:, 2] = 0.0
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray.create(jnp.asarray(o), jnp.asarray(d))
    si_a = sc_a.ray_intersect(ray)
    si_t = sc_t.ray_intersect(ray)
    va, vt = np.asarray(si_a.valid), np.asarray(si_t.valid)
    assert va.mean() > 0.9
    both = va & vt
    ta, tt = np.asarray(si_a.t)[both], np.asarray(si_t.t)[both]
    # subdiv-5 icosphere is within ~0.1% of the true sphere
    assert np.abs(ta - tt).max() < 5e-3, np.abs(ta - tt).max()
    # exact unit normals aligned with (p - c)
    pa = np.asarray(si_a.p)[both]
    na = np.asarray(si_a.sh_n)[both]
    expect = pa - np.array([0, 1, 0.0])
    expect /= np.linalg.norm(expect, axis=-1, keepdims=True)
    assert np.abs(na - expect).max() < 1e-5


def test_sphere_occludes_shadow_rays():
    sc_a, _ = sphere_scene(analytic=True)
    n = 64
    o = np.tile(np.array([[0.0, 1.0, 2.0]], np.float32), (n, 1))
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    occ = np.asarray(sc_a.ray_test(
        Ray(o=jnp.asarray(o), d=jnp.asarray(d), maxt=jnp.full((n,), 10.0))
    ))
    assert occ.all()
    # rays that miss the sphere are not occluded (floor is at y=0, parallel)
    d2 = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    occ2 = np.asarray(sc_a.ray_test(
        Ray(o=jnp.asarray(o), d=jnp.asarray(d2), maxt=jnp.full((n,), 10.0))
    ))
    assert not occ2.any()


def test_sphere_emitter_matches_mesh_emitter():
    """NEE + MIS with the analytic sphere light must agree with a finely
    tessellated mesh area light (same radiance, same geometry)."""
    sc_a, meta = sphere_scene(analytic=True, emitter=True)
    sc_t, _ = sphere_scene(analytic=False, emitter=True, subdiv=5)
    img_a = np.asarray(mi.render((sc_a, meta), spp=256))
    img_t = np.asarray(mi.render((sc_t, meta), spp=256))
    assert np.isfinite(img_a).all() and np.isfinite(img_t).all()
    ma, mt = img_a.mean(), img_t.mean()
    assert abs(ma - mt) < 0.05 * max(ma, mt), (ma, mt)
