"""Silhouette (visibility) gradient tests: FD vs the boundary estimator.

Reference scheme: test_ad_integrators.py FD configs + the projective
machinery those tests exercise (ad/integrators/common.py:785-1298). A
translating emissive shape against black background has ~zero interior
gradient, so the boundary term must carry the whole FD derivative.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.integrators import make_integrator
from mitsuba3_plt_tpu.ad.projective import primary_boundary_grad
from mitsuba3_plt_tpu.ad.render import render_loss_grad


W = H = 48
WMAP = np.tile(
    (np.arange(W, dtype=np.float32) / W)[None, :, None], (H, 1, 3)
)


def _build(shape_type, delta):
    sdict = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 1},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": np.asarray(tf.look_at([0, 0, 4], [0, 0, 0],
                                              [0, 1, 0])),
            "film": {"type": "hdrfilm", "width": W, "height": H},
        },
        "obj": {
            "type": shape_type,
            "to_world": np.asarray(
                tf.translate([delta, 0, 0])
                @ np.diag([0.5, 0.5, 0.5, 1.0]).astype(np.float32)
            ),
            "emitter": {"type": "area", "radiance": [5.0, 5.0, 5.0]},
        },
    }
    return mi.load_dict(sdict)


def _loss(img):
    return jnp.sum(img * WMAP)


def _fd(shape_type, eps=0.05, spp=256):
    integ = make_integrator({"type": "path", "max_depth": 1})
    lp = _loss(mi.render(_build(shape_type, eps), integrator=integ,
                         spp=spp, seed=7))
    lm = _loss(mi.render(_build(shape_type, -eps), integrator=integ,
                         spp=spp, seed=7))
    return float(lp - lm) / (2 * eps)


@pytest.mark.parametrize("shape_type", ["rectangle", "cube"])
def test_boundary_grad_vs_fd(shape_type):
    integ = make_integrator({"type": "path", "max_depth": 1})
    scene, _ = _build(shape_type, 0.0)
    fd = _fd(shape_type)
    cots = primary_boundary_grad(
        scene, integ.sample, jnp.asarray(WMAP), key=3, n_samples=1 << 14,
        cfg=mi.config(),
    )
    g = sum(float(jnp.sum(c[:, 0])) for c in cots.values())
    assert abs(fd) > 100.0  # the silhouette term is the signal, not noise
    assert abs(g - fd) / abs(fd) < 0.12, (g, fd)


def test_render_loss_grad_geometry_boundary():
    """Full pipeline: interior(AD) + boundary through render_loss_grad."""
    integ = make_integrator({"type": "path", "max_depth": 1})
    scene, _ = _build("rectangle", 0.0)
    fd = _fd("rectangle")
    loss, grads = render_loss_grad(
        scene, integ.sample, _loss,
        ["geo.tri_p0", "geo.tri_p1", "geo.tri_p2"],
        seed=5, spp=64, cfg=mi.config(), geometry_boundary=True,
    )
    g = sum(float(jnp.sum(grads[k][:, 0])) for k in grads)
    assert abs(g - fd) / abs(fd) < 0.15, (g, fd)


def test_boundary_zero_without_silhouette_motion():
    """Translating parallel to the view axis barely moves the outline of a
    face-on rectangle -> near-zero x-gradient for y-translation weights."""
    integ = make_integrator({"type": "path", "max_depth": 1})
    scene, _ = _build("rectangle", 0.0)
    cots = primary_boundary_grad(
        scene, integ.sample, jnp.asarray(WMAP), key=3, n_samples=1 << 13,
        cfg=mi.config(),
    )
    # y-translation with x-ramp weights: the top edge sweeps in exactly what
    # the bottom edge sweeps out (same x-columns) -> zero net gradient
    gy = sum(float(jnp.sum(c[:, 1])) for c in cots.values())
    gx = sum(float(jnp.sum(c[:, 0])) for c in cots.values())
    assert abs(gy) < 0.1 * abs(gx), (gy, gx)


# ---------------------------------------------------------------------------
# NEE / shadow-silhouette boundary (round-4: nee_boundary_grad)
# ---------------------------------------------------------------------------

def _build_shadow(delta):
    """Point light + off-screen square blocker casting a shadow onto a
    diffuse floor; the camera's narrow cone sees only the floor, so the
    ONLY gradient w.r.t. blocker translation is the shadow-boundary term."""
    sdict = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 25,
            "to_world": np.asarray(tf.look_at([0, 2.5, 0.0], [0, 0, 0.001],
                                              [0, 0, 1])),
            "film": {"type": "hdrfilm", "width": W, "height": H},
        },
        "light": {"type": "point", "position": [-2.0, 3.0, 0.0],
                  "intensity": [30.0, 30.0, 30.0]},
        "floor": {
            "type": "rectangle",
            "to_world": np.asarray(
                (tf.rotate([1, 0, 0], -90)
                 @ np.diag([3.0, 3.0, 1.0, 1.0]).astype(np.float32))
            ),
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
        "blocker": {
            "type": "rectangle",
            "to_world": np.asarray(
                tf.translate([-0.75 + delta, 1.5, 0.0])
                @ tf.rotate([1, 0, 0], -90)
                @ np.diag([0.25, 0.25, 1.0, 1.0]).astype(np.float32)
            ),
            "bsdf": {"type": "diffuse", "reflectance": 0.0},
        },
    }
    return mi.load_dict(sdict)


def _fd_shadow(eps=0.04, spp=256):
    integ = make_integrator({"type": "path", "max_depth": 2})
    lp = _loss(mi.render(_build_shadow(eps), integrator=integ,
                         spp=spp, seed=7))
    lm = _loss(mi.render(_build_shadow(-eps), integrator=integ,
                         spp=spp, seed=7))
    return float(lp - lm) / (2 * eps)


def _build_shadow_area(delta, radiance=60.0):
    """Same blocker-over-floor geometry but lit by an AREA light, so the
    shadow boundary is a PENUMBRA: the screen-space radiance is smooth and
    only the (edge, emitter-point) pair estimator can recover the
    occluder-translation derivative."""
    sdict = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 25,
            "to_world": np.asarray(tf.look_at([0, 2.5, 0.0], [0, 0, 0.001],
                                              [0, 0, 1])),
            "film": {"type": "hdrfilm", "width": W, "height": H},
        },
        "floor": {
            "type": "rectangle",
            "to_world": np.asarray(
                (tf.rotate([1, 0, 0], -90)
                 @ np.diag([3.0, 3.0, 1.0, 1.0]).astype(np.float32))
            ),
            "bsdf": {"type": "diffuse", "reflectance": 0.8},
        },
        "blocker": {
            "type": "rectangle",
            "to_world": np.asarray(
                tf.translate([-0.75 + delta, 1.5, 0.0])
                @ tf.rotate([1, 0, 0], -90)
                @ np.diag([0.25, 0.25, 1.0, 1.0]).astype(np.float32)
            ),
            "bsdf": {"type": "diffuse", "reflectance": 0.0},
        },
        "light": {
            "type": "rectangle",
            "to_world": np.asarray(
                tf.translate([-2.0, 3.0, 0.0])
                @ tf.rotate([1, 0, 0], 90)   # normal -y: shines down
                @ np.diag([0.3, 0.3, 1.0, 1.0]).astype(np.float32)
            ),
            "emitter": {"type": "area",
                        "radiance": [radiance, radiance, radiance]},
        },
    }
    return mi.load_dict(sdict)


def test_area_penumbra_grad_vs_fd():
    """Occluder-translation FD under an AREA light vs the penumbra
    estimator (VERDICT r4 item 4; reference role: PSIntegrator + guiding,
    common.py:785-1298 / ad/guiding.py)."""
    from mitsuba3_plt_tpu.ad.projective import area_nee_boundary_grad

    integ = make_integrator({"type": "path", "max_depth": 2})
    scene, _ = _build_shadow_area(0.0)

    def fd(eps=0.05, spp=384):
        lp = _loss(mi.render(_build_shadow_area(eps), integrator=integ,
                             spp=spp, seed=7))
        lm = _loss(mi.render(_build_shadow_area(-eps), integrator=integ,
                             spp=spp, seed=7))
        return float(lp - lm) / (2 * eps)

    f = fd()
    cots = area_nee_boundary_grad(
        scene, jnp.asarray(WMAP), key=3, n_samples=1 << 15,
        cfg=mi.config(),
    )
    # blocker rows only (floor 0:2, blocker 2:4, light 4:6)
    g = sum(float(jnp.sum(c[2:4, 0])) for c in cots.values())
    assert abs(f) > 1.0, f
    assert abs(g - f) / abs(f) < 0.25, (g, f)


def test_area_penumbra_guiding_reduces_variance():
    """Guided edge sampling (reference ad/guiding.py role): pilot-mass
    proportional edge selection must cut the estimator's variance vs
    length-uniform sampling at equal budget, and stay unbiased."""
    from mitsuba3_plt_tpu.ad.projective import (
        area_nee_boundary_grad, area_nee_boundary_grad_guided,
    )

    scene, _ = _build_shadow_area(0.0)
    W_ = jnp.asarray(WMAP)

    def g_of(fn, key):
        cots = fn(scene, W_, key=key, n_samples=1 << 12, cfg=mi.config())
        return sum(float(jnp.sum(c[2:4, 0])) for c in cots.values())

    uni = np.array([g_of(area_nee_boundary_grad, 11 + 31 * k)
                    for k in range(8)])
    gui = np.array([g_of(area_nee_boundary_grad_guided, 11 + 31 * k)
                    for k in range(8)])
    # unbiasedness: same mean within noise
    se = np.sqrt(uni.var() / 8 + gui.var() / 8)
    assert abs(uni.mean() - gui.mean()) < 4 * se + 0.05 * abs(uni.mean()), (
        uni.mean(), gui.mean(), se,
    )
    # variance reduction
    assert gui.std() < 0.8 * uni.std(), (gui.std(), uni.std())


def test_nee_boundary_grad_vs_fd():
    """Occluder-translation FD vs the shadow-silhouette estimator
    (reference role: PSIntegrator indirect boundary, common.py:785-1298)."""
    from mitsuba3_plt_tpu.ad.projective import nee_boundary_grad

    integ = make_integrator({"type": "path", "max_depth": 2})
    scene, _ = _build_shadow(0.0)
    fd = _fd_shadow()
    cots = nee_boundary_grad(
        scene, integ.sample, jnp.asarray(WMAP), key=3, n_samples=1 << 14,
        cfg=mi.config(),
    )
    # blocker rows are the last 2 faces (floor first); restrict to them so
    # floor-edge noise cannot mask the signal
    g = 0.0
    for k, c in cots.items():
        g += float(jnp.sum(c[2:, 0]))
    assert abs(fd) > 1.0, fd  # the shadow sweep is a real signal
    assert abs(g - fd) / abs(fd) < 0.2, (g, fd)
