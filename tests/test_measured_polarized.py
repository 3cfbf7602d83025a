"""measured_polarized pBSDF (reference src/bsdfs/measured_polarized.cpp):
synthetic Mueller tensors, Rusinkiewicz parameterization, sampling
consistency, polarized render."""
import numpy as np
import jax.numpy as jnp

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.config import RGB, RGB_POLARIZED
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.core.rng import Sampler
from mitsuba3_plt_tpu.librender import measured_polarized as mp_mod

ALBEDO = 0.6


def make_lambert_tensor():
    """Depolarizing Lambertian pBSDF: M00 = albedo/pi everywhere."""
    nth, ntd, npd, nwl = 8, 8, 8, 4
    M = np.zeros((npd, ntd, nth, nwl, 4, 4), np.float32)
    M[..., 0, 0] = ALBEDO / np.pi
    return {
        "theta_h": np.linspace(0, np.pi / 2, nth, dtype=np.float32)[None],
        "theta_d": np.linspace(0, np.pi / 2, ntd, dtype=np.float32)[None],
        "phi_d": np.linspace(-np.pi, np.pi, npd, dtype=np.float32)[None],
        "wvls": np.linspace(400, 700, nwl).astype(np.float32),
        "M": M,
    }


DATA = make_lambert_tensor()
TAB = mp_mod.PolarizedMeasurement.from_tensors(DATA)


def test_unpolarized_eval_matches_lambert():
    n = 64
    rng = np.random.default_rng(0)
    wi = np.stack([rng.normal(size=n), rng.normal(size=n),
                   rng.uniform(0.2, 1, n)], -1)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = np.stack([rng.normal(size=n), rng.normal(size=n),
                   rng.uniform(0.2, 1, n)], -1)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(mp_mod.eval_pbsdf(
        TAB, jnp.asarray(wi, jnp.float32), jnp.asarray(wo, jnp.float32),
        True, RGB, None,
    ))
    expected = ALBEDO / np.pi * wo[:, 2]
    np.testing.assert_allclose(val[:, 0], expected, rtol=1e-3)


def test_sampling_white_furnace():
    """E[f / pdf] over the mixture sampler must equal the albedo."""
    n = 100000
    wi = jnp.tile(jnp.asarray([[0.2, 0.1, 0.97]], jnp.float32), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = Sampler.create(3, n)
    wo, pdf = mp_mod.sample_pbsdf(TAB, wi, smp.next_1d(0), smp.next_2d(1))
    f = np.asarray(mp_mod.eval_pbsdf(TAB, wi, wo, True, RGB, None))[:, 0]
    pdfn = np.asarray(pdf)
    ok = pdfn > 1e-8
    est = float(np.mean(np.where(ok, f / np.maximum(pdfn, 1e-9), 0.0)))
    np.testing.assert_allclose(est, ALBEDO, rtol=0.03)


def test_polarized_depolarizer_structure():
    """The depolarizing tensor must stay a pure-M00 Mueller matrix after
    all Stokes-basis rotations."""
    n = 8
    rng = np.random.default_rng(2)
    wi = np.stack([rng.normal(size=n), rng.normal(size=n),
                   rng.uniform(0.3, 1, n)], -1)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = np.stack([rng.normal(size=n), rng.normal(size=n),
                   rng.uniform(0.3, 1, n)], -1)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(mp_mod.eval_pbsdf(
        TAB, jnp.asarray(wi, jnp.float32), jnp.asarray(wo, jnp.float32),
        True, RGB_POLARIZED, None,
    ))  # [N, 4, 4, C]
    expected00 = ALBEDO / np.pi * wo[:, 2]
    np.testing.assert_allclose(val[:, 0, 0, 0], expected00, rtol=1e-3)
    off = np.abs(val).sum(axis=(1, 2, 3)) - np.abs(val[:, 0, 0]).sum(-1)
    assert np.all(off < 1e-4), off


def test_scene_render_smoke():
    scene, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "point", "position": [1, 2, 3],
                  "intensity": [20, 20, 20]},
        "plane": {
            "type": "rectangle",
            "bsdf": {"type": "measured_polarized", "data": DATA},
        },
    })
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    assert np.all(np.isfinite(img)) and img.max() > 0
    # the lit plane must match an equivalent diffuse render closely
    scene2, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "point", "position": [1, 2, 3],
                  "intensity": [20, 20, 20]},
        "plane": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse", "reflectance": ALBEDO},
        },
    })
    img2 = np.asarray(mi.render(scene2, spp=32, seed=0))
    np.testing.assert_allclose(img.mean(), img2.mean(), rtol=0.05)
