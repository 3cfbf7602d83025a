"""Hair BSDF (reference src/bsdfs/hair.cpp, Chiang 2016 model):
energy conservation of the white-hair limit, sample/pdf consistency,
azimuthal/longitudinal behavior, fiber-scene render."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.librender import hair as hair_mod
from mitsuba3_plt_tpu.core.rng import Sampler


def _params(n, beta_m=0.3, beta_n=0.3, alpha=0.0, sigma_a=0.0, eta=1.55):
    return {
        "pr_params": jnp.tile(
            jnp.asarray(
                [[beta_m, beta_n, alpha, 0.0, 0.0, 1.0, 0.0, 0.0]],
                jnp.float32,
            ),
            (n, 1),
        ),
        "base_color": jnp.full((n, 3), sigma_a, jnp.float32),
        "eta_re": jnp.full((n, 3), eta, jnp.float32),
    }


def _sphere_quad(n_theta=128, n_phi=128):
    th = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    ph = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack(
        [np.cos(T), np.sin(T) * np.sin(P), np.sin(T) * np.cos(P)], -1
    ).reshape(-1, 3)  # x = fiber axis
    w = (np.sin(T) * (np.pi / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return d.astype(np.float32), w.astype(np.float32)


DIRS, QW = _sphere_quad()


def test_white_hair_conserves_energy():
    """sigma_a = 0: the fiber absorbs nothing, so integrating
    f(wi, wo) cos / cos over the sphere must give ~1 (PBRT's WhiteFurnace
    test; tolerance loosened for the p=3 residual approximation)."""
    M = DIRS.shape[0]
    for beta in [0.3, 0.6]:
        p = _params(M, beta_m=beta, beta_n=beta, sigma_a=0.0)
        wi = jnp.tile(
            jnp.asarray([[0.2, 0.3, 0.933]], jnp.float32), (M, 1)
        )
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        vals = np.asarray(
            hair_mod.hair_eval(p, wi, jnp.asarray(DIRS), RGB, None)
        )[..., 0]
        # eval contains 1/|cos_theta(wi)|... and represents f*cos_o; the
        # energy integral is sum f cos dw = sum vals * qw
        total = float((vals * QW).sum())
        assert 0.85 < total < 1.1, (beta, total)


def test_dark_hair_absorbs():
    M = DIRS.shape[0]
    p = _params(M, sigma_a=2.0)
    wi = jnp.tile(jnp.asarray([[0.2, 0.3, 0.933]], jnp.float32), (M, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    vals = np.asarray(
        hair_mod.hair_eval(p, wi, jnp.asarray(DIRS), RGB, None)
    )[..., 0]
    total = float((vals * QW).sum())
    assert total < 0.6, total  # strong absorption kills TT/TRT


def test_sample_pdf_consistency():
    """Monte-Carlo: E[f/pdf] over sampled directions equals the quadrature
    integral of f (both ~1 for white hair)."""
    n = 200000
    p = _params(n, sigma_a=0.0)
    wi = jnp.tile(jnp.asarray([[0.3, -0.2, 0.93]], jnp.float32), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = Sampler.create(9, n)
    u1 = smp.next_1d(0)
    u2 = smp.next_2d(1)
    wo, pdf = hair_mod.hair_sample(p, wi, u1, u2, RGB, None)
    f = np.asarray(hair_mod.hair_eval(p, wi, wo, RGB, None))[..., 0]
    pdf = np.asarray(pdf)
    ok = pdf > 1e-8
    est = float(np.mean(np.where(ok, f / np.maximum(pdf, 1e-9), 0.0)))
    assert 0.85 < est < 1.1, est


def test_pdf_normalized():
    """The sampling pdf itself must integrate to ~1 over the sphere."""
    M = DIRS.shape[0]
    p = _params(M)
    wi = jnp.tile(jnp.asarray([[0.1, 0.2, 0.97]], jnp.float32), (M, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    pdf = np.asarray(hair_mod.hair_pdf(p, wi, jnp.asarray(DIRS), RGB))
    total = float((pdf * QW).sum())
    assert 0.9 < total < 1.1, total


def test_hair_scene_render(tmp_path):
    import os
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.core import transform as tf

    curve = "\n".join(
        f"{x:.3f} 0.0 0.0 0.08" for x in np.linspace(-1, 1, 6)
    ) + "\n"
    path = os.path.join(tmp_path, "fiber.txt")
    with open(path, "w") as f:
        f.write(curve)
    scene, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "fiber": {
            "type": "bsplinecurve", "filename": path,
            "bsdf": {"type": "hair", "eumelanin": 0.3},
        },
    })
    img = np.asarray(mi.render(scene, spp=16, seed=0))
    assert np.all(np.isfinite(img)) and img.mean() > 0.05
