"""SGGX / tabulated / blend phase functions (reference src/phase/
{sggx,tabphase,blendphase}.cpp): normalization, sample/eval consistency,
microflake anisotropy."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.scene import media as med
from mitsuba3_plt_tpu.scene.media import (
    Medium, PHASE_SGGX, PHASE_TAB, PHASE_BLEND, PHASE_HG, PHASE_RAYLEIGH,
    PHASE_ISOTROPIC,
)
from mitsuba3_plt_tpu.core.rng import Sampler


def _sphere_quad(n_theta=256, n_phi=256):
    """Quadrature grid over the sphere: (dirs [M, 3], weights [M])."""
    th = (np.arange(n_theta) + 0.5) / n_theta * np.pi
    ph = (np.arange(n_phi) + 0.5) / n_phi * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3)
    w = (np.sin(T) * (np.pi / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return d.astype(np.float32), w.astype(np.float32)


DIRS, QW = _sphere_quad()


def _check_normalized(medium, wi, tol=0.01):
    wi_arr = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), DIRS.shape)
    vals = np.asarray(med.phase_eval_dir(medium, wi_arr, jnp.asarray(DIRS)))
    integral = float((vals * QW).sum())
    assert abs(integral - 1.0) < tol, integral
    return integral


def test_sggx_normalization_and_anisotropy():
    # fiber-like S: small Szz -> flakes aligned with z -> strong anisotropy
    S6 = [1.0, 1.0, 0.05, 0.0, 0.0, 0.0]
    medium = Medium.create(phase_type=PHASE_SGGX, sggx_S=S6)
    wi = np.array([0.0, 0.0, 1.0])
    _check_normalized(medium, wi, tol=0.02)
    wi2 = np.array([1.0, 0.0, 0.0])
    _check_normalized(medium, wi2, tol=0.02)
    # projected area: sigma(z) = sqrt(Szz), sigma(x) = sqrt(Sxx)
    sz = float(med.sggx_projected_area(jnp.asarray([[0.0, 0, 1]]), medium.sggx_S)[0])
    sx = float(med.sggx_projected_area(jnp.asarray([[1.0, 0, 0]]), medium.sggx_S)[0])
    np.testing.assert_allclose(sz, np.sqrt(0.05), rtol=1e-5)
    np.testing.assert_allclose(sx, 1.0, rtol=1e-5)


def test_sggx_sample_matches_eval():
    """Monte-Carlo histogram of sampled directions vs the closed-form
    phase pdf (specular SGGX: p(wo) = D(h)/(4 sigma(wi)))."""
    S6 = [1.0, 0.3, 0.6, 0.1, 0.0, 0.0]
    medium = Medium.create(phase_type=PHASE_SGGX, sggx_S=S6)
    n = 200000
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, 0.2, 0.933], jnp.float32), (n, 3)
    )
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = Sampler.create(7, n)
    wo, pdf = med.phase_sample(medium, wi, smp.next_2d(0))
    wo = np.asarray(wo)
    # bin by cos(theta) against z and phi; compare against pdf quadrature
    nb = 12
    iz = np.clip(((wo[:, 2] + 1) * 0.5 * nb).astype(int), 0, nb - 1)
    ip = np.clip(
        ((np.arctan2(wo[:, 1], wo[:, 0]) / (2 * np.pi) + 0.5) * nb).astype(int),
        0, nb - 1,
    )
    hist = np.zeros((nb, nb))
    np.add.at(hist, (iz, ip), 1.0 / n)
    # expected mass per bin from the quadrature grid
    vals = np.asarray(
        med.phase_eval_dir(
            medium, jnp.broadcast_to(wi[0], DIRS.shape), jnp.asarray(DIRS)
        )
    )
    izq = np.clip(((DIRS[:, 2] + 1) * 0.5 * nb).astype(int), 0, nb - 1)
    ipq = np.clip(
        ((np.arctan2(DIRS[:, 1], DIRS[:, 0]) / (2 * np.pi) + 0.5) * nb).astype(int),
        0, nb - 1,
    )
    exp_hist = np.zeros((nb, nb))
    np.add.at(exp_hist, (izq, ipq), vals * QW)
    mask = exp_hist > 2e-3
    rel = np.abs(hist[mask] - exp_hist[mask]) / exp_hist[mask]
    assert np.median(rel) < 0.05, np.median(rel)


def test_tabphase_normalization_and_hg_match():
    """A tabulated HG phase must reproduce analytic HG values."""
    g = 0.4
    cos_grid = np.linspace(-1, 1, 128)
    # physics convention: table over cos(theta') = -cos(theta)
    hg_vals = np.asarray(med.hg_eval(g, jnp.asarray(-cos_grid)))
    medium = Medium.create(phase_type=PHASE_TAB, tab_values=hg_vals)
    wi = np.array([0.0, 0.0, 1.0])
    _check_normalized(medium, wi, tol=0.01)
    for ct in [-0.9, -0.3, 0.2, 0.8]:
        got = float(med.tab_eval(medium, jnp.asarray([ct]))[0])
        want = float(med.hg_eval(g, jnp.asarray([ct]))[0])
        np.testing.assert_allclose(got, want, rtol=0.02)


def test_tabphase_sampling_matches_distribution():
    g = 0.5
    cos_grid = np.linspace(-1, 1, 128)
    hg_vals = np.asarray(med.hg_eval(g, jnp.asarray(-cos_grid)))
    medium = Medium.create(phase_type=PHASE_TAB, tab_values=hg_vals)
    n = 100000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    smp = Sampler.create(3, n)
    wo, pdf = med.phase_sample(medium, wi, smp.next_2d(0))
    # propagation direction is -wi = -z; forward scattering (g>0) means
    # cos(theta against propagation) concentrated near +1 -> wo.z near -1
    cos_prop = -np.asarray(wo)[:, 2]
    assert cos_prop.mean() > 0.4  # strongly forward
    # estimator check: E[1/(4 pi pdf)] == 1 for a normalized phase
    est = float(np.mean(1.0 / (4.0 * np.pi * np.asarray(pdf))))
    np.testing.assert_allclose(est * 4 * np.pi / (4 * np.pi), 1.0, rtol=0.05)


def test_blendphase_mixture():
    medium = Medium.create(
        phase_type=PHASE_BLEND, g=0.7, phase2_type=PHASE_ISOTROPIC,
        blend_weight=0.5,
    )
    wi = np.array([0.0, 0.0, 1.0])
    _check_normalized(medium, wi, tol=0.01)
    # value = 0.5 hg + 0.5 iso
    ct = jnp.asarray([0.9])
    wi_l = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, np.sqrt(1 - 0.81), -0.9]])  # cos vs prop = 0.9
    got = float(med.phase_eval_dir(medium, wi_l, wo)[0])
    want = 0.5 * float(med.hg_eval(0.7, ct)[0]) + 0.5 / (4 * np.pi)
    np.testing.assert_allclose(got, want, rtol=1e-3)
    # sampling stays normalized-consistent
    n = 50000
    smp = Sampler.create(11, n)
    wi_b = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    wo_s, pdf_s = med.phase_sample(medium, wi_b, smp.next_2d(0))
    est = float(np.mean(1.0 / np.maximum(np.asarray(pdf_s), 1e-9))) / (4 * np.pi)
    np.testing.assert_allclose(est, 1.0, rtol=0.08)
