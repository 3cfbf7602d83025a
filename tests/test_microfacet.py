import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.librender import microfacet as mf


@pytest.mark.parametrize("mtype", [mf.GGX, mf.BECKMANN])
@pytest.mark.parametrize("alpha", [0.1, 0.5])
def test_ndf_integrates_projected(mtype, alpha, rng):
    # \int D(m) cos(theta_m) dm = 1
    n = 400_000
    u = rng.random(size=(n, 2)).astype(np.float32)
    # uniform hemisphere sampling
    z = u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    dens = mf.ndf_eval(jnp.asarray(d), alpha, alpha, mtype)
    integral = float(jnp.mean(dens * d[:, 2])) * 2 * np.pi
    assert abs(integral - 1.0) < 0.03


def test_vndf_sample_pdf_consistency(rng):
    # Sampled normals should have pdf > 0 and MC-integrate to 1 over the
    # hemisphere: \int pdf dm = 1 for fixed wi.
    alpha = 0.3
    wi = jnp.asarray([0.4, -0.2, np.sqrt(1 - 0.2)], jnp.float32)
    wi = wi / jnp.linalg.norm(wi)
    n = 200_000
    u = rng.random(size=(n, 2)).astype(np.float32)
    z = u[:, 0]
    r = np.sqrt(np.maximum(0, 1 - z * z))
    phi = 2 * np.pi * u[:, 1]
    d = np.stack([r * np.cos(phi), r * np.sin(phi), z], -1).astype(np.float32)
    wi_b = jnp.broadcast_to(wi, (n, 3))
    pdf = mf.pdf_vndf(wi_b, jnp.asarray(d), alpha, alpha, mf.GGX)
    integral = float(jnp.mean(pdf)) * 2 * np.pi
    assert abs(integral - 1.0) < 0.03

    # samples come from the same density: E[f/pdf] test with f = pdf
    u2 = jnp.asarray(rng.random(size=(n, 2)), jnp.float32)
    mvec, spdf = mf.sample_vndf_ggx(wi_b, u2, alpha, alpha)
    check = mf.pdf_vndf(wi_b, mvec, alpha, alpha, mf.GGX)
    assert np.allclose(np.asarray(spdf), np.asarray(check), rtol=2e-3, atol=1e-4)
    # mean cos of sampled normals should be biased toward wi side
    assert float(jnp.mean(mvec[:, 2])) > 0.8


def test_smith_g1_range(rng):
    d = rng.normal(size=(1000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] = np.abs(d[:, 2])
    mu = np.zeros_like(d)
    mu[:, 2] = 1.0
    for mtype in [mf.GGX, mf.BECKMANN]:
        g = np.asarray(mf.smith_g1(jnp.asarray(d), jnp.asarray(mu), 0.2, 0.2, mtype))
        assert (g >= 0).all() and (g <= 1.0 + 1e-5).all()
