import numpy as np
import jax.numpy as jnp
import pytest
from scipy import special

from mitsuba3_plt_tpu.core import math as m
from mitsuba3_plt_tpu.core import frame as fr
from mitsuba3_plt_tpu.core import warp
from mitsuba3_plt_tpu.core import rng as rng_mod
from mitsuba3_plt_tpu.core import distr


def test_bessel_j_vs_scipy():
    x = np.linspace(-80.0, 80.0, 321).astype(np.float32)
    for nu in [-3, -1, 0, 1, 2, 4, 8]:
        ours = np.asarray(m.bessel_j(x, nu))
        ref = special.jv(nu, x)
        assert np.max(np.abs(ours - ref)) < 2e-3, f"nu={nu}"


def test_simpson():
    val = m.integrate_simpson(lambda t: jnp.sin(t), 0.0, np.pi, 20)
    assert abs(float(val) - 2.0) < 1e-5


def test_coordinate_system_orthonormal(rng):
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    s, t = fr.coordinate_system(jnp.asarray(n))
    s, t = np.asarray(s), np.asarray(t)
    assert np.abs((s * n).sum(-1)).max() < 1e-5
    assert np.abs((t * n).sum(-1)).max() < 1e-5
    assert np.abs((s * t).sum(-1)).max() < 1e-5
    assert np.abs(np.linalg.norm(s, axis=-1) - 1).max() < 1e-5
    # right-handedness: s x t == n
    assert np.abs(np.cross(s, t) - n).max() < 1e-5


def test_unit_angle(rng):
    a = rng.normal(size=(128, 3))
    b = rng.normal(size=(128, 3))
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    ours = np.asarray(m.unit_angle(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    ref = np.arccos(np.clip((a * b).sum(-1), -1, 1))
    assert np.abs(ours - ref).max() < 1e-3


@pytest.mark.parametrize(
    "warp_fn,pdf_fn",
    [
        (warp.square_to_cosine_hemisphere, warp.square_to_cosine_hemisphere_pdf),
        (warp.square_to_uniform_sphere, warp.square_to_uniform_sphere_pdf),
        (warp.square_to_uniform_hemisphere, warp.square_to_uniform_hemisphere_pdf),
    ],
)
def test_warp_pdf_integrates_to_one(warp_fn, pdf_fn, rng):
    # MC check: E[1/pdf] over samples == domain measure is implied by
    # histogram comparison; here check pdf integral over the sphere via
    # uniform directions.
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pdf = np.asarray(pdf_fn(jnp.asarray(d, jnp.float32)))
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_warp_sample_pdf_consistency(rng):
    # chi2-lite: histogram of samples matches pdf-weighted measure
    u = rng.random(size=(400_000, 2)).astype(np.float32)
    v = np.asarray(warp.square_to_cosine_hemisphere(jnp.asarray(u)))
    cos_mean = v[..., 2].mean()
    assert abs(cos_mean - 2.0 / 3.0) < 5e-3  # E[cos] under cos/pi on hemisphere


def test_rng_uniform_stats():
    s = rng_mod.Sampler.create(42, 1 << 16)
    x = np.asarray(s.next_1d(3))
    assert 0.0 <= x.min() and x.max() < 1.0
    assert abs(x.mean() - 0.5) < 5e-3
    assert abs(x.var() - 1.0 / 12.0) < 2e-3
    # decorrelation between dims and lanes
    y = np.asarray(s.next_1d(4))
    assert abs(np.corrcoef(x, y)[0, 1]) < 0.02


def test_discrete_distribution():
    d = distr.DiscreteDistribution.create(jnp.asarray([1.0, 2.0, 3.0]))
    u = jnp.linspace(0.0, 0.999, 6000)
    idx = np.asarray(d.sample(u))
    frac = np.bincount(idx, minlength=3) / len(idx)
    assert np.abs(frac - np.array([1, 2, 3]) / 6.0).max() < 0.01


def test_continuous_distribution():
    # linear ramp density on [0, 1]
    k = 64
    v = np.linspace(0.0, 1.0, k).astype(np.float32)
    d = distr.ContinuousDistribution.create([0.0, 1.0], v)
    u = jnp.linspace(1e-4, 1 - 1e-4, 20000)
    x = np.asarray(d.sample(u))
    # cdf of ramp is x^2 -> samples should be sqrt(u)
    assert np.abs(x - np.sqrt(np.asarray(u))).max() < 5e-3
    pdf = np.asarray(d.pdf_normalized(jnp.asarray([0.5])))
    assert abs(pdf[0] - 1.0) < 0.05  # normalized ramp density at 0.5 is 2*0.5


def test_spectral_conductor_ior_dispersion():
    """Conductor Fresnel disperses with wavelength in spectral mode
    (core/ior.py curves, the resources/data/ior role). Gold must be
    markedly more reflective at 650 nm than at 450 nm at normal
    incidence (F ~ 0.96 vs ~0.4)."""
    import jax.numpy as jnp
    import numpy as np
    from mitsuba3_plt_tpu.core import ior as ior_mod
    from mitsuba3_plt_tpu.librender import fresnel as fres

    eta_au, k_au = ior_mod.curve_for_material("au")
    curve_e = jnp.asarray(eta_au)[None, :]
    curve_k = jnp.asarray(k_au)[None, :]
    wl = jnp.asarray([[450.0, 650.0]])
    e = ior_mod.interp_ior(curve_e, wl)
    k = ior_mod.interp_ior(curve_k, wl)
    F = np.asarray(fres.fresnel_conductor(jnp.ones((1, 2)), e, k))
    assert F[0, 1] > 0.9, F          # red: strongly reflective
    assert F[0, 0] < 0.55, F         # blue: absorbing
    assert F[0, 1] - F[0, 0] > 0.3

    # curve_from_rgb is exact for constant triples
    ce, ck = ior_mod.curve_from_rgb((0.2, 0.2, 0.2), (3.0, 3.0, 3.0))
    np.testing.assert_allclose(ce, 0.2, rtol=1e-6)
    np.testing.assert_allclose(ck, 3.0, rtol=1e-6)


def test_srgb_spectral_upsampling_roundtrip():
    """rgb2spec replacement validation (round-1 review flagged the
    sigmoid-poly fit as unvalidated): fitted reflectance spectra, pushed
    through the RENDERER's own spectral pipeline (hero-wavelength sampling
    -> spectrum_to_xyz -> xyz_to_srgb) under D65, must recover the input
    sRGB values."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba3_plt_tpu.core import spectrum as spec
    from mitsuba3_plt_tpu.core.rng import Sampler

    palette = [
        (0.8, 0.2, 0.2), (0.2, 0.7, 0.3), (0.15, 0.3, 0.85),
        (0.9, 0.85, 0.1), (0.5, 0.5, 0.5), (0.05, 0.05, 0.05),
        (0.95, 0.95, 0.95), (0.6, 0.3, 0.7),
    ]
    n = 65536
    smp = Sampler.create(11, n)
    wl, wl_w = spec.sample_hero_wavelengths(smp.next_1d(0), 4)
    d65 = spec.cie_d65(wl)
    worst = 0.0
    for rgb in palette:
        coeff = spec.fit_srgb_to_spectrum(np.asarray(rgb))
        refl = spec.sigmoid_poly_eval(jnp.asarray(coeff)[None, None, :], wl)
        assert float(refl.min()) >= 0.0 and float(refl.max()) <= 1.0
        values = refl * d65
        xyz = spec.spectrum_to_xyz(values, wl, wl_w)
        srgb = np.asarray(spec.xyz_to_srgb(xyz)).mean(axis=0)
        err = float(np.abs(srgb - np.asarray(rgb)).max())
        worst = max(worst, err)
    # MC + fit + table-resolution error combined
    assert worst < 0.05, worst
