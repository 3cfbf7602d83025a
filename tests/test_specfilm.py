"""SpecFilm (N-channel spectral binning + mixture importance sampling) —
parity surface: src/films/specfilm.cpp:85-260."""
import numpy as np
import jax.numpy as jnp

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.core.rng import Sampler
from mitsuba3_plt_tpu.librender.specfilm import SpecFilm, render_specfilm
from mitsuba3_plt_tpu.integrators import make_integrator


def _gauss_bands(n=3, lo=450.0, hi=650.0, sigma=20.0, scales=None):
    grid = np.linspace(400.0, 700.0, 121)
    centers = np.linspace(lo, hi, n)
    scales = scales or [1.0] * n
    bands = [
        s * np.exp(-0.5 * ((grid - c) / sigma) ** 2)
        for c, s in zip(centers, scales)
    ]
    return bands, grid


def test_mixture_sampling_unbiased():
    """E[SRF_s(lambda) / pdf(lambda)] over the mixture sampler must equal
    the band integral (the reason mixture sampling is unbiased across all
    channels)."""
    bands, grid = _gauss_bands(scales=[1.0, 2.0, 0.5])
    film = SpecFilm.create(bands, grid)
    smp = Sampler.create(0, 1 << 16)
    lam, inv_pdf = film.sample_wavelengths(smp.next_1d(0))
    srf = np.asarray(film.eval_bands(lam))          # [N, S]
    est = (srf * np.asarray(inv_pdf)[:, None]).mean(0)
    truth = np.trapezoid(np.stack(bands), grid, axis=-1)
    np.testing.assert_allclose(est, truth, rtol=0.03)


def test_hero_rotation_covers_mixture():
    bands, grid = _gauss_bands()
    film = SpecFilm.create(bands, grid)
    smp = Sampler.create(1, 4096)
    lam, inv_pdf = film.sample_hero(smp.next_1d(0), 4)
    assert lam.shape == (4096, 4)
    l = np.asarray(lam)
    assert (l >= grid[0] - 1e-3).all() and (l <= grid[-1] + 1e-3).all()
    # the 4 rotated wavelengths should be spread out, not clustered
    assert np.median(l.max(1) - l.min(1)) > 30.0


def test_specfilm_render_band_ratios():
    """Flat-spectrum scene: band images must scale with the band
    amplitudes (channel s = E[L * SRF_s]; L flat => ratio = amplitude
    ratio x equal gaussian integrals)."""
    scene, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "point", "position": [0, 1, 2],
                  "intensity": [5.0, 5.0, 5.0],
                  "spectrum": {"type": "uniform", "value": 5.0}},
        "plane": {"type": "rectangle",
                  "to_world": tf.scale([2, 2, 1]),
                  "bsdf": {"type": "diffuse", "reflectance": 0.6}},
    })
    bands, grid = _gauss_bands(scales=[1.0, 2.0, 1.0])
    film = SpecFilm.create(bands, grid, names=("b1", "b2", "b3"))
    integ = make_integrator({"type": "path", "max_depth": 2})
    img = np.asarray(
        render_specfilm(scene, integ.sample, film, seed=0, spp=64)
    )
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    m = img.reshape(-1, 3).mean(0)
    assert m.min() > 0
    np.testing.assert_allclose(m[1] / m[0], 2.0, rtol=0.1)
    np.testing.assert_allclose(m[2] / m[0], 1.0, rtol=0.1)
