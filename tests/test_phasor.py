"""PhasorImageBlock (complex-amplitude film) — the completed intent of the
reference's unfinished phasor film (include/mitsuba/render/
phasorimageblock.h:14-81): coherent summation happens in the film, so
opposite-phase contributions cancel and in-phase ones add as amplitudes.
Consumer: experiments/spectrograph.render_interferogram."""
import numpy as np
import jax.numpy as jnp

from mitsuba3_plt_tpu.librender.phasor import PhasorImageBlock


def _uv_center(n):
    return jnp.full((n, 2), 0.5, jnp.float32)


def test_two_beam_destructive_interference():
    """Two equal-amplitude splats pi out of phase cancel exactly."""
    blk = PhasorImageBlock.create(1, 1, 1)
    amp = jnp.ones((2, 1), jnp.float32)
    phase = jnp.asarray([[0.0], [np.pi]], jnp.float32)
    blk = blk.put(_uv_center(2), amp, phase)
    inten = np.asarray(blk.develop_intensity())
    assert inten.shape == (1, 1, 1)
    np.testing.assert_allclose(inten, 0.0, atol=1e-10)


def test_two_beam_constructive_interference():
    """In-phase beams add as AMPLITUDES: |a+a|^2/w = 2 * (2 a^2 incoherent).

    develop_intensity normalizes by the sample count w=2:
    |2a|^2 / 2 = 2 a^2 — twice the incoherent mean intensity a^2."""
    blk = PhasorImageBlock.create(1, 1, 1)
    amp = jnp.full((2, 1), 0.7, jnp.float32)
    phase = jnp.zeros((2, 1), jnp.float32)
    blk = blk.put(_uv_center(2), amp, phase)
    inten = float(np.asarray(blk.develop_intensity())[0, 0, 0])
    np.testing.assert_allclose(inten, 2.0 * 0.7 ** 2, rtol=1e-6)


def test_random_phase_approaches_incoherent_sum():
    """Uniform random phases: E|sum a e^{i phi}|^2 = sum a^2 (the incoherent
    limit). A SINGLE pixel's coherent intensity is speckle (O(1) relative
    fluctuation — exponential statistics), so average over many pixels."""
    rng = np.random.default_rng(0)
    P, K = 256, 64  # pixels x samples per pixel
    n = P * K
    amp = jnp.asarray(rng.uniform(0.5, 1.5, (n, 1)), jnp.float32)
    phase = jnp.asarray(rng.uniform(0, 2 * np.pi, (n, 1)), jnp.float32)
    # samples distributed round-robin over a P x 1 film
    uv = jnp.stack([
        (jnp.arange(n, dtype=jnp.float32) % P + 0.5) / P,
        jnp.full((n,), 0.5, jnp.float32),
    ], axis=-1)
    blk = PhasorImageBlock.create(P, 1, 1)
    blk = blk.put(uv, amp, phase)
    coh_mean = float(np.asarray(blk.develop_intensity()).mean())
    incoherent = float(np.mean(np.asarray(amp) ** 2))
    # mean over 256 speckle realizations: relative std ~ 1/16
    assert abs(coh_mean - incoherent) / incoherent < 0.25, (
        coh_mean, incoherent,
    )


def test_phase_develop_and_weight():
    blk = PhasorImageBlock.create(2, 1, 1)
    amp = jnp.ones((1, 1), jnp.float32)
    phase = jnp.full((1, 1), 0.5, jnp.float32)
    uv = jnp.asarray([[0.25, 0.5]], jnp.float32)  # left pixel
    blk = blk.put(uv, amp, phase)
    ph = np.asarray(blk.develop_phase())
    np.testing.assert_allclose(ph[0, 0, 0], 0.5, rtol=1e-6)
    assert np.asarray(blk.weight).reshape(1, 2)[0, 1] == 0.0


def test_interferogram_consumer_runs():
    """End-to-end consumer: the spectrograph's coherent mode renders fringes
    through the phasor film; the incoherent companion equals the classic
    |a|^2 accumulation and the coherent image stays in [0, n*incoherent]."""
    from mitsuba3_plt_tpu.experiments import spectrograph as sg
    from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator

    centers, grid, curves = sg.gen_srfs(4)
    scene, _ = sg.build_scene(4, grid, curves, {"type": "uniform",
                                                "value": 1.0})
    integ = PLTIntegrator(max_depth=3, rr_depth=8)
    coh, inc = sg.render_interferogram(scene, integ, spp=16, seed=0)
    assert coh.shape == inc.shape
    assert np.isfinite(coh).all() and np.isfinite(inc).all()
    assert (coh >= -1e-6).all()
    # coherent intensity is bounded by n_samples * incoherent (Cauchy-
    # Schwarz); with random path phases it should sit near the incoherent
    # level on average, far from the fully-coherent bound
    tot_c, tot_i = coh.sum(), inc.sum()
    assert tot_i > 0
    assert tot_c < 16 * tot_i
