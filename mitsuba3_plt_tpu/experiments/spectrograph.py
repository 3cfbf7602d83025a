"""Virtual spectrograph: recover a source spectrum from diffraction-grating
lobe measurements.

Functional twin of the fork's flagship application (reference
scripts/spectrograph/: gen_srfs.py, scene.py:58-176,
render_spectrograph.py:115-174):

  * N gaussian spectral-response functions tile [min_wl, max_wl];
  * the scene is a directional light at -15 deg hitting a roughgrating patch;
  * a batch of N single-column orthographic sensors, each positioned on the
    lobe-(2,0) diffraction direction of its SRF's center wavelength (computed
    with the SAME grating.diffract used at render time);
  * render once with the target spectrum and once with a uniform prior;
  * recovered spectrum = target_intensity / prior_intensity, RMSE vs truth.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SPECTRAL, RenderConfig
from ..core import spectrum as spec
from ..core import transform as tf
from ..core.rng import Sampler
from ..integrators.plt import PLTIntegrator
from ..librender.bsdf import BSDF_DIFFUSE, BSDF_ROUGH_GRATING
from ..librender.film import ImageBlock
from ..librender.sensor import Sensor
from ..plt import grating as gr
from ..scene.loader import LoadedBSDF, assemble_scene
from ..scene.shape import make_rectangle


def gen_srfs(n: int, min_wl: float = 400.0, max_wl: float = 700.0,
             points: int = 64, width_scale: float = 1.0):
    """N gaussian SRFs tiling [min_wl, max_wl] (reference gen_srfs.py).

    Returns (centers [n], grid [points], curves [n, points])."""
    centers = np.linspace(min_wl, max_wl, n)
    sigma = width_scale * (max_wl - min_wl) / n / 2.0
    grid = np.linspace(min_wl, max_wl, points)
    curves = np.exp(-0.5 * ((grid[None, :] - centers[:, None]) / sigma) ** 2)
    return centers, grid, curves.astype(np.float32)


GRATING = dict(
    inv_period=(0.6, 0.0), height=0.04, lobes=7, gtype=gr.SINUSOIDAL,
    alpha=0.02, multiplier=10.0, coherence=1e3,
)
LIGHT_ANGLE_DEG = -15.0
LOBE = (2, 0)


def _lobe_direction(wl_nm: float):
    """World direction of the LOBE diffraction order for wavelength wl
    (grating slab in the x-z plane, normal +y; light at LIGHT_ANGLE_DEG in
    the x-y incidence plane) — reference scene.py:58-131."""
    th = np.deg2rad(LIGHT_ANGLE_DEG)
    # incident direction in grating-local frame (z = up normal)
    wi_local = jnp.asarray([[np.sin(-th), 0.0, np.cos(th)]], jnp.float32)
    g = gr.Grating.create(
        grating_angle=jnp.zeros(1),
        inv_period=jnp.asarray([GRATING["inv_period"]], jnp.float32),
        q=jnp.full(1, GRATING["height"], jnp.float32),
        lobes=jnp.full(1, GRATING["lobes"], jnp.int32),
        gtype=jnp.full(1, GRATING["gtype"], jnp.int32),
        multiplier=jnp.full(1, GRATING["multiplier"], jnp.float32),
        uv=jnp.full((1, 2), 0.5, jnp.float32),
    )
    lobe = jnp.asarray([LOBE], jnp.int32)
    wo_local, ok = gr.diffract(g, wi_local, lobe, jnp.full(1, wl_nm * 1e-3))
    wo = np.asarray(wo_local)[0]
    # local (x, y, z=up) -> world (x, up=y, z)
    return np.array([wo[0], wo[2], wo[1]]), bool(ok[0])


def build_scene(n_sensors: int, srf_grid, srf_curves, spectrum: Dict,
                patch_size: float = 0.15, sensor_dist: float = 1.5):
    """Grating patch + directional light + batch of on-lobe sensors."""
    centers = np.linspace(srf_grid[0], srf_grid[-1], n_sensors)

    bsdfs_ = [
        LoadedBSDF(
            BSDF_ROUGH_GRATING, eta_re=(0.2, 0.92, 1.1),
            eta_im=(3.9, 2.45, 2.14),
            alpha=(GRATING["alpha"],) * 2,
            grt_inv_period=GRATING["inv_period"],
            grt_height=GRATING["height"], grt_lobes=GRATING["lobes"],
            grt_type=GRATING["gtype"], grt_multiplier=GRATING["multiplier"],
            grt_coherence=GRATING["coherence"],
        ),
    ]
    slab = make_rectangle().transformed(
        (tf.rotate([1, 0, 0], -90) @ tf.scale([patch_size, patch_size, 1.0]))
        .astype(np.float32)
    )
    th = np.deg2rad(LIGHT_ANGLE_DEG)
    emitters = [{
        "type": "directional",
        "direction": tuple(np.array([np.sin(th), -np.cos(th), 0.0])),
        "radiance": (1.0, 1.0, 1.0),
        "spectrum": spectrum,
    }]

    to_worlds = []
    for c in centers:
        d, ok = _lobe_direction(float(c))
        pos = d * sensor_dist
        look = tf.look_at(pos, [0.0, 0.0, 0.0], [0, 1, 0])
        to_worlds.append(look)
    sensor = Sensor.batch_orthographic(
        np.stack(to_worlds), sub_width=1, height=1,
        scale_x=patch_size, scale_y=patch_size,
        srf=srf_curves, srf_wavelengths=srf_grid,
    )
    scene, meta = assemble_scene(
        [slab], [0], [-1], bsdfs_, emitters, sensor, {"type": "plt"}, 512,
    )
    return scene, meta


def render_srf_binned(scene, integ, spp: int, seed: int = 0,
                      cfg: RenderConfig = SPECTRAL):
    """Render the batch film with per-sensor SRF binning (the specfilm role,
    src/films/specfilm.cpp:85-167): out[s] = E[ L(lambda) * SRF_s(lambda) ]."""
    width, height = scene.sensor.resolution
    S = scene.sensor.n_sub_sensors

    n = width * height * spp

    @jax.jit
    def run(seed_):
        sampler = Sampler.create(0, n)
        sampler = dataclasses.replace(
            sampler, seed=jnp.asarray(seed_, jnp.uint32)
        )
        lane = jnp.arange(n, dtype=jnp.uint32)
        pix = (lane // spp).astype(jnp.uint32)
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        jitter = sampler.next_2d(0)
        uv = jnp.stack(
            [(px + jitter[..., 0]) / width, (py + jitter[..., 1]) / height],
            axis=-1,
        )
        o, d = scene.sensor.sample_ray(uv)
        from ..librender.records import Ray as _Ray

        ray = _Ray.create(o, d)
        # uniform wavelengths over the SRF support
        grid = scene.sensor.srf_wavelengths
        u_wl = jnp.stack([sampler.next_1d(4 + i) for i in range(cfg.n_channels)],
                         axis=-1)
        wavelengths = grid[0] + (grid[-1] - grid[0]) * u_wl

        bounces, wl = integ.sample_phase(scene, sampler, ray, cfg,
                                         wavelengths=wavelengths)
        L = integ.solve_phase(scene, sampler, bounces, wl, cfg)  # [n, C]

        s_idx = jnp.clip((uv[..., 0] * S).astype(jnp.int32), 0, S - 1)
        srf_w = scene.sensor.eval_srf(s_idx, wavelengths)  # [n, C]
        val = jnp.sum(L * srf_w, axis=-1) / cfg.n_channels  # [n]

        block = ImageBlock.create(width, height, 1)
        block = block.put(uv, val[..., None], jnp.ones((n,), bool))
        return block.develop()[..., 0]

    img = run(seed)
    return np.asarray(img).reshape(height, width).mean(0)  # [width = S]


def render_interferogram(scene, integ, spp: int, seed: int = 0,
                         cfg: RenderConfig = SPECTRAL):
    """Coherent-summation render through the PhasorImageBlock (the
    reference's unfinished phasor film, phasorimageblock.h:14-81, completed
    per its documented intent): every path sample contributes a complex
    phasor  sqrt(L_c) * exp(i * 2pi * opl / lambda_c)  where opl is the
    sample's geometric path length from the two-phase bounce buffer, so
    equal-OPL path families interfere in the film. Returns
    (intensity [H, W, C], incoherent [H, W, C]) — the incoherent image is
    the same samples splat as |a|^2 (phase ignored), the classic film
    limit; fringes appear only in the coherent image."""
    from ..librender.phasor import PhasorImageBlock
    from ..librender.records import Ray as _Ray

    width, height = scene.sensor.resolution
    n = width * height * spp

    @jax.jit
    def run(seed_):
        sampler = Sampler.create(0, n)
        sampler = dataclasses.replace(
            sampler, seed=jnp.asarray(seed_, jnp.uint32)
        )
        lane = jnp.arange(n, dtype=jnp.uint32)
        pix = (lane // spp).astype(jnp.uint32)
        px = (pix % width).astype(jnp.float32)
        py = (pix // width).astype(jnp.float32)
        jitter = sampler.next_2d(0)
        uv = jnp.stack(
            [(px + jitter[..., 0]) / width, (py + jitter[..., 1]) / height],
            axis=-1,
        )
        o, d = scene.sensor.sample_ray(uv)
        ray = _Ray.create(o, d)

        bounces, wl = integ.sample_phase(scene, sampler, ray, cfg)
        L = integ.solve_phase(scene, sampler, bounces, wl, cfg)  # [n, C]

        # geometric path length of the sampled chain: sum of active-bounce
        # hit distances (the opl the PLT Coherence state propagates)
        opl = jnp.sum(
            jnp.where(bounces.active, bounces.t, 0.0), axis=0
        )  # [n]
        amp = jnp.sqrt(jnp.maximum(L, 0.0))
        phase = (2.0 * jnp.pi) * (opl[:, None] * 1e9) / jnp.maximum(wl, 1e-3)

        blk = PhasorImageBlock.create(width, height, cfg.n_channels)
        blk = blk.put(uv, amp, phase)
        # incoherent reference: sum |a|^2 (splat a^2 as the "amplitude" and
        # read the weight-normalized accumulation)
        blk0 = PhasorImageBlock.create(width, height, cfg.n_channels)
        blk0 = blk0.put(uv, amp * amp, jnp.zeros_like(phase))
        return blk.develop_intensity(), blk0.develop_amplitude()

    coh, inc = run(seed)
    return np.asarray(coh), np.asarray(inc)


def run_spectrograph(n_sensors: int = 16, spp: int = 2048, seed: int = 0,
                     spectrum: Dict | None = None, truth: Callable = None):
    """Full experiment (reference render_spectrograph.py:115-174).

    Returns dict(centers, measured, prior, recovered, truth, rmse)."""
    if spectrum is None:
        spectrum = {"type": "d65"}
    centers, grid, curves = gen_srfs(n_sensors)
    scene_t, _ = build_scene(n_sensors, grid, curves, spectrum)
    scene_p, _ = build_scene(n_sensors, grid, curves, {"type": "uniform",
                                                       "value": 1.0})
    integ = PLTIntegrator(max_depth=3, rr_depth=8)

    target = render_srf_binned(scene_t, integ, spp, seed)
    prior = render_srf_binned(scene_p, integ, spp, seed)
    recovered = target / np.maximum(prior, 1e-12)

    if truth is None:
        if spectrum.get("type") == "d65":
            truth_fn = lambda wl: np.asarray(spec.cie_d65(jnp.asarray(wl)))
        elif spectrum.get("type") == "blackbody":
            truth_fn = lambda wl: np.asarray(
                spec.blackbody(jnp.asarray(wl), spectrum.get("temperature", 5000.0))
            )
        else:
            truth_fn = lambda wl: np.ones_like(wl)
    else:
        truth_fn = truth
    tr = truth_fn(centers)
    # normalize both to mean 1 for comparison (the ratio is scale-free)
    rec_n = recovered / max(recovered.mean(), 1e-12)
    tr_n = tr / max(tr.mean(), 1e-12)
    rmse = float(np.sqrt(np.mean((rec_n - tr_n) ** 2)))
    return {
        "centers": centers, "measured": target, "prior": prior,
        "recovered": rec_n, "truth": tr_n, "rmse": rmse,
    }
