"""SpecFilm: N-channel spectral-binning film with mixture importance
sampling — functional twin of the reference `specfilm` plugin
(src/films/specfilm.cpp:85-260).

Each output channel s stores E[ L(lambda) * SRF_s(lambda) ]. Two variance
strategies mirror the reference:
  * wavelengths are importance-sampled from the COMBINED distribution
    sum_s SRF_s (compute_srf_sampling builds a `regular` spectrum from the
    sum; here: a discrete-linear inverse CDF over the common grid);
  * every sample scores ALL channels (each hero wavelength contributes
    SRF_s(lambda)/pdf(lambda) to every band), instead of rendering bands
    independently.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .film import ImageBlock, FILTER_BOX


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpecFilm:
    """Host-assembled spectral-band film description.

    curves [S, K] on the uniform grid `wavelengths` [K] (nm); the combined
    mixture CDF drives wavelength sampling."""

    wavelengths: Any   # [K] uniform grid (nm)
    curves: Any        # [S, K] per-band SRF values (>= 0)
    mix_cdf: Any       # [K] CDF of sum_s SRF_s on the grid (piecewise lin.)
    mix_pdf: Any       # [K] normalized density per nm
    names: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @staticmethod
    def create(bands: Sequence[np.ndarray], wavelengths: np.ndarray,
               names: Sequence[str] | None = None) -> "SpecFilm":
        """bands: list of [K] curves on the common uniform grid [K]."""
        grid = np.asarray(wavelengths, np.float64)
        curves = np.stack([np.asarray(b, np.float64) for b in bands])
        assert curves.shape[1] == grid.shape[0]
        mix = np.maximum(curves.sum(0), 0.0)
        # piecewise-constant-in-bin CDF (trapezoid-free, matching a
        # `regular` spectrum discretization); normalize to integrate to 1
        dx = float(grid[1] - grid[0])
        w_bin = 0.5 * (mix[1:] + mix[:-1]) * dx
        total = max(w_bin.sum(), 1e-30)
        cdf = np.concatenate([[0.0], np.cumsum(w_bin)]) / total
        pdf = mix / total
        return SpecFilm(
            wavelengths=jnp.asarray(grid, jnp.float32),
            curves=jnp.asarray(curves, jnp.float32),
            mix_cdf=jnp.asarray(cdf, jnp.float32),
            mix_pdf=jnp.asarray(pdf, jnp.float32),
            names=tuple(names or [f"band{i}" for i in range(len(bands))]),
        )

    @property
    def n_bands(self) -> int:
        return int(self.curves.shape[0])

    def sample_wavelengths(self, u):
        """Inverse-CDF sample of the band mixture: u [...] -> (lambda [...],
        1/pdf [...]) (specfilm's importance strategy #1)."""
        K = self.mix_cdf.shape[0]
        i = jnp.clip(
            jnp.searchsorted(self.mix_cdf, u, side="right") - 1, 0, K - 2
        )
        c0 = self.mix_cdf[i]
        c1 = self.mix_cdf[i + 1]
        f = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
        lam = self.wavelengths[i] + f * (
            self.wavelengths[i + 1] - self.wavelengths[i]
        )
        p0 = self.mix_pdf[i]
        p1 = self.mix_pdf[i + 1]
        pdf = p0 * (1.0 - f) + p1 * f
        return lam, 1.0 / jnp.maximum(pdf, 1e-12)

    def sample_hero(self, u, n: int):
        """Rotated hero wavelengths over the mixture: u [...] ->
        (lambda [..., n], 1/pdf [..., n])."""
        shifts = jnp.arange(n, dtype=jnp.float32) / n
        uu = jnp.mod(u[..., None] + shifts, 1.0)
        return self.sample_wavelengths(uu)

    def eval_bands(self, lam):
        """SRF_s at lam: lam [...] -> [..., S] (linear interpolation)."""
        grid = self.wavelengths
        K = grid.shape[0]
        t = (lam - grid[0]) / (grid[-1] - grid[0]) * (K - 1)
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, K - 2)
        f = t - i
        v0 = self.curves[:, i]           # [S, ...]
        v1 = self.curves[:, i + 1]
        v = v0 * (1.0 - f) + v1 * f
        inside = (lam >= grid[0]) & (lam <= grid[-1])
        v = jnp.where(inside, v, 0.0)
        return jnp.moveaxis(v, 0, -1)    # [..., S]

    def bin_values(self, values, lam, inv_pdf):
        """Spectral sample values [N, C] at wavelengths [N, C] ->
        band values [N, S]: mean_c( L_c * SRF_s(lambda_c) / pdf_c )
        (strategy #2: one sample scores every band)."""
        srf = self.eval_bands(lam)                    # [N, C, S]
        contrib = values[..., None] * srf * inv_pdf[..., None]
        return jnp.mean(contrib, axis=-2)             # [N, S]


def render_specfilm(scene, integrator_sample, film: SpecFilm, seed: int = 0,
                    spp: int = 16, spp_per_pass: int | None = None,
                    rfilter: int = FILTER_BOX):
    """Render the scene into spectral bands: [H, W, S].

    Mirrors integrators.common.render but samples camera-ray wavelengths
    from the film's band mixture and bins each spectral sample into all S
    channels (specfilm.cpp's two noise-reduction strategies)."""
    from ..config import SPECTRAL
    from ..core.rng import Sampler, DIM_WAVELENGTH
    from ..integrators.common import camera_rays_at

    cfg = SPECTRAL
    width, height = scene.sensor.resolution
    if spp_per_pass is None:
        cap = max(1, (1 << 21) // (width * height) or 1)
        spp_per_pass = min(spp, cap)
    n_pass = (spp + spp_per_pass - 1) // spp_per_pass
    n = width * height * spp_per_pass
    S = film.n_bands

    @jax.jit
    def render_pass(block_data, pass_idx, seed_u32):
        sampler = Sampler.create(seed_u32, n).fork_traced(pass_idx)
        lane = jnp.arange(n, dtype=jnp.uint32)
        ray, uv, _wl, _ = camera_rays_at(
            scene, sampler.seed, lane, width, height, spp_per_pass, cfg
        )
        u_wl = sampler.next_1d(DIM_WAVELENGTH)
        lam, inv_pdf = film.sample_hero(u_wl, cfg.n_channels)
        values, valid = integrator_sample(scene, sampler, ray, lam, cfg)
        banded = film.bin_values(values, lam, inv_pdf)
        block = ImageBlock(
            data=block_data, width=width, height=height, n_channels=S,
            rfilter=rfilter,
        )
        return block.put_ordered(banded, valid, spp_per_pass).data

    block = ImageBlock.create(width, height, S, rfilter)
    data = block.data
    for p in range(n_pass):
        data = render_pass(data, jnp.uint32(p), jnp.uint32(seed))
    return dataclasses.replace(block, data=data).develop()
