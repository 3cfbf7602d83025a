"""PhasorImageBlock: complex-amplitude film (amplitude + phase per channel).

Implements the documented intent of the reference's unfinished
PhasorImageBlock (include/mitsuba/render/phasorimageblock.h:14-81 — header
not in CMake; the Python port is truncated mid-line): accumulate complex
phasors A*exp(i*phi) per pixel/channel so coherent summation (interference)
happens in the film, and develop to amplitude/phase (or intensity) images.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhasorImageBlock:
    data_re: Any  # [H*W, C]
    data_im: Any  # [H*W, C]
    weight: Any   # [H*W]
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    n_channels: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(width, height, n_channels):
        return PhasorImageBlock(
            data_re=jnp.zeros((width * height, n_channels), jnp.float32),
            data_im=jnp.zeros((width * height, n_channels), jnp.float32),
            weight=jnp.zeros((width * height,), jnp.float32),
            width=width, height=height, n_channels=n_channels,
        )

    def put(self, pos_uv, amplitude, phase, active=None):
        """Splat phasors: amplitude [N, C], phase [N, C] (radians)."""
        n = amplitude.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)
        finite = jnp.all(jnp.isfinite(amplitude) & jnp.isfinite(phase), -1)
        active = active & finite
        re = jnp.where(active[..., None], amplitude * jnp.cos(phase), 0.0)
        im = jnp.where(active[..., None], amplitude * jnp.sin(phase), 0.0)

        w, h = self.width, self.height
        ix = jnp.clip((pos_uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip((pos_uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        flat = iy * w + ix
        return dataclasses.replace(
            self,
            data_re=self.data_re.at[flat].add(re, mode="drop"),
            data_im=self.data_im.at[flat].add(im, mode="drop"),
            weight=self.weight.at[flat].add(
                active.astype(jnp.float32), mode="drop"
            ),
        )

    def develop_amplitude(self):
        """-> [H, W, C] |sum of phasors| / weight (coherent mean amplitude)."""
        wgt = jnp.maximum(self.weight, 1e-8)[..., None]
        amp = jnp.sqrt(self.data_re ** 2 + self.data_im ** 2) / wgt
        return amp.reshape(self.height, self.width, self.n_channels)

    def develop_phase(self):
        """-> [H, W, C] argument of the accumulated phasor."""
        ph = jnp.arctan2(self.data_im, self.data_re)
        return ph.reshape(self.height, self.width, self.n_channels)

    def develop_intensity(self):
        """-> [H, W, C] coherent intensity |sum|^2 / weight (interference)."""
        wgt = jnp.maximum(self.weight, 1e-8)[..., None]
        inten = (self.data_re ** 2 + self.data_im ** 2) / wgt
        return inten.reshape(self.height, self.width, self.n_channels)
