"""Film / ImageBlock: deterministic scatter-add sample accumulation + develop.

Functional twin of ImageBlock::put + Film::develop (reference
src/render/imageblock.cpp:119-430, include/mitsuba/render/film.h). Instead of
atomic scatter_reduce we use jnp scatter-add (deterministic on TPU) into a
flat [H*W, C+1] buffer whose last channel is the filter weight.

Reconstruction filters: box (single-pixel) and gaussian (3x3 taps with
Mitsuba's truncated-gaussian radius-2 default).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

FILTER_BOX = 0
FILTER_GAUSSIAN = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ImageBlock:
    data: Any  # [H*W, C+1] accumulated (filter-weighted) values + weight
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    n_channels: int = dataclasses.field(metadata=dict(static=True))
    rfilter: int = dataclasses.field(default=FILTER_BOX, metadata=dict(static=True))

    @staticmethod
    def create(width, height, n_channels, rfilter=FILTER_BOX):
        return ImageBlock(
            data=jnp.zeros((width * height, n_channels + 1), jnp.float32),
            width=width,
            height=height,
            n_channels=n_channels,
            rfilter=rfilter,
        )

    def put(self, pos_uv, values, active=None):
        """Splat values [N, C] at film positions pos_uv [N, 2] in [0,1]^2."""
        w, h = self.width, self.height
        n = values.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)
        # guard NaNs/Infs like the reference's compensating accumulation
        finite = jnp.all(jnp.isfinite(values), axis=-1)
        active = active & finite
        vals = jnp.where(active[..., None], values, 0.0)

        px = pos_uv[..., 0] * w - 0.5  # continuous pixel coords (center at .0)
        py = pos_uv[..., 1] * h - 0.5

        payload = jnp.concatenate(
            [vals, active.astype(jnp.float32)[..., None]], axis=-1
        )

        if self.rfilter == FILTER_BOX:
            ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
            iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
            flat = iy * w + ix
            data = self.data.at[flat].add(payload, mode="drop")
            return dataclasses.replace(self, data=data)

        # gaussian: 4x4 neighborhood, sigma = radius/2 with radius 2
        radius = 2
        sigma2 = (radius / 2.0) ** 2
        base_x = jnp.floor(px).astype(jnp.int32)
        base_y = jnp.floor(py).astype(jnp.int32)
        data = self.data
        # accumulate un-normalized gaussian taps; weight channel normalizes
        for dy in range(-radius + 1, radius + 1):
            for dx in range(-radius + 1, radius + 1):
                ix = base_x + dx
                iy = base_y + dy
                fx = ix.astype(jnp.float32) - px
                fy = iy.astype(jnp.float32) - py
                r2 = fx * fx + fy * fy
                wgt = jnp.exp(-0.5 * r2 / sigma2) - jnp.exp(
                    -0.5 * (radius * radius) / sigma2
                )
                wgt = jnp.maximum(wgt, 0.0)
                inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                wgt = jnp.where(inb & active, wgt, 0.0)
                flat = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
                data = data.at[flat].add(payload * wgt[..., None], mode="drop")
        return dataclasses.replace(self, data=data)

    def develop(self):
        """-> [H, W, C] image: value / weight."""
        wsum = self.data[..., -1:]
        img = self.data[..., :-1] / jnp.maximum(wsum, 1e-8)
        return img.reshape(self.height, self.width, self.n_channels)

    def merge(self, other: "ImageBlock") -> "ImageBlock":
        return dataclasses.replace(self, data=self.data + other.data)
