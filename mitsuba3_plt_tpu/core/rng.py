"""Stateless counter-based sampler for Monte Carlo rendering on TPU.

Design: instead of a mutable PCG32 state per lane (reference:
include/mitsuba/render/sampler.h:63-180), every sample value is a pure hash
of (seed, lane, dimension). This makes the sampler

  * fully replayable — path-replay backprop re-derives identical numbers
    without storing anything,
  * order-independent — no dimension-consumption bookkeeping inside lax.scan,
  * trivially shardable — lanes are globally indexed, so any device slice of
    the wavefront draws the same numbers as a single-device run.

The hash is PCG-family (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020 — public domain constants), 2 rounds over a mixed 32-bit counter.
Quality is well above what unbiased MC integration needs; a threefry-based
fallback is provided for gold-standard verification.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

U32 = jnp.uint32


def _pcg_hash(x):
    x = x * U32(747796405) + U32(2891336453)
    word = ((x >> ((x >> U32(28)) + U32(4))) ^ x) * U32(277803737)
    return (word >> U32(22)) ^ word


def hash_combine(a, b):
    """Mix two u32 streams (boost-style golden-ratio combine, then PCG round)."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    h = a ^ (b + U32(0x9E3779B9) + (a << U32(6)) + (a >> U32(2)))
    return _pcg_hash(h)


def random_bits(seed, lane, dim):
    """u32 random bits as a pure function of (seed, lane, dim)."""
    s = jnp.asarray(seed, U32)
    l = jnp.asarray(lane, U32)
    d = jnp.asarray(dim, U32)
    return _pcg_hash(hash_combine(hash_combine(s, l), d))


def uniform(seed, lane, dim):
    """f32 uniform in [0, 1) from (seed, lane, dim)."""
    bits = random_bits(seed, lane, dim)
    # take the top 24 bits -> exactly representable in f32, in [0,1)
    return (bits >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Sampler:
    """Functional sampler: immutable seed + lane ids; `dim` is advanced by the
    caller (an integer carried through the bounce scan)."""

    seed: jax.Array  # scalar u32
    lane: jax.Array  # [N] u32 global lane indices

    @staticmethod
    def create(seed: int, wavefront_size: int, lane_offset: int = 0) -> "Sampler":
        lanes = jnp.arange(wavefront_size, dtype=U32) + U32(lane_offset)
        return Sampler(seed=jnp.asarray(seed, U32), lane=lanes)

    def next_1d(self, dim):
        return uniform(self.seed, self.lane, dim)

    def next_2d(self, dim):
        return jnp.stack(
            [
                uniform(self.seed, self.lane, dim),
                uniform(self.seed, self.lane, dim + 1),
            ],
            axis=-1,
        )

    def fork(self, salt: int) -> "Sampler":
        return Sampler(
            seed=hash_combine(self.seed, jnp.asarray(salt, U32)), lane=self.lane
        )

    # traced-salt variant (same computation; separate name documents that the
    # salt may be a tracer, e.g. the pass index inside a jitted pass loop)
    fork_traced = fork


# ---------------------------------------------------------------------------
# Stratified / correlated multi-jittered pixel sampling (the role of the
# reference's stratified/multijitter/orthogonal sampler plugins,
# src/samplers/). Only the camera dimensions benefit from stratification in a
# wavefront renderer; bounce dims stay independent (pure counter hashes).
# Algorithm: Kensler, "Correlated Multi-Jittered Sampling" (Pixar TM 13-01).
# ---------------------------------------------------------------------------

def _cmj_permute(i, l, p):
    """Kensler's cycle-walking pseudorandom permutation of [0, l)."""
    i = jnp.asarray(i, U32)
    l = jnp.asarray(l, U32)
    p = jnp.asarray(p, U32)
    w = l - U32(1)
    w = w | (w >> U32(1))
    w = w | (w >> U32(2))
    w = w | (w >> U32(4))
    w = w | (w >> U32(8))
    w = w | (w >> U32(16))

    def body(state):
        i, _ = state
        i = i ^ p
        i = i * U32(0xE170893D)
        i = i ^ (p >> U32(16))
        i = i ^ ((i & w) >> U32(4))
        i = i ^ (p >> U32(8))
        i = i * U32(0x0929EB3F)
        i = i ^ (p >> U32(23))
        i = i ^ ((i & w) >> U32(1))
        i = i * (U32(1) | (p >> U32(27)))
        i = i * U32(0x6935FA69)
        i = i ^ ((i & w) >> U32(11))
        i = i * U32(0x74DCCA9A)
        i = i ^ ((i & w) >> U32(2))
        i = i * U32(0x9E501CC3)
        i = i ^ ((i & w) >> U32(2))
        i = i * U32(0xC860A3DF)
        i = i & w
        i = i ^ (i >> U32(5))
        return i, i >= l

    # fixed 4 rounds of cycle-walking cover all practical l
    i, again = body((i, jnp.ones_like(i, bool)))
    for _ in range(3):
        i2, again2 = body((i, again))
        i = jnp.where(again, i2, i)
        again = again & again2
    return (i + p) % l


def _cmj_randfloat(i, p):
    bits = _pcg_hash(hash_combine(jnp.asarray(i, U32), jnp.asarray(p, U32)))
    return (bits >> U32(8)).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def cmj_sample_2d(s, spp: int, pattern):
    """Correlated multi-jittered 2D sample s of spp for pattern id `pattern`
    (a u32 array broadcastable with s). spp is static."""
    import math

    m = max(int(math.sqrt(spp)), 1)
    n = (spp + m - 1) // m
    s = _cmj_permute(s, spp, pattern * U32(0x51633E2D))
    sx = _cmj_permute(s % m, m, pattern * U32(0x68BC21EB))
    sy = _cmj_permute(s // m, n, pattern * U32(0x02E5BE93))
    jx = _cmj_randfloat(s, pattern * U32(0x967A889B))
    jy = _cmj_randfloat(s, pattern * U32(0x368CC8B7))
    x = (sx.astype(jnp.float32) + (sy.astype(jnp.float32) + jx) / n) / m
    y = (s.astype(jnp.float32) + jy) / spp
    return jnp.stack([x, y], axis=-1)


SAMPLER_INDEPENDENT = "independent"
SAMPLER_STRATIFIED = "stratified"
SAMPLER_MULTIJITTER = "multijitter"


# Fixed dimension-allocation map for the path/PLT integrators. Each bounce gets
# a static stride of dimensions so sample/replay phases agree by construction.
DIMS_PER_BOUNCE = 12
DIM_CAMERA = 0          # 4 dims: film jitter (2), aperture (2)
DIM_WAVELENGTH = 4      # 1 dim
DIM_BOUNCE_BASE = 8     # bounce b uses [8 + b*12, 8 + (b+1)*12)


def bounce_dim(bounce, offset):
    return DIM_BOUNCE_BASE + bounce * DIMS_PER_BOUNCE + offset
