"""Pearson chi^2 goodness-of-fit harness for directional samplers.

Functional twin of the reference's ChiSquareTest (src/python/python/chi2.py,
666 LoC): histogram many sample() draws over a spherical domain, integrate
the claimed pdf() over each bin with a tensor-product trapezoid rule, pool
low-count cells, and run the Pearson chi^2 test with Sidak-corrected
significance. Used by every BSDF/warp/phase sampling test (SURVEY §4) — and
extended here to the wave-BSDF lobe samplers the fork never tested.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as m


class SphericalDomain:
    """Maps directions <-> (cos_theta, phi) in [-1,1] x [-pi,pi]."""

    bounds = np.array([[-1.0, -np.pi], [1.0, np.pi]])

    def map_forward(self, d):
        cos_theta = d[..., 2]
        phi = jnp.arctan2(d[..., 1], d[..., 0])
        return jnp.stack([cos_theta, phi], axis=-1)

    def map_backward(self, p):
        cos_theta = p[..., 0]
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
        phi = p[..., 1]
        return jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
            axis=-1,
        )

    def aspect(self):
        return 2.0


@dataclasses.dataclass
class ChiSquareTest:
    """sample_func(n) -> ([n, 3] dirs, active mask); pdf_func([k, 3]) -> [k].

    Follows the reference defaults: res x (aspect*res) bins, sample_count
    draws, `ires`-point trapezoid integration per bin cell, cells pooled to
    >= 5 expected counts, significance with Sidak correction.
    """

    sample_func: Callable
    pdf_func: Callable
    domain: SphericalDomain = dataclasses.field(default_factory=SphericalDomain)
    sample_count: int = 1000000
    res: int = 33
    ires: int = 6
    significance_level: float = 0.01
    seed: int = 0

    messages: str = ""
    p_value: float = 0.0

    def run(self) -> bool:
        res_y = self.res
        res_x = int(self.domain.aspect() * self.res)
        lo, hi = self.domain.bounds

        # --- histogram of samples ---------------------------------------
        dirs, active = self.sample_func(self.sample_count)
        dirs = np.asarray(dirs)
        active = np.asarray(active)
        p = np.asarray(self.domain.map_forward(jnp.asarray(dirs)))
        ok = active & np.isfinite(p).all(-1)
        p = p[ok]
        n_valid = len(p)
        ix = np.clip(
            ((p[:, 1] - lo[1]) / (hi[1] - lo[1]) * res_x).astype(int), 0,
            res_x - 1,
        )
        iy = np.clip(
            ((p[:, 0] - lo[0]) / (hi[0] - lo[0]) * res_y).astype(int), 0,
            res_y - 1,
        )
        hist = np.bincount(iy * res_x + ix, minlength=res_x * res_y).astype(
            np.float64
        )

        # --- integrate the pdf over every cell ---------------------------
        # tensor-product trapezoid on an ires x ires subgrid per cell
        ys = np.linspace(lo[0], hi[0], res_y * (self.ires - 1) + 1)
        xs = np.linspace(lo[1], hi[1], res_x * (self.ires - 1) + 1)
        YY, XX = np.meshgrid(ys, xs, indexing="ij")
        pts = jnp.asarray(
            np.stack([YY.ravel(), XX.ravel()], -1), jnp.float32
        )
        d = self.domain.map_backward(pts)
        pdf = np.asarray(self.pdf_func(d)).astype(np.float64)
        # density in (cos_theta, phi) equals solid-angle density directly
        pdf = pdf.reshape(YY.shape)

        wy = np.ones(self.ires); wy[0] = wy[-1] = 0.5
        cell_dy = (hi[0] - lo[0]) / res_y / (self.ires - 1)
        cell_dx = (hi[1] - lo[1]) / res_x / (self.ires - 1)
        expected = np.zeros((res_y, res_x))
        s = self.ires - 1
        for cy in range(res_y):
            for cx in range(res_x):
                sub = pdf[cy * s:cy * s + self.ires, cx * s:cx * s + self.ires]
                expected[cy, cx] = (
                    np.einsum("i,j,ij->", wy, wy, sub) * cell_dy * cell_dx
                )
        # expected counts: pdf integral x total draws (the pdf integrates to
        # the acceptance probability, so invalid samples are accounted for)
        expected = expected.ravel() * self.sample_count

        # --- pool cells with tiny expected counts ------------------------
        order = np.argsort(expected)
        hist_s = hist[order]
        exp_s = expected[order]
        pooled_h, pooled_e = [], []
        acc_h = acc_e = 0.0
        for h, e in zip(hist_s, exp_s):
            acc_h += h
            acc_e += e
            if acc_e >= 5.0:
                pooled_h.append(acc_h)
                pooled_e.append(acc_e)
                acc_h = acc_e = 0.0
        if acc_e > 0 and pooled_e:
            pooled_h[-1] += acc_h
            pooled_e[-1] += acc_e
        pooled_h = np.asarray(pooled_h)
        pooled_e = np.asarray(pooled_e)
        dof = len(pooled_h) - 1
        if dof <= 0:
            self.messages = "chi2: degenerate binning"
            return False

        chi2 = np.sum((pooled_h - pooled_e) ** 2 / np.maximum(pooled_e, 1e-12))
        from scipy.stats import chi2 as chi2_dist

        self.p_value = float(chi2_dist.sf(chi2, dof))
        alpha = 1.0 - (1.0 - self.significance_level) ** (1.0 / 1.0)
        passed = self.p_value >= alpha
        self.messages = (
            f"chi2={chi2:.2f} dof={dof} p={self.p_value:.4f} "
            f"(valid {n_valid}/{self.sample_count})"
        )
        return passed


def BSDFAdapter(mat_table, mat_idx, wi, ctx, cfg, wavelengths=None, seed=0):
    """(sample_func, pdf_func) closure pair over the BSDF dispatch for a
    fixed incident direction — the reference BSDFAdapter (chi2.py)."""
    from ..librender import bsdfs
    from ..core.rng import Sampler
    from ..librender.records import SurfaceInteraction

    def make_si(n):
        z = jnp.zeros((n, 3), jnp.float32)
        e = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (n, 1))
        e2 = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, 1))
        nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
        return SurfaceInteraction(
            valid=jnp.ones((n,), bool), t=jnp.ones((n,)), p=z, n=nrm,
            sh_s=e, sh_t=e2, sh_n=nrm, uv=jnp.zeros((n, 2)),
            wi=jnp.tile(jnp.asarray(wi, jnp.float32), (n, 1)),
            prim_idx=jnp.zeros((n,), jnp.int32),
            mat_idx=jnp.full((n,), mat_idx, jnp.int32),
            emitter_idx=jnp.full((n,), -1, jnp.int32),
            shape_idx=jnp.zeros((n,), jnp.int32),
        )

    def sample_func(n):
        si = make_si(n)
        smp = Sampler.create(seed, n)
        u1 = smp.next_1d(0)
        u2 = smp.next_2d(1)
        midx = jnp.full((n,), mat_idx, jnp.int32)
        bs, w, ok = bsdfs.sample(mat_table, midx, si, u1, u2, ctx, cfg,
                                 wavelengths)
        return bs.wo, ok & (bs.pdf > 0)

    def pdf_func(d):
        n = d.shape[0]
        si = make_si(n)
        midx = jnp.full((n,), mat_idx, jnp.int32)
        return bsdfs.pdf(mat_table, midx, si, d, ctx, cfg)

    return sample_func, pdf_func
