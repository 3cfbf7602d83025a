"""Emitter table + NEE direction sampling (masked dispatch over types).

Functional twin of Scene::sample_emitter_direction / pdf_emitter_direction
(reference src/render/scene.cpp:294-368) with Mitsuba's semantics: emitter
chosen uniformly, then a position ∝ area on it; solid-angle densities.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core import frame as fr
from ..core import warp
from ..librender.records import DirectionSample

EMITTER_AREA = 0
EMITTER_POINT = 1
EMITTER_CONSTANT = 2
EMITTER_DIRECTIONAL = 3
EMITTER_ENVMAP = 4
EMITTER_SPOT = 5
EMITTER_DIRECTIONALAREA = 6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmitterTable:
    etype: Any        # [E] int32
    radiance: Any     # [E, 3] radiance (area/constant/directional) or intensity (point/spot)
    position: Any     # [E, 3]
    direction: Any    # [E, 3] (directional/spot main axis)
    cutoff_cos: Any   # [E] spot cutoff cosine
    beam_cos: Any     # [E] spot falloff-start cosine
    # --- area emitter triangle sampling (padded per emitter) ---
    tri_idx: Any      # [E, T] int32 triangle indices (-1 pad)
    tri_cdf: Any      # [E, T] area cdf (normalized to 1 at the last valid slot)
    area: Any         # [E] total surface area
    # bounding sphere of the scene (constant/directional sampling)
    scene_center: Any  # [3]
    scene_radius: Any  # scalar

    present_types: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def count(self):
        return self.etype.shape[0]


def sample_emitter_direction(
    em: EmitterTable, geo, ref_p, sample1, sample2, active=True
):
    """Sample a direction toward one uniformly-chosen emitter.

    geo: Geometry (for triangle vertex lookup).
    Returns (DirectionSample, visibility ray needed) — radiance evaluation is
    separate (eval_emitter) so polarized integrators can rotate bases.
    """
    n = ref_p.shape[0]
    e_count = em.count
    # uniform emitter pick with sample reuse
    scaled = sample1 * e_count
    e_idx = jnp.clip(scaled.astype(jnp.int32), 0, e_count - 1)
    # (sample1 is consumed; sample2 drives the position sample)

    etype = em.etype[e_idx]
    ds = _zeros_ds(n)

    for t in em.present_types:
        mask = etype == t
        if t == EMITTER_AREA:
            cand = _sample_area(em, geo, ref_p, e_idx, sample2)
        elif t == EMITTER_POINT:
            cand = _sample_point(em, ref_p, e_idx)
        elif t == EMITTER_CONSTANT:
            cand = _sample_constant(em, ref_p, e_idx, sample2)
        elif t == EMITTER_DIRECTIONAL:
            cand = _sample_directional(em, ref_p, e_idx)
        elif t == EMITTER_SPOT:
            cand = _sample_point(em, ref_p, e_idx)  # spot shares point geometry
        else:
            continue
        ds = _select_ds(mask, cand, ds)

    # divide by uniform emitter-pick probability
    pdf = ds.pdf / e_count
    ds = dataclasses.replace(ds, pdf=jnp.where(active, pdf, 0.0))
    return ds


def pdf_emitter_direction(em: EmitterTable, geo, ref_p, ds: DirectionSample):
    """Solid-angle density of sample_emitter_direction producing ds (for MIS).
    Only non-delta emitters return nonzero."""
    e_idx = jnp.maximum(ds.emitter_idx, 0)
    etype = em.etype[e_idx]
    pdf = jnp.zeros(ref_p.shape[0], jnp.float32)
    for t in em.present_types:
        mask = etype == t
        if t == EMITTER_AREA:
            cos_l = -fr.dot(ds.d, ds.n)
            p = jnp.where(
                cos_l > 0,
                ds.dist * ds.dist / (jnp.maximum(cos_l, 1e-9) * jnp.maximum(em.area[e_idx], 1e-12)),
                0.0,
            )
        elif t == EMITTER_CONSTANT:
            p = jnp.full_like(pdf, m.InvFourPi)
        else:
            continue
        pdf = jnp.where(mask, p, pdf)
    return pdf / em.count


def eval_emitter(em: EmitterTable, e_idx, d, dist, active):
    """Unpolarized RGB radiance arriving along -d from emitter e_idx.

    Point/spot emitters fold the 1/r^2 falloff here (their DirectionSample pdf
    is 1 with delta flag).
    """
    e_idx_c = jnp.maximum(e_idx, 0)
    etype = em.etype[e_idx_c]
    rad = em.radiance[e_idx_c]
    val = rad
    # point: intensity / r^2
    is_point = (etype == EMITTER_POINT) | (etype == EMITTER_SPOT)
    val = jnp.where(
        is_point[..., None], rad / jnp.maximum(dist * dist, 1e-12)[..., None], val
    )
    # spot falloff
    is_spot = etype == EMITTER_SPOT
    if True:
        cd = fr.dot(d, em.direction[e_idx_c])  # d points toward emitter; spot dir outward
        cos_angle = -cd
        cutoff = em.cutoff_cos[e_idx_c]
        beam = em.beam_cos[e_idx_c]
        falloff = jnp.clip(
            (cos_angle - cutoff) / jnp.maximum(beam - cutoff, 1e-6), 0.0, 1.0
        )
        val = jnp.where(is_spot[..., None], val * falloff[..., None], val)
    ok = active & (e_idx >= 0)
    return jnp.where(ok[..., None], val, 0.0)


def eval_env(em: EmitterTable, d):
    """Radiance for escaped rays (constant emitter / future envmap)."""
    out = jnp.zeros((*d.shape[:-1], 3), jnp.float32)
    for i_t in em.present_types:
        if i_t == EMITTER_CONSTANT:
            is_const = em.etype == EMITTER_CONSTANT
            # single constant emitter assumed: take its radiance
            rad = jnp.sum(
                jnp.where(is_const[:, None], em.radiance, 0.0), axis=0
            )
            out = out + rad
    return out


def env_emitter_index(em: EmitterTable):
    """Index of the environment (constant) emitter, -1 if none — host-side."""
    et = np.asarray(em.etype)
    idx = np.where(et == EMITTER_CONSTANT)[0]
    return int(idx[0]) if len(idx) else -1


# --- per-type samplers -------------------------------------------------------

def _zeros_ds(n):
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return DirectionSample(
        p=z3, n=z3, uv=jnp.zeros((n, 2), jnp.float32), d=z3,
        dist=z1, pdf=z1, delta=jnp.zeros((n,), bool),
        emitter_idx=jnp.full((n,), -1, jnp.int32),
    )


def _select_ds(mask, a: DirectionSample, b: DirectionSample) -> DirectionSample:
    mm = mask[..., None]
    return DirectionSample(
        p=jnp.where(mm, a.p, b.p),
        n=jnp.where(mm, a.n, b.n),
        uv=jnp.where(mm, a.uv, b.uv),
        d=jnp.where(mm, a.d, b.d),
        dist=jnp.where(mask, a.dist, b.dist),
        pdf=jnp.where(mask, a.pdf, b.pdf),
        delta=jnp.where(mask, a.delta, b.delta),
        emitter_idx=jnp.where(mask, a.emitter_idx, b.emitter_idx),
    )


def _sample_area(em, geo, ref_p, e_idx, sample2):
    n = ref_p.shape[0]
    # triangle pick by per-emitter area CDF (binary search over padded rows)
    cdf_rows = em.tri_cdf[e_idx]  # [N, T]
    u = sample2[..., 0]
    slot = jnp.sum((cdf_rows < u[..., None]).astype(jnp.int32), axis=-1)
    slot = jnp.clip(slot, 0, em.tri_cdf.shape[1] - 1)
    tri = em.tri_idx[e_idx, slot]
    tri_c = jnp.maximum(tri, 0)

    # reuse u within the chosen cdf cell, sample barycentric with (u', v)
    lo = jnp.where(slot > 0, jnp.take_along_axis(cdf_rows, jnp.maximum(slot - 1, 0)[..., None], -1)[..., 0], 0.0)
    hi = jnp.take_along_axis(cdf_rows, slot[..., None], -1)[..., 0]
    u_re = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-6)
    bary = warp.square_to_uniform_triangle(
        jnp.stack([u_re, sample2[..., 1]], axis=-1)
    )

    p0 = geo.tri_p0[tri_c]
    p1 = geo.tri_p1[tri_c]
    p2 = geo.tri_p2[tri_c]
    pos = (
        p0 * (1.0 - bary[..., 0:1] - bary[..., 1:2])
        + p1 * bary[..., 0:1]
        + p2 * bary[..., 1:2]
    )
    ng = fr.normalize(jnp.cross(p1 - p0, p2 - p0))

    to_l = pos - ref_p
    dist2 = fr.squared_norm(to_l)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = to_l / dist[..., None]
    cos_l = -fr.dot(d, ng)
    area = jnp.maximum(em.area[e_idx], 1e-12)
    pdf = jnp.where(cos_l > 1e-6, dist2 / (jnp.maximum(cos_l, 1e-9) * area), 0.0)
    return DirectionSample(
        p=pos, n=ng, uv=bary, d=d, dist=dist, pdf=pdf,
        delta=jnp.zeros((n,), bool), emitter_idx=e_idx,
    )


def _sample_point(em, ref_p, e_idx):
    n = ref_p.shape[0]
    pos = em.position[e_idx]
    to_l = pos - ref_p
    dist = jnp.sqrt(jnp.maximum(fr.squared_norm(to_l), 1e-20))
    d = to_l / dist[..., None]
    return DirectionSample(
        p=pos, n=-d, uv=jnp.zeros((n, 2), jnp.float32), d=d, dist=dist,
        pdf=jnp.ones((n,), jnp.float32), delta=jnp.ones((n,), bool),
        emitter_idx=e_idx,
    )


def _sample_constant(em, ref_p, e_idx, sample2):
    n = ref_p.shape[0]
    d = warp.square_to_uniform_sphere(sample2)
    dist = jnp.full((n,), 2.0) * em.scene_radius + 1.0
    return DirectionSample(
        p=ref_p + d * dist[..., None], n=-d,
        uv=jnp.zeros((n, 2), jnp.float32), d=d, dist=dist,
        pdf=jnp.full((n,), m.InvFourPi), delta=jnp.zeros((n,), bool),
        emitter_idx=e_idx,
    )


def _sample_directional(em, ref_p, e_idx):
    n = ref_p.shape[0]
    d = -em.direction[e_idx]  # direction property points *from* the emitter
    dist = 2.0 * em.scene_radius * jnp.ones((n,)) + 1.0
    return DirectionSample(
        p=ref_p + d * dist[..., None], n=-d,
        uv=jnp.zeros((n, 2), jnp.float32), d=d, dist=dist,
        pdf=jnp.ones((n,), jnp.float32), delta=jnp.ones((n,), bool),
        emitter_idx=e_idx,
    )
