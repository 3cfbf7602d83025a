"""Cluster-gated (treelet mini-TLAS) Pallas kernels, interpret mode.

The cluster kernels are the mid-size-scene TPU hot path (scene/scene.py
routes CLUSTER_MIN_FACES < n_faces <= CLUSTER_MAX_FACES through them).
Validated on CPU in interpret mode against the differentiable chunked
oracle: treelet gating must be output-identical to testing every triangle
(the AABB prune is conservative by construction)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.ops.intersect_pallas import (
    pallas_intersect_clu, pallas_occluded_clu,
)
from mitsuba3_plt_tpu.scene import intersect as isect
from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.scene.bvh import build_bvh, pack_clusters


@pytest.fixture(scope="module")
def clustered_scene():
    """Three separated spheres + a ground plane: multiple treelets, some
    far apart (the gating case), ~2k faces."""
    parts = []
    for cx in (-2.5, 0.0, 2.5):
        m = shp.make_sphere(subdiv=2)  # 320 faces each
        v = np.asarray(m.vertices) + np.array([cx, 0.0, 0.0], np.float32)
        parts.append((v, np.asarray(m.faces)))
    plane = shp.make_rectangle()
    pv = np.asarray(plane.vertices) * 6.0
    pv[:, 1] -= 1.5
    parts.append((pv, np.asarray(plane.faces)))

    P0, P1, P2 = [], [], []
    for v, f in parts:
        P0.append(v[f[:, 0]]); P1.append(v[f[:, 1]]); P2.append(v[f[:, 2]])
    p0 = np.concatenate(P0).astype(np.float32)
    p1 = np.concatenate(P1).astype(np.float32)
    p2 = np.concatenate(P2).astype(np.float32)
    nf = len(p0)
    verts = np.concatenate([p0, p1, p2], 0)
    faces = np.stack(
        [np.arange(nf), np.arange(nf) + nf, np.arange(nf) + 2 * nf], -1
    ).astype(np.int32)
    bvh = build_bvh(verts, faces)
    ctab = pack_clusters(bvh, p0, p1, p2)
    rows = np.concatenate([p0, p1 - p0, p2 - p0], axis=-1).astype(np.float32)
    pad = (-len(rows)) % 64  # chunked oracle expects 64-padded rows
    rows = np.concatenate([rows, np.zeros((pad, 9), np.float32)], axis=0)
    return jnp.asarray(rows), ctab


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(scale=1.5, size=(n, 3)).astype(np.float32)
    o[:, 2] -= 5.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clu_table_shapes(clustered_scene):
    _, ctab = clustered_scene
    assert ctab.n_clusters > 4  # the point is multiple treelets
    assert ctab.rows.shape[1] == 32
    # every real row's id is a valid prim; padding rows are -1 with zero n2
    ids = np.asarray(ctab.rows[:, 16])
    n2 = np.asarray(ctab.rows[:, 12:15])
    pad = ids < 0
    assert np.all(np.abs(n2[pad]).sum(-1) == 0)


def test_clu_closest_matches_oracle(clustered_scene):
    rows, ctab = clustered_scene
    o, d = _rays(768)
    maxt = jnp.full((768,), jnp.inf)
    t0, prim0, u0, v0 = isect.chunked_intersect(rows, o, d, maxt)
    t1, prim1, u1, v1 = pallas_intersect_clu(
        ctab, o, d, maxt, interpret=True
    )
    t0, prim0, u0, v0, t1, prim1, u1, v1 = map(
        np.asarray, (t0, prim0, u0, v0, t1, prim1, u1, v1)
    )
    assert (prim0 == prim1).mean() > 0.999  # edge ties may differ
    same = (prim0 == prim1) & (prim0 >= 0)
    assert same.sum() > 100
    assert np.allclose(t0[same], t1[same], rtol=2e-4, atol=1e-5)
    assert np.allclose(u0[same], u1[same], atol=2e-3)
    assert np.allclose(v0[same], v1[same], atol=2e-3)


def test_clu_anyhit_matches_oracle(clustered_scene):
    rows, ctab = clustered_scene
    o, d = _rays(768, seed=1)
    # finite maxt so some occlusions are range-limited
    maxt = jnp.full((768,), 4.0)
    occ0 = np.asarray(isect.chunked_occluded(rows, o, d, maxt))
    occ1 = np.asarray(pallas_occluded_clu(ctab, o, d, maxt, interpret=True))
    assert (occ0 == occ1).mean() > 0.999
