"""Two-level treelet (clu2) Pallas kernels, interpret mode.

clu2 is the round-4 TPU hot path: coherent camera tiles on any scene above
the cluster floor, and EVERY ray class on big meshes
(scene/scene.py ray_intersect routing; perf: tools/experiments/isect_clu2.py
— 17.6/12.5 ms/M on cbox.xml camera/shadow tiles vs q's 41.7/32.7).
Validated on CPU in interpret mode against the chunked oracle: the two
AABB levels are conservative prunes, so output must be identical."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.ops.intersect_pallas import (
    pallas_intersect_clu2, pallas_occluded_clu2,
)
from mitsuba3_plt_tpu.scene import intersect as isect
from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.scene.bvh import build_bvh, pack_clusters2


@pytest.fixture(scope="module")
def scene2():
    """Three separated spheres + ground plane (~2k faces): several supers,
    treelets far apart (the gating case)."""
    parts = []
    for cx in (-2.5, 0.0, 2.5):
        m = shp.make_sphere(subdiv=2)
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
    ct2 = pack_clusters2(bvh, p0, p1, p2)
    rows = np.concatenate([p0, p1 - p0, p2 - p0], axis=-1).astype(np.float32)
    pad = (-len(rows)) % 64
    rows = np.concatenate([rows, np.zeros((pad, 9), np.float32)], axis=0)
    return jnp.asarray(rows), ct2


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(scale=1.5, size=(n, 3)).astype(np.float32)
    o[:, 2] -= 5.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.3
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clu2_tables(scene2):
    _, ct2 = scene2
    assert ct2.supers.shape[0] >= 1
    assert ct2.boxes.shape[0] > 4
    # packed rows: 4 triangles per 128-wide row
    assert ct2.rows.shape[1] == 128


def test_clu2_closest_matches_oracle(scene2):
    rows, ct2 = scene2
    o, d = _rays(1024)
    mt = jnp.full((o.shape[0],), jnp.inf)
    t0, p0_, u0, v0 = isect.chunked_intersect(rows, o, d, mt)
    t1, p1_, u1, v1 = pallas_intersect_clu2(ct2, o, d, mt, interpret=True)
    p0n, p1n = np.asarray(p0_), np.asarray(p1_)
    assert (p0n == p1n).mean() > 0.999  # coplanar-tie tolerance
    same = (p0n >= 0) & (p0n == p1n)
    np.testing.assert_allclose(np.asarray(t0)[same], np.asarray(t1)[same],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(u0)[same], np.asarray(u1)[same],
                               rtol=1e-3, atol=1e-4)


def test_clu2_anyhit_matches_oracle(scene2):
    rows, ct2 = scene2
    o, d = _rays(1024, seed=3)
    t0, p0_, _, _ = isect.chunked_intersect(
        rows, o, d, jnp.full((o.shape[0],), jnp.inf)
    )
    # segment tests ending just short of / just past the closest hit
    t0n = np.asarray(t0)
    for frac, expect_frac in ((0.95, 0.0), (1.05, 1.0)):
        mt = jnp.asarray(
            np.where(np.isfinite(t0n), t0n * frac, 1.0), jnp.float32
        )
        occ = np.asarray(pallas_occluded_clu2(ct2, o, d, mt, interpret=True))
        hit = np.isfinite(t0n)
        got = occ[hit].mean()
        if expect_frac == 0.0:
            assert got < 0.05, got  # shrunk segment: almost never occluded
        else:
            assert got > 0.95, got  # extended segment: almost always


def test_clu2_dead_lane_convention(scene2):
    """Canonical dead rays (o = 1e8) must miss everything — they are the
    regen/scan dead-lane fast path."""
    _, ct2 = scene2
    n = 256
    o = jnp.full((n, 3), 1e8)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    t, p, _, _ = pallas_intersect_clu2(
        ct2, o, d, jnp.full((n,), jnp.inf), interpret=True
    )
    assert (np.asarray(p) == -1).all()
    occ = pallas_occluded_clu2(
        ct2, o, d, jnp.full((n,), 1.0), interpret=True
    )
    assert not np.asarray(occ).any()
