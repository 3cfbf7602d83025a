"""Precomputed-quantities (q) brute-force Pallas kernels, interpret mode.

The q kernels are the small-scene TPU hot path (scene/scene.py routes
every scene under BRUTE_FORCE_MAX_FACES through them). Validated here on
CPU in interpret mode against the differentiable chunked oracle
(scene/isect.py), including the wrapper-side u/v recovery (the kernel only
tracks (t*det, |det|, prim); u, v are re-derived from the winning row)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.ops.intersect_pallas import (
    pack_tri_q, pallas_intersect_q, pallas_occluded_q,
)
from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.scene import intersect as isect


@pytest.fixture(scope="module")
def sphere_soup():
    mesh = shp.make_sphere(subdiv=2)  # 320 faces
    f = np.asarray(mesh.faces)
    v = np.asarray(mesh.vertices)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    rows = np.concatenate([p0, p1 - p0, p2 - p0], axis=-1).astype(np.float32)
    tri_q, anchor = pack_tri_q(p0, p1, p2)
    return p0, rows, jnp.asarray(tri_q), jnp.asarray(anchor)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([[0.0, 0.0, -3.0]], np.float32), (n, 1))
    o += rng.normal(scale=0.2, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_q_closest_matches_oracle(sphere_soup):
    p0, rows, tri_q, anchor = sphere_soup
    o, d = _rays(512)
    maxt = jnp.full((512,), jnp.inf)
    t0, prim0, u0, v0 = isect.chunked_intersect(jnp.asarray(rows), o, d, maxt)
    t1, prim1, u1, v1 = pallas_intersect_q(
        tri_q, anchor, o, d, maxt, interpret=True, n_tris=p0.shape[0]
    )
    t0, prim0, u0, v0, t1, prim1, u1, v1 = map(
        np.asarray, (t0, prim0, u0, v0, t1, prim1, u1, v1)
    )
    assert (prim0 == prim1).mean() > 0.999  # edge ties may differ
    same = (prim0 == prim1) & (prim0 >= 0)
    assert np.allclose(t0[same], t1[same], rtol=2e-4, atol=1e-5)
    assert np.allclose(u0[same], u1[same], atol=2e-3)
    assert np.allclose(v0[same], v1[same], atol=2e-3)


def test_q_anyhit_matches_oracle(sphere_soup):
    p0, rows, tri_q, anchor = sphere_soup
    o, d = _rays(512, seed=1)
    # maxt chosen to land some rays before, some after the sphere
    rng = np.random.default_rng(2)
    maxt = jnp.asarray(rng.uniform(1.0, 5.0, 512).astype(np.float32))
    occ0 = np.asarray(isect.chunked_occluded(jnp.asarray(rows), o, d, maxt))
    occ1 = np.asarray(pallas_occluded_q(
        tri_q, anchor, o, d, maxt, interpret=True, n_tris=p0.shape[0]
    ))
    assert (occ0 == occ1).mean() > 0.995  # boundary-t ties only


def test_q_tiny_scene_below_unroll(sphere_soup):
    """Scenes smaller than the unroll factor still intersect correctly
    (n_tris rounds UP into the zero padding, which can never hit)."""
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tri_q, anchor = pack_tri_q(tri[0:1], tri[1:2], tri[2:3])
    o = jnp.asarray([[0.2, 0.2, -1.0], [5.0, 5.0, -1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    maxt = jnp.full((2,), jnp.inf)
    t, prim, u, v = pallas_intersect_q(
        jnp.asarray(tri_q), jnp.asarray(anchor), o, d, maxt,
        interpret=True, n_tris=1,
    )
    t, prim, u, v = map(np.asarray, (t, prim, u, v))
    assert prim[0] == 0 and prim[1] == -1
    assert np.isclose(t[0], 1.0, atol=1e-5)
    assert np.isclose(u[0], 0.2, atol=1e-5) and np.isclose(v[0], 0.2, atol=1e-5)
    occ = np.asarray(pallas_occluded_q(
        jnp.asarray(tri_q), jnp.asarray(anchor), o, d, maxt,
        interpret=True, n_tris=1,
    ))
    assert occ[0] and not occ[1]
