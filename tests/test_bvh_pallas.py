"""Packet-BVH Pallas kernel vs the brute-force oracle.

The kernel (ops/intersect_pallas.pallas_bvh_intersect) is the mesh-heavy
replacement for the reference's Embree/kd-tree backends
(src/render/scene_embree.inl, include/mitsuba/render/kdtree.h); here it runs
in interpret mode on CPU against `brute_force_intersect` on a tessellated
sphere large enough to exceed the brute-force cap.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.scene.bvh import build_bvh, pack_packet_bvh
from mitsuba3_plt_tpu.scene.intersect import (
    brute_force_intersect,
    chunked_occluded,
)
from mitsuba3_plt_tpu.ops.intersect_pallas import (
    pallas_bvh_intersect,
    pallas_bvh_occluded,
)


@pytest.fixture(scope="module")
def sphere_mesh():
    mesh = shp.make_sphere(subdiv=4)  # 5120 faces > BRUTE_FORCE_MAX_FACES
    v, f = mesh.vertices, mesh.faces
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    bvh = build_bvh(v, f)
    pbvh = pack_packet_bvh(bvh, p0, p1, p2)
    return p0, p1, p2, pbvh


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    # half aimed at the sphere from outside, half random
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 3.0
    target = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = target - o
    d[n // 2:] = rng.normal(size=(n - n // 2, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def test_packet_bvh_matches_oracle(sphere_mesh):
    p0, p1, p2, pbvh = sphere_mesh
    o, d = _rays(1024)
    maxt = jnp.full((1024,), jnp.inf)

    t_ref, prim_ref, u_ref, v_ref = brute_force_intersect(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, maxt
    )
    t, prim, u, v = pallas_bvh_intersect(pbvh, o, d, maxt, interpret=True)

    hit_ref = prim_ref >= 0
    hit = prim >= 0
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(hit_ref))
    np.testing.assert_allclose(
        np.asarray(t)[np.asarray(hit)],
        np.asarray(t_ref)[np.asarray(hit_ref)],
        rtol=1e-4, atol=1e-5,
    )
    # same prim everywhere except edge-shared ties (t equal)
    same = np.asarray(prim) == np.asarray(prim_ref)
    tie = np.isclose(np.asarray(t), np.asarray(t_ref), rtol=1e-4, atol=1e-5)
    assert np.all(same | tie)
    np.testing.assert_allclose(
        np.asarray(u)[same & np.asarray(hit)],
        np.asarray(u_ref)[same & np.asarray(hit_ref)],
        rtol=1e-3, atol=1e-4,
    )


def test_packet_bvh_maxt(sphere_mesh):
    """Rays truncated before the sphere must miss."""
    p0, p1, p2, pbvh = sphere_mesh
    o, d = _rays(256, seed=1)
    maxt = jnp.full((256,), 0.5)  # sphere surface is >= 2 away from |o|=3
    t, prim, _, _ = pallas_bvh_intersect(pbvh, o, d, maxt, interpret=True)
    assert np.all(np.asarray(prim) == -1)


def test_packet_bvh_occluded(sphere_mesh):
    p0, p1, p2, pbvh = sphere_mesh
    o, d = _rays(1024, seed=2)
    maxt = jnp.full((1024,), jnp.inf)
    t_ref, prim_ref, _, _ = brute_force_intersect(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2), o, d, maxt
    )
    occ = pallas_bvh_occluded(pbvh, o, d, maxt, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(prim_ref >= 0))
