"""Cluster-mask-sorted treelet gating for INCOHERENT rays (round 4).

Hypothesis: the cluster kernel's tile-ANY gating degenerates on bounce rays
only because tiles mix rays with unrelated cluster needs. Sorting rays by
their cluster-AABB hit mask makes [SUB_C, 128] tiles near-homogeneous, so
the per-tile union of needed treelets stays small — and all-dead lanes
(mask 0) compact into tiles that skip every cluster.

Measures, on cbox.xml bounce rays at depths 0-3 (fold-proof repeated
application):
  q        : 16/32-way unrolled brute (round-3 shipped, 37/33 ms/M)
  clu      : cluster kernel, unsorted (round-3 experiment: 74-250 on bounce)
  clu+mort : cluster kernel after the packet path's morton/octant sort
  clu+mask : cluster kernel after sorting by the cluster-hit bitmask
Plus the any-hit (shadow) variants with segment-bounded masks.
"""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip
from mitsuba3_plt_tpu.scene.bvh import pack_clusters

scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml", resx=500, resy=500)
geo = scene.geo
W = H = 500; SPP = 4
N = W * H * SPP
rng = np.random.default_rng(0)

p0 = np.asarray(geo.tri_p0); p1 = np.asarray(geo.tri_p1); p2 = np.asarray(geo.tri_p2)
tri_q, anchor = ip.pack_tri_q(p0, p1, p2)
tri_q = jnp.asarray(tri_q); anchor = jnp.asarray(anchor)

# cluster tables at two granularities
ctab64 = scene.ctab
ctab128 = pack_clusters(scene.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, max_leaf=128)
K64 = ctab64.boxes.shape[0]
K128 = ctab128.boxes.shape[0]
print(f"faces={geo.n_faces} clusters: max_leaf=64 -> {K64} boxes, max_leaf=128 -> {K128}")


def cluster_mask(ctab, o, d, maxt):
    """[N] uint32 bitmask (or hash when K > 32) of treelet AABBs the ray
    segment [0, maxt] enters. Vectorized slab tests, ~12 flop per (ray, box)
    — negligible next to the per-triangle work it saves."""
    K = ctab.boxes.shape[0]
    o = o - ctab.anchor[None, :]
    lo = ctab.boxes[:, 0:3]
    hi = ctab.boxes[:, 3:6]
    eps = 1e-12
    d_safe = jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    inv = 1.0 / d_safe
    t0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    mt = jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))
    hit = (near <= far) & (far > 0.0) & (near < mt[:, None])  # [N, K]
    if K <= 32:
        bits = jnp.uint32(1) << jnp.arange(K, dtype=jnp.uint32)
        return jnp.sum(jnp.where(hit, bits[None, :], 0), axis=-1,
                       dtype=jnp.uint32)
    # K > 32: group by (first-hit cluster, mask hash) — identical masks
    # stay adjacent; spatial DFS cluster order makes nearby masks similar
    idx = jnp.arange(K, dtype=jnp.uint32)
    first = jnp.min(jnp.where(hit, idx[None, :], jnp.uint32(K)), axis=-1)
    h = jnp.sum(
        jnp.where(hit, (idx[None, :] * jnp.uint32(2654435761)) ^ (idx[None, :] << 7), 0),
        axis=-1, dtype=jnp.uint32,
    )
    return (first << jnp.uint32(24)) | (h & jnp.uint32(0xFFFFFF))


def sorted_pipeline(ctab, anyhit=False):
    fn = ip.pallas_occluded_clu if anyhit else ip.pallas_intersect_clu

    def run(o, d, mt):
        key = cluster_mask(ctab, o, d, mt)
        perm = jnp.argsort(key)
        os_, ds_, ms_ = o[perm], d[perm], mt[perm]
        if anyhit:
            occ = fn(ctab, os_, ds_, ms_)
            inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
            return occ[inv]
        t, p, u, v = fn(ctab, os_, ds_, ms_)
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0]))
        return t[inv], p[inv], u[inv], v[inv]

    return run


def morton_pipeline(ctab, anyhit=False):
    fn = ip.pallas_occluded_clu if anyhit else ip.pallas_intersect_clu

    def run(o, d, mt):
        perm, invp = scene._packet_perm(o, d)
        os_, ds_, ms_ = o[perm], d[perm], mt[perm]
        if anyhit:
            return fn(ctab, os_, ds_, ms_)[invp]
        t, p, u, v = fn(ctab, os_, ds_, ms_)
        return t[invp], p[invp], u[invp], v[invp]

    return run


q_c = jax.jit(lambda o, d, mt: ip.pallas_intersect_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))
q_a = jax.jit(lambda o, d, mt: ip.pallas_occluded_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))
clu_c = jax.jit(lambda o, d, mt: ip.pallas_intersect_clu(ctab64, o, d, mt))
clu_a = jax.jit(lambda o, d, mt: ip.pallas_occluded_clu(ctab64, o, d, mt))
mask64_c = jax.jit(sorted_pipeline(ctab64))
mask64_a = jax.jit(sorted_pipeline(ctab64, anyhit=True))
mask128_c = jax.jit(sorted_pipeline(ctab128))
mask128_a = jax.jit(sorted_pipeline(ctab128, anyhit=True))

KREP = 4
def rep_c(fn):
    def f(o, d, mt):
        for _ in range(KREP):
            t, p, u, v = fn(o, d, mt)
            o = o * (1.0 + 1e-38 * t[:, None])
        return t, p, u, v
    return jax.jit(f)
def rep_a(fn):
    def f(o, d, mt):
        for _ in range(KREP):
            occ = fn(o, d, mt)
            mt = mt + occ.astype(jnp.float32) * 1e-35
        return occ
    return jax.jit(f)
def timeit(g, *args):
    r = jax.block_until_ready(g(*args))
    t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / KREP / (N / 1e6) * 1e3  # ms/M

reps_c = {k: rep_c(v) for k, v in [("q", q_c), ("clu", clu_c),
                                   ("m64", mask64_c), ("m128", mask128_c)]}
reps_a = {k: rep_a(v) for k, v in [("q", q_a), ("clu", clu_a),
                                   ("m64", mask64_a), ("m128", mask128_a)]}

# camera rays
lane = np.arange(N); pix = lane // SPP
x = pix % W; y = pix // W
jit2 = rng.random((N, 2))
uv = np.stack([(x + jit2[:, 0]) / W, (y + jit2[:, 1]) / H], -1).astype(np.float32)
o, d = scene.sensor.sample_ray(jnp.asarray(uv), jnp.asarray(rng.random((N, 2), np.float32)))
o = np.asarray(o); d = np.asarray(d)
maxt = jnp.full((N,), jnp.inf)

lp = np.array([0.0, 0.99, 0.0])
alive = np.ones(N, bool)
for depth in range(4):
    oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    t0_, p0_, u0_, v0_ = [np.asarray(z) for z in q_c(oj, dj, maxt)]
    # correctness vs q
    for name in ("m64", "m128"):
        fn = mask64_c if name == "m64" else mask128_c
        t1_, p1_ = [np.asarray(z) for z in fn(oj, dj, maxt)[:2]]
        pm = (p0_ == p1_).mean()
        if pm < 0.9999:
            print(f"  depth {depth} {name}: PRIM MISMATCH {pm:.5f}")
    row = {k: timeit(g, oj, dj, maxt) for k, g in reps_c.items()}
    # shadow rays toward the light
    hit = np.isfinite(t0_) & (p0_ >= 0) & alive
    hp = o + np.where(np.isfinite(t0_), t0_, 2.0)[:, None] * d
    dsh = lp - hp; dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = dsh / np.maximum(dist, 1e-9)
    osh = np.where(hit[:, None], hp + 1e-4 * dsh, 1e8)
    msh = jnp.asarray(np.where(hit, dist[:, 0] * 0.999, 0.0), jnp.float32)
    oshj = jnp.asarray(osh, jnp.float32); dshj = jnp.asarray(dsh, jnp.float32)
    oc0 = np.asarray(q_a(oshj, dshj, msh))
    for name in ("m64", "m128"):
        fn = mask64_a if name == "m64" else mask128_a
        oc1 = np.asarray(fn(oshj, dshj, msh))
        am = (oc0 == oc1).mean()
        if am < 0.9999:
            print(f"  depth {depth} {name} anyhit: OCC MISMATCH {am:.5f}")
    row_a = {k: timeit(g, oshj, dshj, msh) for k, g in reps_a.items()}
    alive_frac = alive.mean()
    print(f"depth {depth} (alive {alive_frac:.2f}): closest "
          + " ".join(f"{k}={v:5.1f}" for k, v in row.items())
          + " | anyhit " + " ".join(f"{k}={v:5.1f}" for k, v in row_a.items())
          + " ms/M")
    # next bounce: cosine-hemisphere from the hit
    fi = np.maximum(p0_, 0)
    nrm = np.cross(p1[fi] - p0[fi], p2[fi] - p0[fi])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm *= -np.sign(np.einsum("ij,ij->i", nrm, d))[:, None]
    cu = rng.random((N, 2))
    r_ = np.sqrt(cu[:, 0]); ph = 2 * np.pi * cu[:, 1]
    loc = np.stack([r_ * np.cos(ph), r_ * np.sin(ph), np.sqrt(np.maximum(1 - cu[:, 0], 0))], -1)
    tn = np.where(np.abs(nrm[:, 0:1]) < 0.9, np.array([[1., 0, 0]]), np.array([[0, 1., 0]]))
    tx = np.cross(nrm, tn); tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = np.cross(nrm, tx)
    nd = loc[:, 0:1] * tx + loc[:, 1:2] * ty + loc[:, 2:3] * nrm
    # kill ~15% per bounce to model RR/termination (dead lanes -> mask 0)
    alive = hit & (rng.random(N) < 0.85)
    o = np.where(alive[:, None], hp + 1e-4 * nd, 1e8).astype(np.float32)
    d = np.where(alive[:, None], nd, np.array([[0., 0., 1.]])).astype(np.float32)
