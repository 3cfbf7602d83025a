"""Round-5 bounce-ray experiments on cbox.xml (VERDICT r4 item 3): can
anything beat q-brute (42/33 ms/M) for INCOHERENT bounce rays on a
2.9k-face scene?

Variants (all costs included — sort keygen, argsort, ray gathers, result
inverse-gathers; fold-proof chained timing):
  q              — the shipped brute kernel (baseline)
  clu2           — two-level treelet kernel, unsorted (known bad on bounce)
  clu2+oct       — rays sorted by direction octant ONLY (3-bit key)
  clu2+octmorton — octant + origin-morton (the full _packet_perm-style key)
  q+anyhit       — same table for shadow rays toward the cbox light
"""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (
        _args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip
from mitsuba3_plt_tpu.scene.bvh import pack_clusters2

K = 4

scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                           resx=500, resy=500)
geo = scene.geo
ct2 = scene.ctab2 or pack_clusters2(
    scene.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2)
p0 = np.asarray(geo.tri_p0); p1 = np.asarray(geo.tri_p1)
p2 = np.asarray(geo.tri_p2)
allp = np.concatenate([p0, p1, p2])
LO, HI = allp.min(0), allp.max(0)

N = 500 * 500 * 8
rng = np.random.default_rng(0)
lane = np.arange(N); pix = lane // 8
x = pix % 500; y = pix // 500
uv = np.stack([(x + rng.random(N)) / 500, (y + rng.random(N)) / 500], -1)
o_cam, d_cam = scene.sensor.sample_ray(jnp.asarray(uv, jnp.float32),
                                       jnp.zeros((N, 2), jnp.float32))
maxt = jnp.full((N,), jnp.inf)
light_p = np.array([0.0, 0.99, 0.0])


def perm_key(o, d, with_morton: bool):
    octant = ((d[:, 0] < 0).astype(jnp.int32)
              | ((d[:, 1] < 0).astype(jnp.int32) << 1)
              | ((d[:, 2] < 0).astype(jnp.int32) << 2))
    if not with_morton:
        return octant.astype(jnp.uint32)
    rel = jnp.clip((o - jnp.asarray(LO)) / jnp.maximum(
        jnp.asarray(HI - LO), 1e-9), 0.0, 0.999)
    cell = (rel * 16.0).astype(jnp.int32)

    def spread4(v):
        v = (v | (v << 8)) & 0xF00F
        v = (v | (v << 4)) & 0xC3C3
        v = (v | (v << 2)) & 0x9249
        return v

    morton = (spread4(cell[:, 0]) | (spread4(cell[:, 1]) << 1)
              | (spread4(cell[:, 2]) << 2))
    return ((octant << 12) | morton).astype(jnp.uint32)


def sorted_pipe(fn, with_morton, anyhit=False):
    def run(o, d, mt):
        key = perm_key(o, d, with_morton)
        perm = jnp.argsort(key)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        if anyhit:
            return fn(o[perm], d[perm], mt[perm])[inv]
        t, p, u, v = fn(o[perm], d[perm], mt[perm])
        return t[inv], p[inv], u[inv], v[inv]
    return run


q_c = lambda o, d, mt: ip.pallas_intersect_q(
    geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces)
q_a = lambda o, d, mt: ip.pallas_occluded_q(
    geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces)
c2 = lambda o, d, mt: ip.pallas_intersect_clu2(ct2, o, d, mt)
a2 = lambda o, d, mt: ip.pallas_occluded_clu2(ct2, o, d, mt)

variants_c = {
    "q": q_c,
    "clu2": c2,
    "clu2+oct": sorted_pipe(c2, False),
    "clu2+octmorton": sorted_pipe(c2, True),
}
variants_a = {
    "q": q_a,
    "clu2": a2,
    "clu2+oct": sorted_pipe(a2, False, True),
    "clu2+octmorton": sorted_pipe(a2, True, True),
}


def rep_c(fn):
    def f(o, d, mt):
        for _ in range(K):
            out = fn(o, d, mt)
            o = o * (1.0 + 1e-38 * out[0][:, None])
        return out
    return jax.jit(f)


def rep_a(fn):
    def f(o, d, mt):
        for _ in range(K):
            occ = fn(o, d, mt)
            mt = mt + occ.astype(jnp.float32) * 1e-35
        return occ
    return jax.jit(f)


reps_c = {k: rep_c(v) for k, v in variants_c.items()}
reps_a = {k: rep_a(v) for k, v in variants_a.items()}


def timeit(g, *args):
    r = jax.block_until_ready(g(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        r = jax.block_until_ready(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K / (N / 1e6) * 1e3


o, d = np.asarray(o_cam), np.asarray(d_cam)
alive = np.ones(N, bool)
for depth in range(4):
    oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    t0_, p0_ = [np.asarray(z) for z in q_c(oj, dj, maxt)[:2]]
    row = {k: timeit(g, oj, dj, maxt) for k, g in reps_c.items()}
    hit = np.isfinite(t0_) & (p0_ >= 0) & alive
    hp = o + np.where(np.isfinite(t0_), t0_, 2.0)[:, None] * d
    dsh = light_p - hp
    dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = dsh / np.maximum(dist, 1e-9)
    osh = np.where(hit[:, None], hp + 1e-4 * dsh, 1e8)
    msh = jnp.asarray(np.where(hit, dist[:, 0] * 0.999, 0.0), jnp.float32)
    row_a = {k: timeit(g, jnp.asarray(osh, jnp.float32),
                       jnp.asarray(dsh, jnp.float32), msh)
             for k, g in reps_a.items()}
    print(f"depth {depth} (alive {alive.mean():.2f}): closest "
          + " ".join(f"{k}={v:6.1f}" for k, v in row.items())
          + " | anyhit "
          + " ".join(f"{k}={v:6.1f}" for k, v in row_a.items())
          + " ms/M", flush=True)
    fi = np.maximum(p0_, 0)
    nrm = np.cross(p1[fi] - p0[fi], p2[fi] - p0[fi])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    nrm *= -np.sign(np.einsum("ij,ij->i", nrm, d))[:, None]
    cu = rng.random((N, 2))
    r_ = np.sqrt(cu[:, 0]); ph = 2 * np.pi * cu[:, 1]
    loc = np.stack([r_ * np.cos(ph), r_ * np.sin(ph),
                    np.sqrt(np.maximum(1 - cu[:, 0], 0))], -1)
    tn = np.where(np.abs(nrm[:, 0:1]) < 0.9, np.array([[1., 0, 0]]),
                  np.array([[0, 1., 0]]))
    tx = np.cross(nrm, tn)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = np.cross(nrm, tx)
    nd = loc[:, 0:1] * tx + loc[:, 1:2] * ty + loc[:, 2:3] * nrm
    alive = hit
    o = np.where(alive[:, None], hp + 1e-4 * nd, 1e8).astype(np.float32)
    d = np.where(alive[:, None], nd,
                 np.array([[0., 0., 1.]])).astype(np.float32)
