"""Fold-proof full-bounce accounting on cbox.xml: per depth, compare
  A) q-brute closest + q-brute anyhit               (current routing)
  B) sort-once-per-bounce: keygen+argsort+carry-gather + pk closest
     + pk anyhit (shadow rays in the SAME sorted order)
All costs included; feedback prevents CSE/DCE."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip
from mitsuba3_plt_tpu.scene.bvh import pack_packet_bvh

scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml", resx=500, resy=500)
geo = scene.geo
W = H = 500; SPP = 4
N = W * H * SPP
rng = np.random.default_rng(0)

lane = np.arange(N); pix = lane // SPP
x = pix % W; y = pix // W
jit2 = rng.random((N, 2))
uv = np.stack([(x + jit2[:, 0]) / W, (y + jit2[:, 1]) / H], -1).astype(np.float32)
o, d = scene.sensor.sample_ray(jnp.asarray(uv), jnp.asarray(rng.random((N, 2), np.float32)))
o = np.asarray(o); d = np.asarray(d)
maxt = jnp.full((N,), jnp.inf)

p0 = np.asarray(geo.tri_p0); p1 = np.asarray(geo.tri_p1); p2 = np.asarray(geo.tri_p2)
pb = pack_packet_bvh(scene.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2)
tri_q, anchor = jnp.asarray(geo.tri_q), jnp.asarray(geo.tri_anchor)

CARRY = 24  # floats per lane of scan carry that a sorted bounce must permute

lp = np.array([0.0, 0.99, 0.0])

def bounce_q(o, d, mt, osh, dsh, msh, carry):
    t, p, u, v = ip.pallas_intersect_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces)
    occ = ip.pallas_occluded_q(tri_q, anchor, osh, dsh, msh, n_tris=geo.n_faces)
    return t, p, occ, carry

def bounce_sorted(o, d, mt, osh, dsh, msh, carry):
    perm, inv = scene._packet_perm(o, d)
    o2, d2 = o[perm], d[perm]
    carry2 = carry[perm]
    t, p, u, v = ip.pallas_bvh_intersect(pb, o2, d2, mt[perm])
    occ = ip.pallas_bvh_occluded(pb, osh[perm], dsh[perm], msh[perm])
    # un-sort the per-bounce outputs the film/carry path needs
    return t[inv], p[inv], occ[inv], carry2[inv]

def bounce_sorted_keepcarry(o, d, mt, osh, dsh, msh, carry):
    """Sorted variant that leaves the carry in sorted order (next bounce
    re-sorts anyway): only t/p/occ get un-sorted lazily — here we model the
    cheaper steady-state where ONLY the carry gather happens (outputs are
    consumed in sorted order too) and one [N] inverse gather for the film."""
    perm, _ = scene._packet_perm(o, d)
    o2, d2 = o[perm], d[perm]
    carry2 = carry[perm]
    t, p, u, v = ip.pallas_bvh_intersect(pb, o2, d2, mt[perm])
    occ = ip.pallas_bvh_occluded(pb, osh[perm], dsh[perm], msh[perm])
    return t, p, occ, carry2

K = 4
def rep(fn):
    def f(o, d, mt, osh, dsh, msh, carry):
        for _ in range(K):
            t, p, occ, carry = fn(o, d, mt, osh, dsh, msh, carry)
            o = o * (1.0 + 1e-38 * t[:, None])
            msh = msh + occ.astype(jnp.float32) * 1e-35
        return t, p, occ, carry
    return jax.jit(f)

def timeit(g, *args):
    r = jax.block_until_ready(g(*args))
    t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / K / (N / 1e6) * 1e3  # ms/M

g_q = rep(bounce_q)
g_s = rep(bounce_sorted)
g_sk = rep(bounce_sorted_keepcarry)

carry = jnp.asarray(rng.random((N, CARRY), np.float32))
alive = np.ones(N, bool)
for depth in range(5):
    oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    t0_, p0_, _, _ = [np.asarray(z) for z in jax.jit(
        lambda o, d, mt: ip.pallas_intersect_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces)
    )(oj, dj, maxt)]
    hit = np.isfinite(t0_) & (p0_ >= 0) & alive
    hp = o + np.where(np.isfinite(t0_), t0_, 2.0)[:, None] * d
    dsh = lp - hp; dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = dsh / np.maximum(dist, 1e-9)
    osh = np.where(hit[:, None], hp + 1e-4 * dsh, 1e8)
    msh = np.where(hit, dist[:, 0] * 0.999, -1.0)
    oshj = jnp.asarray(osh, jnp.float32); dshj = jnp.asarray(dsh, jnp.float32)
    mshj = jnp.asarray(msh, jnp.float32)

    # correctness cross-check once
    tq, pq, occq, _ = [np.asarray(z) for z in jax.jit(bounce_q)(oj, dj, maxt, oshj, dshj, mshj, carry)]
    ts, ps, occs, _ = [np.asarray(z) for z in jax.jit(bounce_sorted)(oj, dj, maxt, oshj, dshj, mshj, carry)]
    pm = (pq == ps).mean(); am = (occq == (occs > 0.5)).mean() if occs.dtype != bool else (occq == occs).mean()

    t_q = timeit(g_q, oj, dj, maxt, oshj, dshj, mshj, carry)
    t_s = timeit(g_s, oj, dj, maxt, oshj, dshj, mshj, carry)
    t_sk = timeit(g_sk, oj, dj, maxt, oshj, dshj, mshj, carry)
    print(f"depth {depth}: alive {alive.mean():.2f} prim-match {pm:.5f} occ-match {am:.5f}"
          f" | q={t_q:6.1f} sorted={t_s:6.1f} sorted-keep={t_sk:6.1f} ms/M (bounce total)")

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
    alive = hit
    o = np.where(alive[:, None], hp + 1e-4 * nd, 1e8).astype(np.float32)
    d = np.where(alive[:, None], nd, np.array([[0., 0., 1.]])).astype(np.float32)
