"""Micro-benchmark: brute-force VPU vs MXU vs packet-BVH closest-hit on the
real cbox.xml geometry (2892 faces), coherent + incoherent rays."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.ops.intersect_pallas import (
    pallas_intersect, pallas_intersect_mxu, pallas_bvh_intersect, pack_tri_mxu)
from mitsuba3_plt_tpu.scene.bvh import build_bvh, pack_packet_bvh

scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml", resx=500, resy=500)
geo = scene.geo
print("faces:", geo.n_faces, "tri_isect:", geo.tri_isect.shape)

N = 1 << 20
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)

# scene bbox
p = np.concatenate([np.asarray(geo.tri_p0), np.asarray(geo.tri_p1), np.asarray(geo.tri_p2)])
lo, hi = p.min(0), p.max(0)
print("bbox", lo, hi)

# coherent camera-ish rays: one origin, directions in a cone
o_coh = jnp.tile(jnp.asarray((lo + hi) / 2 + np.array([0, 0, -(hi - lo)[2] * 1.5]), jnp.float32), (N, 1))
ang = jax.random.uniform(k1, (N, 2), minval=-0.35, maxval=0.35)
d_coh = jnp.stack([ang[:, 0], ang[:, 1], jnp.ones(N)], -1)
d_coh = d_coh / jnp.linalg.norm(d_coh, axis=-1, keepdims=True)

# incoherent bounce rays: origins uniform in bbox, directions uniform sphere
o_inc = jax.random.uniform(k2, (N, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)).astype(jnp.float32)
d_inc = jax.random.normal(k3, (N, 3))
d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
maxt = jnp.full((N,), jnp.inf)

# tables
bvh = scene.bvh
pbvh = pack_packet_bvh(bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2)
print("pbvh nodes", pbvh.nodes.shape, "tri", pbvh.tri.shape)
tri_mxu = jnp.asarray(pack_tri_mxu(np.asarray(geo.tri_p0), np.asarray(geo.tri_p1) - np.asarray(geo.tri_p0), np.asarray(geo.tri_p2) - np.asarray(geo.tri_p0)))
# pad 4T rows to mult of 4*128
T = geo.n_faces
Tp = -(-T // 128) * 128
W = np.zeros((4 * Tp, 16), np.float32)
Wg = np.asarray(tri_mxu)
for c in range(4):
    W[c * Tp: c * Tp + T] = Wg[c * T:(c + 1) * T]
tri_mxu = jnp.asarray(W)

K = 8

def timed(name, fn, *args):
    f = jax.jit(lambda *a: fn(*a))
    # chain K dependent applications: feed t output back into maxt-like slot
    def rep(o, d, mt):
        t, prim, u, v = fn(o, d, mt)
        acc = t
        for i in range(K - 1):
            t, prim, u, v = fn(o + 0.0 * acc[:, None], d, mt)
            acc = acc + t
        return acc, prim
    g = jax.jit(rep)
    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = g(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / K
    print(f"{name}: {dt*1e3:.2f} ms / {N>>20}M rays -> {N/dt/1e6:.1f} M rays/s")
    return r

sg = jax.lax.stop_gradient
import mitsuba3_plt_tpu.scene.scene as sc

def brute(o, d, mt):
    return pallas_intersect(geo.tri_isect, o, d, mt, n_tris=geo.n_faces)

def mxu(o, d, mt):
    return pallas_intersect_mxu(tri_mxu, o, d, mt)

def packet(o, d, mt):
    perm, inv = scene._packet_perm(o, d) if False else sc.Scene._packet_perm(scene.__class__ and scene, o, d), None
    perm, inv = sc.Scene._packet_perm(scene, o, d)
    t, prim, u, v = pallas_bvh_intersect(pbvh, o[perm], d[perm], mt[perm])
    return t[inv], prim[inv], u[inv], v[inv]

def packet_nosort(o, d, mt):
    return pallas_bvh_intersect(pbvh, o, d, mt)

for label, o, d in [("coherent", o_coh, d_coh), ("incoherent", o_inc, d_inc)]:
    print("==", label)
    r1 = timed("brute-VPU ", brute, o, d, maxt)
    r2 = timed("brute-MXU ", mxu, o, d, maxt)
    r3 = timed("packet+sort", packet, o, d, maxt)
    r4 = timed("packet-nosort", packet_nosort, o, d, maxt)
    # correctness cross-check on first app
    t1 = brute(o, d, maxt)[0]; t2 = mxu(o, d, maxt)[0]; t3 = packet(o, d, maxt)[0]
    for nm, tt in [("mxu", t2), ("packet", t3)]:
        a = np.asarray(t1); b = np.asarray(tt)
        both = np.isfinite(a) & np.isfinite(b)
        print(f"  {nm}: hit agree {np.mean(np.isfinite(a)==np.isfinite(b)):.6f}, relerr {np.max(np.abs(a[both]-b[both])/np.maximum(a[both],1e-3)):.2e}")
