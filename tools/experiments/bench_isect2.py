"""Decompose packet-BVH cost on cbox.xml: sort vs kernel, SUB_B/leaf sweep."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time, functools
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip
from mitsuba3_plt_tpu.scene.bvh import pack_packet_bvh
import mitsuba3_plt_tpu.scene.scene as sc

scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml", resx=500, resy=500)
geo = scene.geo
N = 1 << 20
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
p = np.concatenate([np.asarray(geo.tri_p0), np.asarray(geo.tri_p1), np.asarray(geo.tri_p2)])
lo, hi = p.min(0), p.max(0)

o_coh = jnp.tile(jnp.asarray((lo + hi) / 2 + np.array([0, 0, -(hi - lo)[2] * 1.5]), jnp.float32), (N, 1))
ang = jax.random.uniform(k1, (N, 2), minval=-0.35, maxval=0.35)
d_coh = jnp.stack([ang[:, 0], ang[:, 1], jnp.ones(N)], -1)
d_coh = d_coh / jnp.linalg.norm(d_coh, axis=-1, keepdims=True)
o_inc = jax.random.uniform(k2, (N, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)).astype(jnp.float32)
d_inc = jax.random.normal(k3, (N, 3))
d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)
maxt = jnp.full((N,), jnp.inf)

K = 8
def timeit(g, *args):
    r = g(*args); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = g(*args); jax.block_until_ready(r)
    return (time.perf_counter() - t0) / K

# 1) sort cost alone
def sortonly(o, d, mt):
    acc = 0.0
    for i in range(K):
        perm, inv = sc.Scene._packet_perm(scene, o + acc, d)
        acc = acc + 0.0 * perm[0].astype(jnp.float32)
        o2, d2, m2 = o[perm], d[perm], mt[perm]
        acc = acc + 0.0 * o2[0, 0]
    return acc
g = jax.jit(sortonly)
print(f"sort+gather alone: {timeit(g, o_coh, d_coh, maxt)*1e3:.2f} ms")

# 2) kernel-only on pre-sorted rays, SUB_B x leaf_collapse sweep
for leaf in (8, 16, 32, 64):
    pb = pack_packet_bvh(scene.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, leaf_collapse=leaf)
    for sub in (4, 8, 16, 32):
        ip.SUB_B = sub
        for label, o, d in [("coh", o_coh, d_coh), ("inc", o_inc, d_inc)]:
            perm, _ = jax.jit(lambda o, d: sc.Scene._packet_perm(scene, o, d))(o, d)
            os_, ds_, ms_ = o[perm], d[perm], maxt[perm]
            def rep(o, d, mt):
                acc = 0.0
                for i in range(K):
                    outs, npad = ip._chunked_bvh_call(pb, o + acc, d, mt, ip._bvh_kernel, 4, False)
                    acc = acc + 0.0 * outs[0].reshape(-1)[0]
                return acc
            g = jax.jit(rep)
            dt = timeit(g, os_, ds_, ms_)
            print(f"leaf={leaf:2d} SUB_B={sub:2d} {label}: {dt*1e3:6.2f} ms -> {N/dt/1e6:6.1f} M rays/s")
ip.SUB_B = 16
