"""Multi-accumulator q closest-hit: break the best-hit select chain.

kernel_mfu measured the q CLOSEST kernel at 69 G pairs/s vs ANY-HIT's 88 —
the any-hit kernel has no cross-triangle dependence, while closest's
best-update (ts_b, ad_b, prim, us, vs selects) chains every triangle
through the previous best. NACC independent accumulator groups (triangle
j updates group j % NACC; groups merge once after the loop) break the
chain NACC-ways.
"""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip

SUB, LANES, BLOCK = ip.SUB, ip.LANES, ip.BLOCK
UNROLL = 16


def _q_kernel_macc(tri_ref, ox, oy, oz, dx, dy, dz, mt,
                   t_out, p_out, u_out, v_out, *, n_tris: int, nacc: int):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x

    accs = []
    for a in range(nacc):
        accs.append((
            mt[...],
            jnp.ones((SUB, LANES), jnp.float32),
            jnp.full((SUB, LANES), -1.0, jnp.float32),
            jnp.zeros((SUB, LANES), jnp.float32),
            jnp.zeros((SUB, LANES), jnp.float32),
        ))

    def tri_test(ti, acc):
        ts_b, ad_b, prim, us_b, vs_b = acc
        tr = tri_ref[ti]
        det = -(d_x * tr[12] + d_y * tr[13] + d_z * tr[14])
        up = (c_x * tr[3] + c_y * tr[4] + c_z * tr[5]
              + d_x * tr[9] + d_y * tr[10] + d_z * tr[11])
        vp = -(c_x * tr[0] + c_y * tr[1] + c_z * tr[2]
               + d_x * tr[6] + d_y * tr[7] + d_z * tr[8])
        tp = o_x * tr[12] + o_y * tr[13] + o_z * tr[14] - tr[15]
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        ad = det * s
        us = up * s
        vs = vp * s
        ts = tp * s
        hit = (
            (ad > 1e-12)
            & (jnp.minimum(jnp.minimum(us, vs), ad - us - vs) >= 0.0)
            & (ts > 0.0) & (ts * ad_b < ts_b * ad)
        )
        return (
            jnp.where(hit, ts, ts_b), jnp.where(hit, ad, ad_b),
            jnp.where(hit, jnp.float32(ti), prim),
            jnp.where(hit, us, us_b), jnp.where(hit, vs, vs_b),
        )

    def bodyu(i, accs):
        accs = list(accs)
        for k in range(UNROLL):
            a = k % nacc
            accs[a] = tri_test(UNROLL * i + k, accs[a])
        return tuple(accs)

    accs = jax.lax.fori_loop(0, n_tris // UNROLL, bodyu, tuple(accs))

    ts_b, ad_b, prim, us_b, vs_b = accs[0]
    for a in range(1, nacc):
        ts2, ad2, pr2, us2, vs2 = accs[a]
        win = (pr2 >= 0.0) & ((prim < 0.0) | (ts2 * ad_b < ts_b * ad2))
        ts_b = jnp.where(win, ts2, ts_b)
        ad_b = jnp.where(win, ad2, ad_b)
        prim = jnp.where(win, pr2, prim)
        us_b = jnp.where(win, us2, us_b)
        vs_b = jnp.where(win, vs2, vs_b)
    inv = 1.0 / ad_b
    t_out[...] = ts_b * inv
    p_out[...] = prim
    u_out[...] = us_b * inv
    v_out[...] = vs_b * inv


@functools.partial(jax.jit, static_argnames=("n_tris", "nacc"))
def intersect_macc(tri_q, anchor, o, d, maxt, n_tris: int, nacc: int):
    n = o.shape[0]
    n_tris = min(-(-n_tris // UNROLL) * UNROLL, tri_q.shape[0])
    pad = (-n) % BLOCK
    npad = n + pad
    o = o - anchor[None, :]

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(npad // LANES, LANES)

    args = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
    ]
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_q_kernel_macc, n_tris=n_tris, nacc=nacc),
        grid=(npad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)] * 4,
    )(tri_q, *args)
    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


scene, _ = mi.load_file("/root/reference/scenes/cbox/cbox.xml", resx=500, resy=500)
geo = scene.geo
N = 1 << 21
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
mt = jnp.full((N,), jnp.inf)

base = jax.jit(lambda o, d, mt: ip.pallas_intersect_q(
    geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces))

K = 4
def rep(fn):
    def f(o, d, mt):
        for _ in range(K):
            t, p, u, v = fn(o, d, mt)
            o = o * (1.0 + 1e-38 * t[:, None])
        return t, p, u, v
    return jax.jit(f)
def timeit(g, *a):
    jax.block_until_ready(g(*a))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); jax.block_until_ready(g(*a)); ts.append(time.perf_counter() - t0)
    return min(ts) / K / (N / 1e6) * 1e3

t0_, p0_, u0_, v0_ = [np.asarray(x) for x in base(o, d, mt)]
print(f"baseline q (unroll 16, 1 acc): {timeit(rep(base), o, d, mt):.1f} ms/M")
for nacc in (2, 4, 8):
    fn = jax.jit(lambda o, d, mt, nacc=nacc: intersect_macc(
        geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces, nacc=nacc))
    t1_, p1_ = [np.asarray(x) for x in fn(o, d, mt)[:2]]
    match = (p0_ == p1_).mean()
    tm = timeit(rep(fn), o, d, mt)
    print(f"nacc={nacc}: {tm:.1f} ms/M (prim match {match:.5f})")
