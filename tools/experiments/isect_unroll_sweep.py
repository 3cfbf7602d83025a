"""q-kernel unroll-depth sweep + deferred-best variant (dual accumulators)."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import functools
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip

SUB, LANES, BLOCK = ip.SUB, ip.LANES, ip.BLOCK


def make_q_kernel(unroll, dual):
    def _q_kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt,
                  t_out, p_out, *, n_tris: int):
        o_x, o_y, o_z = ox[...], oy[...], oz[...]
        d_x, d_y, d_z = dx[...], dy[...], dz[...]
        c_x = o_y * d_z - o_z * d_y
        c_y = o_z * d_x - o_x * d_z
        c_z = o_x * d_y - o_y * d_x

        def mkstate():
            return (mt[...], jnp.ones((SUB, LANES), jnp.float32),
                    jnp.full((SUB, LANES), -1.0, jnp.float32))

        def body(ti, st):
            ts_b, ad_b, prim = st
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
            ts_b = jnp.where(hit, ts, ts_b)
            ad_b = jnp.where(hit, ad, ad_b)
            prim = jnp.where(hit, jnp.float32(ti), prim)
            return ts_b, ad_b, prim

        if dual:
            # two independent accumulators halve the select-chain latency
            def body2(i, carry):
                a, b = carry
                a = body(2 * i, a)
                b = body(2 * i + 1, b)
                return a, b

            def bodyu(i, carry):
                for k in range(unroll // 2):
                    carry = body2((unroll // 2) * i + k, carry)
                return carry

            st = (mkstate(), mkstate())
            a, b = jax.lax.fori_loop(0, n_tris // unroll, bodyu, st)
            ts1, ad1, p1 = a
            ts2, ad2, p2 = b
            win = ts2 * ad1 < ts1 * ad2
            ts_b = jnp.where(win, ts2, ts1)
            ad_b = jnp.where(win, ad2, ad1)
            prim = jnp.where(win, p2, p1)
        else:
            def bodyu(i, st):
                for k in range(unroll):
                    st = body(unroll * i + k, st)
                return st
            ts_b, ad_b, prim = jax.lax.fori_loop(
                0, n_tris // unroll, bodyu, mkstate())
        inv = 1.0 / ad_b
        t_out[...] = ts_b * inv
        p_out[...] = prim
    return _q_kernel


def q_variant(tri_q, anchor, o, d, maxt, n_tris, unroll=2, dual=False):
    n = o.shape[0]
    n_tris = -(-n_tris // unroll) * unroll
    n_tris = min(n_tris, tri_q.shape[0] - tri_q.shape[0] % unroll)
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
        functools.partial(make_q_kernel(unroll, dual), n_tris=n_tris),
        grid=(npad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=[ray_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)] * 2,
        interpret=False,
    )(tri_q, *args)
    t, p = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim


if __name__ == "__main__":
    scene, meta = mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                               resx=500, resy=500)
    geo = scene.geo
    N = 1 << 20
    rng = np.random.default_rng(0)
    # incoherent bounce-like rays inside the box AABB
    p0 = np.asarray(geo.tri_p0); p1 = np.asarray(geo.tri_p1); p2 = np.asarray(geo.tri_p2)
    allp = np.concatenate([p0, p1, p2]); lo, hi = allp.min(0), allp.max(0)
    o = (lo + rng.random((N, 3)) * (hi - lo) * 0.9 + 0.05 * (hi - lo)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    maxt = jnp.full((N,), jnp.inf)

    tri_q = jnp.asarray(geo.tri_q); anchor = jnp.asarray(geo.tri_anchor)
    ref = jax.jit(lambda o, d, mt: ip.pallas_intersect_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))
    t0_, p0r, _, _ = [np.asarray(z) for z in ref(oj, dj, maxt)]

    K = 8
    def rep(fn):
        def f(o, d, mt):
            for _ in range(K):
                t, p = fn(o, d, mt)
                o = o * (1.0 + 1e-38 * t[:, None])
            return t, p
        return jax.jit(f)
    def timeit(g, *args):
        r = jax.block_until_ready(g(*args))
        t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
        return (time.perf_counter() - t0) / K / (N / 1e6) * 1e3

    for unroll, dual in [(8, False), (16, False), (32, False)]:
        fn = jax.jit(lambda o, d, mt, u=unroll, du=dual: q_variant(
            tri_q, anchor, o, d, mt, geo.n_faces, unroll=u, dual=du))
        t1_, p1r = [np.asarray(z) for z in fn(oj, dj, maxt)]
        pm = (p0r == p1r).mean()
        ms = timeit(rep(fn), oj, dj, maxt)
        print(f"unroll={unroll} dual={dual}: prim-match {pm:.5f} {ms:6.1f} ms/M")


    # ---- anyhit variants ----
    def make_a_kernel(unroll):
        def _a_kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt, occ_out, *, n_tris: int):
            o_x, o_y, o_z = ox[...], oy[...], oz[...]
            d_x, d_y, d_z = dx[...], dy[...], dz[...]
            c_x = o_y * d_z - o_z * d_y
            c_y = o_z * d_x - o_x * d_z
            c_z = o_x * d_y - o_y * d_x
            t_max = mt[...]

            def body(ti, occ):
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
                    & (ts > 0.0) & (ts < t_max * ad)
                )
                return jnp.where(hit, 1.0, occ)

            def bodyu(i, occ):
                for k in range(unroll):
                    occ = body(unroll * i + k, occ)
                return occ
            occ = jax.lax.fori_loop(0, n_tris // unroll, bodyu,
                                    jnp.zeros((SUB, LANES), jnp.float32))
            occ_out[...] = occ
        return _a_kernel

    def a_variant(o, d, maxt, unroll):
        n = o.shape[0]
        n_tris = -(-geo.n_faces // unroll) * unroll
        n_tris = min(n_tris, tri_q.shape[0] - tri_q.shape[0] % unroll)
        pad = (-n) % BLOCK
        npad = n + pad
        o2 = o - anchor[None, :]
        def prep(x):
            x = jnp.pad(x, (0, pad))
            return x.reshape(npad // LANES, LANES)
        args = [prep(o2[:, 0]), prep(o2[:, 1]), prep(o2[:, 2]),
                prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
                prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(-1.0)))]
        ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        occ = pl.pallas_call(
            functools.partial(make_a_kernel(unroll), n_tris=n_tris),
            grid=(npad // BLOCK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32),
        )(tri_q, *args)
        return occ.reshape(npad)[:n] > 0.5

    def rep_a(fn):
        def f(o, d, mt):
            for _ in range(K):
                occ = fn(o, d, mt)
                mt = mt + occ.astype(jnp.float32) * 1e-35
            return occ
        return jax.jit(f)

    msh = jnp.asarray(np.where(np.isfinite(np.asarray(t0_)), np.asarray(t0_) * 0.99, 2.0), jnp.float32)
    ref_a = jax.jit(lambda o, d, mt: ip.pallas_occluded_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))
    oc0 = np.asarray(ref_a(oj, dj, msh))
    for unroll in [8, 16, 32]:
        fn = jax.jit(lambda o, d, mt, u=unroll: a_variant(o, d, mt, u))
        oc1 = np.asarray(fn(oj, dj, msh))
        am = (oc0 == oc1).mean()
        ms = timeit(rep_a(fn), oj, dj, msh)
        print(f"anyhit unroll={unroll}: occ-match {am:.5f} {ms:6.1f} ms/M")
