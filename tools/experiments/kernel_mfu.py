"""Per-kernel MFU: measured Pallas-kernel throughput vs an on-chip measured
VPU roof (round-4 VERDICT item: XLA cost analysis cannot see inside Pallas
custom calls, so docs/ROOFLINE.md previously excluded exactly the kernels
that matter).

Measures on the real TPU:
  1. achievable VPU FMA throughput (a Pallas kernel of independent vector
     FMA chains over VMEM-resident tiles — the practical roof, not the
     datasheet number),
  2. HBM stream bandwidth (big saxpy),
  3. the q brute closest/any-hit kernels at 2 M rays on cbox.xml, with
     ANALYTIC per-pair op counts,
  4. the packet-BVH kernel on sorted camera rays, with host-simulated
     traversal statistics (avg nodes visited / tris tested per ray) giving
     its analytic op count,
  5. the fused grating lobe-sum kernel at bench shapes.

Writes the table printed here into docs/ROOFLINE.md by hand (keep the doc
the source of record).
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


def med_time(f, *args, reps=5):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def chained_time(f, x, *rest, reps=5):
    """Time f by CHAINING its output into the next call's input — repeat
    calls with identical buffers measure dispatch, not execution, on this
    backend (every repo perf experiment uses this fold-proof pattern)."""
    x = jax.block_until_ready(f(x, *rest))
    t0 = time.perf_counter()
    for _ in range(reps):
        x = f(x, *rest)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


# --- 1. VPU FMA roof --------------------------------------------------------
SUB, LANES = 8, 128
FMA_ITERS = 2048


def _fma_kernel(a_ref, x_ref, o_ref):
    a = a_ref[...]
    x0 = x_ref[...]
    # 4 independent chains expose ILP; each iteration is FMA + MIN (a pure
    # affine chain gets algebraically collapsed — see ROUND4_NOTES).
    x1 = x0 * 1.0000001 + 0.25
    x2 = x0 * 0.9999999 + 0.5
    x3 = x0 * 1.0000002 + 0.75
    for _ in range(FMA_ITERS // 4):
        x0 = jnp.minimum(x0 * a + 1e-9, 3e38)
        x1 = jnp.minimum(x1 * a + 2e-9, 3e38)
        x2 = jnp.minimum(x2 * a + 3e-9, 3e38)
        x3 = jnp.minimum(x3 * a + 4e-9, 3e38)
    o_ref[...] = (x0 + x1) + (x2 + x3)


def vpu_fma_roof():
    # ONE pallas call per jitted step, outputs chained into inputs across
    # timed calls — R chained pallas calls inside one jit mis-timed ~100x
    # on this backend (ROUND4_NOTES item 8)
    rows = 1 << 13  # 8192 x 128 = 1M elements
    x = jnp.ones((rows, LANES), jnp.float32)
    a = jnp.full((SUB, LANES), 0.9999999, jnp.float32)
    spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def f(x, a):
        return pl.pallas_call(
            _fma_kernel,
            grid=(rows // SUB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        )(a, x)

    dt = chained_time(f, x, a, reps=10)
    flops = rows * LANES * FMA_ITERS * 2  # FMA FLOP only (min not counted)
    return flops / dt


# --- 2. HBM stream bandwidth ------------------------------------------------
def hbm_bw():
    # jnp.roll defeats elementwise fusion, so each of the R steps is one
    # full read + write of the buffer (a plain x*a+b chain fuses into a
    # single pass and reports fantasy bandwidth)
    n = 1 << 27  # 128M f32 = 512 MB
    R = 1
    x = jnp.arange(n, dtype=jnp.float32)

    @jax.jit
    def f(x, a):
        # one roll+scale per call: a full read + write of the buffer
        return jnp.roll(x, 1) * a

    dt = chained_time(f, x, jnp.float32(1.0000001), reps=10)
    return (n * 4 * 2 * R) / dt


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    # NOTE (round 4): the synthetic FMA/HBM probes below mis-time through
    # the tunneled backend — the same kernel reported 0.39 and 86 TFLOP/s
    # in different runs (see ROUND4_NOTES item 8ff). They are kept for
    # future direct-attached hardware but NOT trusted; the roofline doc
    # uses the v5e datasheet VPU bound (8x128 lanes x 2 FLOP x ~1.7 GHz
    # ~= 3.5 TFLOP/s f32) as the denominator. The INTERSECTION timings
    # below are trusted: they reproduce end-to-end render pass times.
    roof = 3.5e12
    print(f"VPU bound (datasheet-derived): {roof/1e12:.2f} TFLOP/s f32")

    # --- 3. q kernels on cbox.xml at 2M rays -------------------------------
    import mitsuba3_plt_tpu as mi
    import mitsuba3_plt_tpu.ops.intersect_pallas as ip

    scene, _ = mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                            resx=500, resy=500)
    geo = scene.geo
    N = 1 << 21
    rng = np.random.default_rng(0)
    # interior origins, random directions (bounce-like: worst case)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    mt = jnp.full((N,), jnp.inf)
    T = geo.n_faces
    Tpad_c = -(-T // ip.Q_UNROLL) * ip.Q_UNROLL
    Tpad_a = -(-T // ip.Q_UNROLL_A) * ip.Q_UNROLL_A

    K = 4

    @jax.jit
    def g_c(o, d, mt):
        for _ in range(K):
            t, p, u, v = ip.pallas_intersect_q(
                geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=T)
            o = o * (1.0 + 1e-38 * t[:, None])
        return t

    @jax.jit
    def g_a(o, d, mt):
        for _ in range(K):
            occ = ip.pallas_occluded_q(
                geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=T)
            mt = mt + occ.astype(jnp.float32) * 1e-35
        return occ

    dt_c = med_time(g_c, o, d, mt) / K
    dt_a = med_time(g_a, o, d, mt) / K
    # analytic per-pair vector-op slots (all (8,128) f32 VPU ops):
    #   closest: 19 FMA + 4 cmp + 2 min + 2 logic + 5 select = 32 slots
    #            (38 FLOP counting FMAs as 2)
    #   any-hit: 19 FMA + 4 cmp + 2 min + 2 logic + 1 or     = 28 slots
    pairs_c = N * Tpad_c
    pairs_a = N * Tpad_a
    for name, dt, pairs, flop_pp, slots_pp in (
        ("q closest", dt_c, pairs_c, 38, 32),
        ("q any-hit", dt_a, pairs_a, 38, 28),
    ):
        gpairs = pairs / dt / 1e9
        tflop = pairs * flop_pp / dt / 1e12
        # slot-normalized roof: the FMA roof issues 2 FLOP per slot, so
        # peak slots/s = roof / 2
        slot_frac = (pairs * slots_pp / dt) / (roof / 2)
        print(f"{name}: {dt/ (N/1e6) * 1e3:.1f} ms/M rays, "
              f"{gpairs:.1f} G pairs/s, {tflop:.2f} TFLOP/s "
              f"({tflop*1e12/roof*100:.0f}% of FMA roof; "
              f"{slot_frac*100:.0f}% of slot roof)")

    # --- 4. packet BVH on sorted camera rays + host traversal stats --------
    import mitsuba3_plt_tpu.scene.shape as shp
    from mitsuba3_plt_tpu.core import transform as tf

    mesh = shp.make_sphere(subdiv=6)
    scene2, _ = mi.load_dict({
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 1024, "height": 1024},
        },
        "light": {"type": "point", "position": [2, 2, 3],
                  "intensity": [40, 40, 40]},
        "ball": {"type": "mesh", "mesh": mesh,
                 "bsdf": {"type": "diffuse", "reflectance": 0.7}},
    })
    N2 = 1 << 20
    lane = np.arange(N2)
    x = (lane % 1024 + 0.5) / 1024
    y = (lane // 1024 + 0.5) / 1024
    uv = np.stack([x, y], -1).astype(np.float32)
    o2, d2 = scene2.sensor.sample_ray(jnp.asarray(uv),
                                      jnp.zeros((N2, 2), jnp.float32))
    mt2 = jnp.full((N2,), jnp.inf)

    @jax.jit
    def g_p(o, d, mt):
        for _ in range(K):
            t, p, u, v = ip.pallas_intersect_clu2(scene2.ctab2, o, d, mt)
            o = o * (1.0 + 1e-38 * t[:, None])
        return t

    dt_p = med_time(g_p, o2, d2, mt2) / K

    # host-simulated per-ray traversal statistics on a sample
    bvh = scene2.bvh
    lo = np.asarray(bvh.node_lo); hi = np.asarray(bvh.node_hi)
    first = np.asarray(bvh.node_first); cnt = np.asarray(bvh.node_count)
    miss = np.asarray(bvh.node_miss)
    sel = np.random.default_rng(0).integers(0, N2, 512)
    o_np = np.asarray(o2)[sel]
    d_np = np.asarray(d2)[sel]
    nodes_v = 0; tris_t = 0
    for i in range(len(o_np)):
        node = 0
        inv = 1.0 / np.where(np.abs(d_np[i]) > 1e-12, d_np[i], 1e-12)
        while node >= 0 and node < len(lo):
            t0 = (lo[node] - o_np[i]) * inv
            t1 = (hi[node] - o_np[i]) * inv
            near = np.minimum(t0, t1).max(); far = np.maximum(t0, t1).min()
            nodes_v += 1
            if near <= far and far > 0:
                if cnt[node] > 0:
                    tris_t += int(cnt[node])
                    node = miss[node]
                else:
                    node = node + 1
            else:
                node = miss[node]
            if node < 0:
                break
    nv = nodes_v / len(o_np); tt = tris_t / len(o_np)
    # per-tile the kernel takes the UNION over 2048 lanes, so per-ray
    # effective counts are >= these; report both
    print(f"clu2 (camera scanline, 82k faces): {dt_p/(N2/1e6)*1e3:.1f} ms/M, "
          f"per-ray BVH stats (host walk): {nv:.0f} nodes + {tt:.0f} tris "
          f"(~{(nv*14+tt*38):.0f} FLOP/ray useful-work lower bound -> "
          f"{N2*(nv*14+tt*38)/dt_p/1e12:.3f} TFLOP/s useful)")

    # --- 5. grating lobe-sum kernel at bench shapes -------------------------
    from mitsuba3_plt_tpu.ops.grating_pallas import grating_lobe_sum

    N3 = 1 << 20
    wi = np.stack([np.full(N3, 0.3), np.full(N3, 0.1),
                   np.full(N3, 0.946)], -1).astype(np.float32)
    wo = np.stack([np.full(N3, -0.25), np.full(N3, 0.2),
                   np.full(N3, 0.947)], -1).astype(np.float32)
    wl = rng.uniform(400, 680, (N3, 3)).astype(np.float32)
    gd = np.tile(np.asarray([[1.0, 0.0]], np.float32), (N3, 1))
    ivp = np.tile(np.asarray([[0.5, 0.5]], np.float32), (N3, 1))
    qh = np.full(N3, 0.1, np.float32)
    lob = np.full(N3, 3, np.int32)
    gty = np.zeros(N3, np.int32)
    mul = np.ones(N3, np.float32)
    coh = np.full(N3, 6e5, np.float32)
    acone = np.full(N3, 1e-7, np.float32)
    half = 3

    @jax.jit
    def g_g(wi, wo, wl):
        for _ in range(K):
            out = grating_lobe_sum(
                wi, wo, wl, gd, ivp, qh, lob, gty, mul, coh, acone,
                half=half, separable=True, n_channels=3)
            wi = wi * (1.0 + 1e-38 * out[:, :1])
        return out

    args3 = [jnp.asarray(v) for v in (wi, wo, wl)]
    dt_g = med_time(g_g, *args3) / K
    print(f"grating lobe-sum (half={half}, separable, C=3): "
          f"{dt_g/(N3/1e6)*1e3:.2f} ms/M lanes")


if __name__ == "__main__":
    main()
