"""Pallas TPU ray-triangle intersection kernel.

The hot op of the whole renderer (SURVEY §3: every bounce calls
scene.ray_intersect). This kernel replaces the XLA chunked brute-force path
for small/medium scenes: rays are tiled [SUB, 128] into VMEM-perfect VPU
tiles, the triangle soup stays resident in VMEM, and the kernel loops over
triangles broadcasting 9 scalars per step — all temporaries live in vector
registers, so HBM traffic is exactly one read of the rays + one write of the
hits (the XLA version materializes [N, chunk, 3] cross-product temporaries).

Layout contract (set up by scene.build_geometry):
  tri_isect [T_pad, 16] f32 — rows (p0.xyz, e1.xyz, e2.xyz, pad...) with
  degenerate padding rows; ray fields arrive as flat [N_pad] arrays reshaped
  to [N_pad/128, 128].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 64          # sublane rows per block
LANES = 128       # TPU lane width
BLOCK = SUB * LANES  # rays per grid step (8192)


def _kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt,
            t_out, p_out, u_out, v_out, *, n_tris: int):
    t_best = mt[...]
    prim = jnp.full((SUB, LANES), -1.0, jnp.float32)
    u_best = jnp.zeros((SUB, LANES), jnp.float32)
    v_best = jnp.zeros((SUB, LANES), jnp.float32)

    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]

    def body(ti, carry):
        t_best, prim, u_best, v_best = carry
        tr = tri_ref[ti]
        p0x, p0y, p0z = tr[0], tr[1], tr[2]
        e1x, e1y, e1z = tr[3], tr[4], tr[5]
        e2x, e2y, e2z = tr[6], tr[7], tr[8]

        # pvec = d x e2
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        # tvec = o - p0
        tvx = o_x - p0x
        tvy = o_y - p0y
        tvz = o_z - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (
            t < t_best
        )
        t_best = jnp.where(hit, t, t_best)
        prim = jnp.where(hit, jnp.float32(ti), prim)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
        return t_best, prim, u_best, v_best

    # 2 triangles per iteration for ILP (~30% faster device time; the
    # triangle array is chunk-padded so n_tris is always even)
    def body2(i, carry):
        return body(2 * i + 1, body(2 * i, carry))

    if n_tris % 2 == 0:
        carry = jax.lax.fori_loop(
            0, n_tris // 2, body2, (t_best, prim, u_best, v_best)
        )
    else:
        carry = jax.lax.fori_loop(
            0, n_tris, body, (t_best, prim, u_best, v_best)
        )
    t_best, prim, u_best, v_best = carry
    t_out[...] = t_best
    p_out[...] = prim
    u_out[...] = u_best
    v_out[...] = v_best


@functools.partial(jax.jit, static_argnames=("interpret", "n_tris"))
def pallas_intersect(tri_isect, o, d, maxt, interpret: bool = False,
                     n_tris: int | None = None):
    """Closest-hit over the packed triangle soup.

    tri_isect: [T_pad, 16] (p0, e1, e2, pad); o, d: [N, 3]; maxt: [N].
    n_tris: true triangle count — the table is chunk-padded with degenerate
    rows (scene.py CHUNK = 64) and looping over the padding is pure waste
    (a 6-tri scene otherwise tests 64: measured 2.7 -> ~0.6 ms/2M rays).
    Returns (t [N], prim [N] i32 (-1 = miss), u [N], v [N]).
    """
    n = o.shape[0]
    if n_tris is None:
        n_tris = tri_isect.shape[0]
    n_tris = min(n_tris + (n_tris % 2), tri_isect.shape[0])  # even for body2
    pad = (-n) % BLOCK
    npad = n + pad

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(npad // LANES, LANES)

    args = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
    ]

    grid = (npad // BLOCK,)
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # whole table, resident

    outs = pl.pallas_call(
        functools.partial(_kernel, n_tris=n_tris),
        grid=grid,
        in_specs=[tri_spec] + [ray_spec] * 7,
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )(tri_isect, *args)

    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    hit = prim >= 0
    return jnp.where(hit, t, jnp.inf), prim, u, v


def _anyhit_kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt, occ_out, *,
                   n_tris: int):
    """Shadow-ray kernel: no best-hit bookkeeping, just an occlusion flag —
    ~40% fewer vector ops than the closest-hit kernel."""
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    t_max = mt[...]
    occ = jnp.zeros((SUB, LANES), jnp.float32)

    def body(ti, occ):
        tr = tri_ref[ti]
        p0x, p0y, p0z = tr[0], tr[1], tr[2]
        e1x, e1y, e1z = tr[3], tr[4], tr[5]
        e2x, e2y, e2z = tr[6], tr[7], tr[8]
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        tvx = o_x - p0x
        tvy = o_y - p0y
        tvz = o_z - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (
            t < t_max
        )
        return jnp.where(hit, 1.0, occ)

    occ = jax.lax.fori_loop(0, n_tris, body, occ)
    occ_out[...] = occ


@functools.partial(jax.jit, static_argnames=("interpret", "n_tris"))
def pallas_occluded(tri_isect, o, d, maxt, interpret: bool = False,
                    n_tris: int | None = None):
    """Any-hit occlusion test (True = something within maxt).

    n_tris: true triangle count (skips the degenerate chunk padding)."""
    n = o.shape[0]
    if n_tris is None:
        n_tris = tri_isect.shape[0]
    n_tris = min(n_tris, tri_isect.shape[0])
    pad = (-n) % BLOCK
    npad = n + pad

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
    occ = pl.pallas_call(
        functools.partial(_anyhit_kernel, n_tris=n_tris),
        grid=(npad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32),
        interpret=interpret,
    )(tri_isect, *args)
    return occ.reshape(npad)[:n] > 0.5


# ---------------------------------------------------------------------------
# MXU formulation
#
# Moller-Trumbore's four quantities are affine in ray features:
#   det   = -d . n2                      (n2 = e1 x e2)
#   u*det =  d^T [e2]x o  -  d . (e2 x p0)
#   v*det = -d^T [e1]x o  +  d . (e1 x p0)
#   t*det =  o . n2       -  p0 . n2
# so with phi(ray) = [d(3), o(3), vec(d o^T)(9), 1] (16 features) the whole
# triangle soup is tested by ONE f32 matmul phi [B,16] @ W [16,4T] on the
# MXU; the VPU only does the sign logic and the running-min reduction.
# ---------------------------------------------------------------------------

MXU_B = 512  # rays per grid step for the MXU kernel


def pack_tri_mxu(p0, e1, e2):
    """Host-side: build W [16, 4T] columns grouped [det | u' | v' | t']."""
    import numpy as np

    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    T = p0.shape[0]
    n2 = np.cross(e1, e2)

    def cross_mat(v):
        z = np.zeros(T)
        return np.stack(
            [
                np.stack([z, -v[:, 2], v[:, 1]], -1),
                np.stack([v[:, 2], z, -v[:, 0]], -1),
                np.stack([-v[:, 1], v[:, 0], z], -1),
            ],
            -2,
        )  # [T, 3, 3] with M @ o = v x o

    E2 = cross_mat(e2)
    E1 = cross_mat(e1)

    W = np.zeros((T, 4, 16), np.float64)
    # det column: phi_d . (-n2)
    W[:, 0, 0:3] = -n2
    # u' column: d.(E2 o) - d.(e2 x p0)
    W[:, 1, 0:3] = -np.cross(e2, p0)
    W[:, 1, 6:15] = E2.reshape(T, 9)  # d_i o_k coeff = E2[i, k]
    # v' column: -d.(E1 o) + d.(e1 x p0)
    W[:, 2, 0:3] = np.cross(e1, p0)
    W[:, 2, 6:15] = -E1.reshape(T, 9)
    # t' column: o.n2 - p0.n2
    W[:, 3, 3:6] = n2
    W[:, 3, 15] = -np.einsum("ij,ij->i", p0, n2)

    # group rows [det(T), u'(T), v'(T), t'(T)]
    Wg = np.concatenate([W[:, 0], W[:, 1], W[:, 2], W[:, 3]], axis=0)  # [4T, 16]
    return np.ascontiguousarray(Wg.astype(np.float32))  # [4T, 16]


MXU_LANES = 256  # rays per grid step (lane dim of the transposed formulation)


def _mxu_kernel(w_ref, fiota_ref, rays_ref, out_ref, *, t_pad: int):
    """Transposed formulation: U^T = W [4T, 16] @ phi^T [16, B].

    Rays arrive as ROWS [8, B] (dx dy dz ox oy oz maxt 1) — the natural
    lane-major layout. The earlier [B, 16] phi / [B, 8] rays operands
    forced a {1,0} layout that leaked 42-128x sublane padding onto
    unrelated [N, 1]/[N, 3] temps inside the render scan (977 MB each ->
    HBM OOM at 500^2 renders)."""
    T = t_pad
    rays = rays_ref[...]                      # [8, B]
    t_max = rays[6:7]                         # [1, B]
    phi_t = jnp.concatenate(
        [
            rays[0:3],                        # d
            rays[3:6],                        # o
            rays[0:1] * rays[3:6],            # dx * o
            rays[1:2] * rays[3:6],            # dy * o
            rays[2:3] * rays[3:6],            # dz * o
            rays[7:8],                        # 1
        ],
        axis=0,
    )                                         # [16, B]

    U = jnp.dot(w_ref[...], phi_t,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # [4T, B]
    det = U[0:T]
    up = U[T:2 * T]
    vp = U[2 * T:3 * T]
    tp = U[3 * T:4 * T]

    ok = jnp.abs(det) > 1e-12
    sd = jnp.where(det >= 0.0, 1.0, -1.0)
    adet = jnp.abs(det)
    us = up * sd
    vs = vp * sd
    ts = tp * sd
    inv = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, adet, 1.0)
    t = ts * inv
    hit = (
        ok & (us >= 0.0) & (vs >= 0.0) & (us + vs <= adet)
        & (ts > 0.0) & (t < t_max)
    )
    t_h = jnp.where(hit, t, jnp.float32(3.4e38))
    t_best = jnp.min(t_h, axis=0, keepdims=True)           # [1, B]
    best = jnp.argmin(t_h, axis=0, keepdims=True)          # [1, B]
    found = t_best < t_max
    onehot = jax.lax.broadcasted_iota(jnp.int32, t_h.shape, 0) == best
    u_best = jnp.sum(jnp.where(onehot, us * inv, 0.0), axis=0, keepdims=True)
    v_best = jnp.sum(jnp.where(onehot, vs * inv, 0.0), axis=0, keepdims=True)
    # float prim index via host-provided index column (Mosaic rejects both
    # vector sitofp and float iota inside the kernel)
    best_f = jnp.sum(
        jnp.where(onehot, fiota_ref[...], 0.0), axis=0, keepdims=True
    )

    out_ref[...] = jnp.concatenate(
        [
            jnp.where(found, t_best, t_max),
            jnp.where(found, best_f, -1.0),
            u_best,
            v_best,
        ],
        axis=0,
    )                                          # [4, B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_intersect_mxu(tri_mxu, o, d, maxt, interpret: bool = False):
    """Closest-hit via the MXU matmul formulation.

    tri_mxu: [4*T_pad, 16] from pack_tri_mxu (T_pad a multiple of 128;
    padding rows are all-zero -> det = 0 -> never hit).
    """
    n = o.shape[0]
    four_t = tri_mxu.shape[0]
    t_pad = four_t // 4
    pad = (-n) % MXU_LANES
    npad = n + pad

    def prep(x):
        return jnp.pad(x, (0, pad))

    # rays as ROWS [8, npad] — lane-major, no layout constraint leaks
    rays = jnp.stack(
        [
            prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
            prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
            jnp.ones((npad,), jnp.float32),
        ],
        axis=0,
    )

    fiota = jnp.arange(t_pad, dtype=jnp.float32)[:, None]  # [T, 1]

    outs = pl.pallas_call(
        functools.partial(_mxu_kernel, t_pad=t_pad),
        grid=(npad // MXU_LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, MXU_LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, MXU_LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, npad), jnp.float32),
        interpret=interpret,
    )(tri_mxu, fiota, rays)

    t = outs[0, :n]
    prim = outs[1, :n].astype(jnp.int32)
    u = outs[2, :n]
    v = outs[3, :n]
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


# ---------------------------------------------------------------------------
# Packet BVH traversal
#
# Mesh-heavy scenes (> BRUTE_FORCE_MAX_FACES) can't brute-force every
# triangle, and the XLA skip-link walk pays 4+ random gathers per while-loop
# step (the measured 15-60 ms/2M-lane pattern). This kernel traverses the
# skip-link BVH ONCE PER RAY TILE [SUB_B, 128]: the node/triangle tables are
# VMEM-resident, the traversal state is a single scalar node index, and every
# AABB/triangle test is a full-tile vector op. A tile descends into a subtree
# iff ANY lane's slab test passes — speculative packet traversal (the
# classic coherent-ray strategy of Embree's packet mode, re-shaped for the
# TPU's tile-uniform control flow). Leaf triangles are re-ordered contiguous
# (scene/bvh.pack_packet_bvh) so the inner loop is `tri[first+k]` — no
# indirection, no gathers anywhere.
# ---------------------------------------------------------------------------

SUB_B = 16  # rays per packet tile row-block (2048 rays): small
            # enough that camera/bounce lanes stay spatially coherent, big
            # enough to keep the VPU busy


def _signed_eps(x):
    return jnp.where(jnp.abs(x) > 1e-12, x, jnp.where(x >= 0, 1e-12, -1e-12))


def _bvh_kernel(node_ref, tri_ref, ox, oy, oz, dx, dy, dz, mt,
                t_out, p_out, u_out, v_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    inv_dx = 1.0 / _signed_eps(d_x)
    inv_dy = 1.0 / _signed_eps(d_y)
    inv_dz = 1.0 / _signed_eps(d_z)
    n_rows = tri_ref.shape[0]

    def tri_test(row, t_best, prim, u_best, v_best, extra_ok=None):
        tr = tri_ref[row]
        p0x, p0y, p0z = tr[0], tr[1], tr[2]
        e1x, e1y, e1z = tr[3], tr[4], tr[5]
        e2x, e2y, e2z = tr[6], tr[7], tr[8]
        idf = tr[9]
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        tvx = o_x - p0x
        tvy = o_y - p0y
        tvz = o_z - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (
            t < t_best
        )
        if extra_ok is not None:
            hit = hit & extra_ok
        t_best = jnp.where(hit, t, t_best)
        prim = jnp.where(hit, idf, prim)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
        return t_best, prim, u_best, v_best

    def tri_body2(k, carry):
        # two triangles per trip: their ~10 serial scalar row-loads overlap
        first, t_best, prim, u_best, v_best = carry
        r = first + 2 * k
        t_best, prim, u_best, v_best = tri_test(
            r, t_best, prim, u_best, v_best
        )
        t_best, prim, u_best, v_best = tri_test(
            jnp.minimum(r + 1, n_rows - 1), t_best, prim, u_best, v_best
        )
        return first, t_best, prim, u_best, v_best

    def cond(c):
        return c[0] >= 0

    def body(c):
        node, t_best, prim, u_best, v_best = c
        nd = node_ref[node]
        tx0 = (nd[0] - o_x) * inv_dx
        tx1 = (nd[3] - o_x) * inv_dx
        ty0 = (nd[1] - o_y) * inv_dy
        ty1 = (nd[4] - o_y) * inv_dy
        tz0 = (nd[2] - o_z) * inv_dz
        tz1 = (nd[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        bh = (near <= far) & (far > 0.0) & (near < t_best)
        any_hit = jnp.any(bh)

        first = nd[6].astype(jnp.int32)
        count = nd[7].astype(jnp.int32)
        miss = nd[8].astype(jnp.int32)
        is_leaf = count > 0
        live = is_leaf & any_hit
        pairs = jnp.where(live, (count + 1) // 2, 0)
        # odd counts read one row past the run: leaves are contiguous, so
        # that row is the next leaf's first triangle — retesting it is
        # harmless (same best-hit), and min(r+1, n_rows-1) bounds the table
        _, t_best, prim, u_best, v_best = jax.lax.fori_loop(
            0, pairs, tri_body2, (first, t_best, prim, u_best, v_best)
        )
        node = jnp.where(any_hit & jnp.logical_not(is_leaf), first, miss)
        return node, t_best, prim, u_best, v_best

    t_best = mt[...]
    init = (
        jnp.int32(0),
        t_best,
        jnp.full((SUB_B, LANES), -1.0, jnp.float32),
        jnp.zeros((SUB_B, LANES), jnp.float32),
        jnp.zeros((SUB_B, LANES), jnp.float32),
    )
    _, t_best, prim, u_best, v_best = jax.lax.while_loop(cond, body, init)
    t_out[...] = t_best
    p_out[...] = prim
    u_out[...] = u_best
    v_out[...] = v_best


def _bvh_anyhit_kernel(node_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                       mt, occ_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    t_max = mt[...]
    inv_dx = 1.0 / _signed_eps(d_x)
    inv_dy = 1.0 / _signed_eps(d_y)
    inv_dz = 1.0 / _signed_eps(d_z)
    n_rows = tri_ref.shape[0]

    def tri_test(row, occ):
        tr = tri_ref[row]
        p0x, p0y, p0z = tr[0], tr[1], tr[2]
        e1x, e1y, e1z = tr[3], tr[4], tr[5]
        e2x, e2y, e2z = tr[6], tr[7], tr[8]
        pvx = d_y * e2z - d_z * e2y
        pvy = d_z * e2x - d_x * e2z
        pvz = d_x * e2y - d_y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = jnp.abs(det) > 1e-12
        inv_det = jnp.where(ok, 1.0, 0.0) / jnp.where(ok, det, 1.0)
        tvx = o_x - p0x
        tvy = o_y - p0y
        tvz = o_z - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (d_x * qvx + d_y * qvy + d_z * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (
            t < t_max
        )
        return jnp.where(hit, 1.0, occ)

    def tri_body2(k, carry):
        first, occ = carry
        r = first + 2 * k
        occ = tri_test(r, occ)
        occ = tri_test(jnp.minimum(r + 1, n_rows - 1), occ)
        return first, occ

    def cond(c):
        node, occ = c
        return (node >= 0) & jnp.logical_not(jnp.all(occ > 0.5))

    def body(c):
        node, occ = c
        nd = node_ref[node]
        tx0 = (nd[0] - o_x) * inv_dx
        tx1 = (nd[3] - o_x) * inv_dx
        ty0 = (nd[1] - o_y) * inv_dy
        ty1 = (nd[4] - o_y) * inv_dy
        tz0 = (nd[2] - o_z) * inv_dz
        tz1 = (nd[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        bh = (near <= far) & (far > 0.0) & (near < t_max) & (occ < 0.5)
        any_hit = jnp.any(bh)

        first = nd[6].astype(jnp.int32)
        count = nd[7].astype(jnp.int32)
        miss = nd[8].astype(jnp.int32)
        is_leaf = count > 0
        pairs = jnp.where(is_leaf & any_hit, (count + 1) // 2, 0)
        _, occ = jax.lax.fori_loop(0, pairs, tri_body2, (first, occ))
        node = jnp.where(any_hit & jnp.logical_not(is_leaf), first, miss)
        return node, occ

    occ0 = jnp.zeros((SUB_B, LANES), jnp.float32)
    _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0), occ0))
    occ_out[...] = occ


# Chunk the wavefront so XLA's scoped-VMEM budget holds even when this call
# sits inside a render megakernel: at full 2M lanes the [N/128, 128] ray and
# hit buffers get pinned to VMEM around the custom call (observed 22.4 MB >
# the 16 MB scoped limit). 256k-lane chunks keep the footprint ~13 MB.
CHUNK_B = 1 << 18


def _prep_rays_b(o, d, maxt, blk):
    n = o.shape[0]
    pad = (-n) % blk
    npad = n + pad

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(npad // LANES, LANES)

    args = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
    ]
    return args, npad


def _chunked_bvh_call(pbvh, o, d, maxt, kernel, n_out, interpret):
    """Pad + chunk rays, run the packet kernel per chunk via lax.map."""
    n = o.shape[0]
    blk = SUB_B * LANES if n <= CHUNK_B else CHUNK_B
    args, npad = _prep_rays_b(o, d, maxt, blk)
    rows = blk // LANES

    ray_spec = pl.BlockSpec((SUB_B, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(xs):
        return pl.pallas_call(
            kernel,
            grid=(rows // SUB_B,),
            in_specs=[tbl_spec] * 2 + [ray_spec] * 7,
            out_specs=[ray_spec] * n_out if n_out > 1 else ray_spec,
            out_shape=(
                [jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * n_out
                if n_out > 1
                else jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
            ),
            interpret=interpret,
        )(pbvh.nodes, pbvh.tri, *xs)

    if npad <= blk:
        outs = call(args)
    else:
        # static Python loop over chunks: lax.map's stacked [k, rows, 128]
        # xs get pinned to scoped VMEM around the custom call (40 MB > the
        # 16 MB limit at 1M lanes / 82k faces); k is small (wavefront caps
        # keep it <= 8) so unrolling costs little HLO
        k = npad // blk
        parts = []
        for i in range(k):
            chunk = tuple(a[i * rows:(i + 1) * rows] for a in args)
            parts.append(call(chunk))
        if n_out > 1:
            outs = [
                jnp.concatenate([p[j] for p in parts], axis=0)
                for j in range(n_out)
            ]
        else:
            outs = jnp.concatenate(parts, axis=0)
    return outs, npad


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bvh_intersect(pbvh, o, d, maxt, interpret: bool = False):
    """Closest-hit packet traversal over a PacketBVH.

    Returns (t [N], prim [N] i32 (-1 = miss), u [N], v [N]).
    """
    n = o.shape[0]
    outs, npad = _chunked_bvh_call(
        pbvh, o, d, maxt, _bvh_kernel, 4, interpret
    )
    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bvh_occluded(pbvh, o, d, maxt, interpret: bool = False):
    """Any-hit packet traversal (True = occluded within maxt)."""
    n = o.shape[0]
    occ, npad = _chunked_bvh_call(
        pbvh, o, d, maxt, _bvh_anyhit_kernel, 1, interpret
    )
    return occ.reshape(npad)[:n] > 0.5


# ---------------------------------------------------------------------------
# Reformulated brute-force kernels ("q" = precomputed quantities)
#
# Moller-Trumbore re-associated around per-triangle constants so the kernel
# does no cross products and no division in the triangle loop:
#   det   = -d . n2                 n2 = e1 x e2
#   u*det = (o x d) . e2 + d . m2   m2 = p0 x e2
#   v*det = -[(o x d) . e1 + d . m1]   m1 = p0 x e1
#   t*det = o . n2 - k              k  = p0 . n2
# (o x d) is computed once per ray tile; sign logic replaces the per-triangle
# inv_det division; the running best hit is tracked as the PAIR (t*det, |det|)
# compared by cross-multiplication, with a single division per ray at the end.
# ~19 FMA per (ray, triangle) vs ~35 + a division for the classic form.
#
# Conditioning: the products (o x d).e2 etc. lose ~log2(|o| / |o - p0|) bits,
# so rays and triangles are expressed relative to a per-scene anchor (the
# geometry AABB centre) — pack_tri_q bakes the anchor into m1/m2/k and the
# wrappers subtract it from ray origins.
# ---------------------------------------------------------------------------


def pack_tri_q(p0, p1, p2, anchor=None):
    """Host-side: [T, >=3] vertex arrays -> ([T_pad, 16] rows, anchor [3]).

    Rows: e1(3) e2(3) m1(3) m2(3) n2(3) k(1); zero padding rows have
    n2 = 0 -> det = 0 -> never hit. T_pad is a multiple of 64 so any
    unroll factor up to 64 divides it."""
    import numpy as np

    p0 = np.asarray(p0, np.float64).reshape(-1, 3)
    p1 = np.asarray(p1, np.float64).reshape(-1, 3)
    p2 = np.asarray(p2, np.float64).reshape(-1, 3)
    if anchor is None:
        if p0.shape[0] == 0:
            anchor = np.zeros(3)
        else:
            lo = np.minimum(p0.min(0), np.minimum(p1.min(0), p2.min(0)))
            hi = np.maximum(p0.max(0), np.maximum(p1.max(0), p2.max(0)))
            anchor = (lo + hi) * 0.5
    a0 = p0 - anchor
    e1 = p1 - p0
    e2 = p2 - p0
    n2 = np.cross(e1, e2)
    m1 = np.cross(a0, e1)
    m2 = np.cross(a0, e2)
    k = np.einsum("ij,ij->i", a0, n2)
    rows = np.concatenate([e1, e2, m1, m2, n2, k[:, None]], axis=-1)
    pad = (-rows.shape[0]) % 64
    rows = np.concatenate([rows, np.zeros((pad, 16))], axis=0)
    return rows.astype(np.float32), np.asarray(anchor, np.float32)


Q_UNROLL = 16    # closest-hit: measured knee of the unroll sweep (35.6 ms/M
                 # at 2892 tris vs 58 at 2-way; deeper shows no further gain)
Q_UNROLL_A = 32  # any-hit has no best-update chain; keeps improving to 32


def _q_kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt,
              t_out, p_out, u_out, v_out, *, n_tris: int):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x

    ts_b = mt[...]
    ad_b = jnp.ones((SUB, LANES), jnp.float32)
    prim = jnp.full((SUB, LANES), -1.0, jnp.float32)
    us_b = jnp.zeros((SUB, LANES), jnp.float32)
    vs_b = jnp.zeros((SUB, LANES), jnp.float32)

    # u,v ARE tracked in-kernel (2 selects/tri): recovering them outside
    # via a [N, 16] jnp.take + recompute measured 2x SLOWER end-to-end on
    # tiny scenes — the XLA gather materializes inside the bounce scan and
    # breaks its fusion (gratings 17.5 -> 7.1 M samples/s).
    def body(ti, carry):
        ts_b, ad_b, prim, us_b, vs_b = carry
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
        us_b = jnp.where(hit, us, us_b)
        vs_b = jnp.where(hit, vs, vs_b)
        return ts_b, ad_b, prim, us_b, vs_b

    def bodyu(i, carry):
        for k in range(Q_UNROLL):
            carry = body(Q_UNROLL * i + k, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, n_tris // Q_UNROLL, bodyu, (ts_b, ad_b, prim, us_b, vs_b)
    )
    ts_b, ad_b, prim, us_b, vs_b = carry
    inv = 1.0 / ad_b
    t_out[...] = ts_b * inv
    p_out[...] = prim
    u_out[...] = us_b * inv
    v_out[...] = vs_b * inv


def _q_anyhit_kernel(tri_ref, ox, oy, oz, dx, dy, dz, mt, occ_out, *,
                     n_tris: int):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x
    t_max = mt[...]
    occ = jnp.zeros((SUB, LANES), jnp.float32)

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
        for k in range(Q_UNROLL_A):
            occ = body(Q_UNROLL_A * i + k, occ)
        return occ

    occ = jax.lax.fori_loop(0, n_tris // Q_UNROLL_A, bodyu, occ)
    occ_out[...] = occ


# ---------------------------------------------------------------------------
# Cluster-gated brute force (mini-TLAS)
#
# Mid-size scenes (1k-32k faces) sit in a gap: pure brute force tests every
# triangle against every ray (2892 tests/ray on cbox.xml caps throughput at
# ~2 M samples/s even at full VPU), while the packet BVH's per-tile tree walk
# + coherence argsort only pays off for big meshes. This kernel scans the
# scene's TREELETS (scene/bvh.pack_clusters: SAH subtrees of <= 64 tris)
# sequentially: each [SUB_C, 128] ray tile slab-tests the treelet AABB with
# pure vector ops and `pl.when`-skips the whole triangle loop when no lane
# hits — tile-uniform control flow, zero gathers (cluster rows are
# contiguous), and the same precomputed-quantities triangle math as the q
# kernels. Reference role: the two-level Embree scene
# (src/render/scene_embree.inl) for moderate instance counts.
# ---------------------------------------------------------------------------

SUB_C = 64  # rays per cluster-kernel tile (8192 rays). Round-5 sweep
            # (tools/experiments/README.md): the per-tile SEQUENTIAL
            # super/cluster loop overhead dominates the union-tightening a
            # smaller tile buys — 64 beats 16 by 1.7-2.8x on every
            # workload (mesh82k bounce 57->34, cbox camera 29.7->10.6,
            # cbox shadow 18->7.7 ms/M); 8 is 2x WORSE than 16 and
            # 128/256 regress the camera-ray rows (VMEM working set).


def _clu_kernel(box_ref, tri_ref, ox, oy, oz, dx, dy, dz, mt,
                t_out, p_out, u_out, v_out, ad_ref):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x
    inv_dx = 1.0 / _signed_eps(d_x)
    inv_dy = 1.0 / _signed_eps(d_y)
    inv_dz = 1.0 / _signed_eps(d_z)

    t_out[...] = mt[...]
    ad_ref[...] = jnp.ones((SUB_C, LANES), jnp.float32)
    p_out[...] = jnp.full((SUB_C, LANES), -1.0, jnp.float32)
    u_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)
    v_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)

    def cluster_body(ci, _):
        bx = box_ref[ci]
        ts_b = t_out[...]
        ad_b = ad_ref[...]
        tx0 = (bx[0] - o_x) * inv_dx
        tx1 = (bx[3] - o_x) * inv_dx
        ty0 = (bx[1] - o_y) * inv_dy
        ty1 = (bx[4] - o_y) * inv_dy
        tz0 = (bx[2] - o_z) * inv_dz
        tz1 = (bx[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        # t compare via cross-multiplication: t_best = ts_b / ad_b, ad_b > 0
        bh = (near <= far) & (far > 0.0) & (near * ad_b < ts_b)

        @pl.when(jnp.any(bh))
        def _():
            first = bx[6].astype(jnp.int32)
            trips = bx[7].astype(jnp.int32)

            def tri_body(k, carry):
                ts_b, ad_b, prim, us_b, vs_b = carry
                base = first + 8 * k  # CLU_UNROLL = 8 (bvh.pack_clusters)
                for j in range(8):
                    tr = tri_ref[base + j]
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
                        & (jnp.minimum(jnp.minimum(us, vs), ad - us - vs)
                           >= 0.0)
                        & (ts > 0.0) & (ts * ad_b < ts_b * ad)
                    )
                    ts_b = jnp.where(hit, ts, ts_b)
                    ad_b = jnp.where(hit, ad, ad_b)
                    prim = jnp.where(hit, tr[16], prim)
                    us_b = jnp.where(hit, us, us_b)
                    vs_b = jnp.where(hit, vs, vs_b)
                return ts_b, ad_b, prim, us_b, vs_b

            carry = (ts_b, ad_b, p_out[...], u_out[...], v_out[...])
            carry = jax.lax.fori_loop(0, trips, tri_body, carry)
            t_out[...] = carry[0]
            ad_ref[...] = carry[1]
            p_out[...] = carry[2]
            u_out[...] = carry[3]
            v_out[...] = carry[4]

        return 0

    jax.lax.fori_loop(0, box_ref.shape[0], cluster_body, 0)
    inv = 1.0 / ad_ref[...]
    t_out[...] = t_out[...] * inv
    u_out[...] = u_out[...] * inv
    v_out[...] = v_out[...] * inv


def _clu_anyhit_kernel(box_ref, tri_ref, ox, oy, oz, dx, dy, dz, mt,
                       occ_out):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x
    inv_dx = 1.0 / _signed_eps(d_x)
    inv_dy = 1.0 / _signed_eps(d_y)
    inv_dz = 1.0 / _signed_eps(d_z)
    t_max = mt[...]
    occ_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)

    def cluster_body(ci, _):
        bx = box_ref[ci]
        occ = occ_out[...]
        tx0 = (bx[0] - o_x) * inv_dx
        tx1 = (bx[3] - o_x) * inv_dx
        ty0 = (bx[1] - o_y) * inv_dy
        ty1 = (bx[4] - o_y) * inv_dy
        tz0 = (bx[2] - o_z) * inv_dz
        tz1 = (bx[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        bh = (near <= far) & (far > 0.0) & (near < t_max) & (occ < 0.5)

        @pl.when(jnp.any(bh))
        def _():
            first = bx[6].astype(jnp.int32)
            trips = bx[7].astype(jnp.int32)

            def tri_body(k, occ):
                base = first + 8 * k
                for j in range(8):
                    tr = tri_ref[base + j]
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
                        & (jnp.minimum(jnp.minimum(us, vs), ad - us - vs)
                           >= 0.0)
                        & (ts > 0.0) & (ts < t_max * ad)
                    )
                    occ = jnp.where(hit, 1.0, occ)
                return occ

            occ_out[...] = jax.lax.fori_loop(0, trips, tri_body, occ)

        return 0

    jax.lax.fori_loop(0, box_ref.shape[0], cluster_body, 0)


def _clu_call(ctab, o, d, maxt, kernel, n_out, interpret):
    n = o.shape[0]
    blk = SUB_C * LANES
    pad = (-n) % blk
    npad = n + pad
    o = o - ctab.anchor[None, :]

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(npad // LANES, LANES)

    args = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
    ]
    ray_spec = pl.BlockSpec((SUB_C, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(npad // blk,),
        in_specs=[tbl_spec] * 2 + [ray_spec] * 7,
        out_specs=[ray_spec] * n_out if n_out > 1 else ray_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)]
            * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)
        ),
        scratch_shapes=(
            [pltpu.VMEM((SUB_C, LANES), jnp.float32)] if n_out > 1 else []
        ),
        interpret=interpret,
    )(ctab.boxes, ctab.rows, *args)
    return outs, npad


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_intersect_clu(ctab, o, d, maxt, interpret: bool = False):
    """Closest-hit over a ClusterTable (treelet-gated brute force).

    Returns (t [N], prim [N] i32 (-1 = miss), u [N], v [N]); prim is the
    ORIGINAL primitive id (cluster rows carry it at column 16)."""
    n = o.shape[0]
    outs, npad = _clu_call(ctab, o, d, maxt, _clu_kernel, 4, interpret)
    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_occluded_clu(ctab, o, d, maxt, interpret: bool = False):
    """Any-hit occlusion over a ClusterTable (True = occluded)."""
    n = o.shape[0]
    occ, npad = _clu_call(ctab, o, d, maxt, _clu_anyhit_kernel, 1, interpret)
    return occ.reshape(npad)[:n] > 0.5


# ---------------------------------------------------------------------------
# Two-level cluster kernel (clu2) — round-4 big-mesh accelerator
#
# The flat cluster scan's per-tile cost is O(K) sequential AABB tests, which
# caps it at mid-size scenes (~1300 boxes/tile at 82k faces). clu2 adds a
# SUPER level (bvh.pack_clusters2: CLU2_SUPER consecutive DFS treelets under
# one AABB) so a tile tests ~K/16 super boxes and descends only where some
# lane enters, and packs 4 triangles per 128-lane VMEM row (4x less VMEM
# than the [R, 32] layout, so 82k-face scenes stay fully VMEM-resident).
# Same q-formulation triangle math; same tile-uniform control flow; zero
# gathers. Reference role: two-level Embree scenes + its BVH packets
# (src/render/scene_embree.inl).
# ---------------------------------------------------------------------------


def _clu2_common(ox, oy, oz, dx, dy, dz):
    o_x, o_y, o_z = ox[...], oy[...], oz[...]
    d_x, d_y, d_z = dx[...], dy[...], dz[...]
    c_x = o_y * d_z - o_z * d_y
    c_y = o_z * d_x - o_x * d_z
    c_z = o_x * d_y - o_y * d_x
    inv_dx = 1.0 / _signed_eps(d_x)
    inv_dy = 1.0 / _signed_eps(d_y)
    inv_dz = 1.0 / _signed_eps(d_z)
    return (o_x, o_y, o_z, d_x, d_y, d_z, c_x, c_y, c_z,
            inv_dx, inv_dy, inv_dz)


def _clu2_kernel(sup_ref, box_ref, tri_ref, ox, oy, oz, dx, dy, dz, mt,
                 t_out, p_out, u_out, v_out, ad_ref):
    (o_x, o_y, o_z, d_x, d_y, d_z, c_x, c_y, c_z,
     inv_dx, inv_dy, inv_dz) = _clu2_common(ox, oy, oz, dx, dy, dz)

    t_out[...] = mt[...]
    ad_ref[...] = jnp.ones((SUB_C, LANES), jnp.float32)
    p_out[...] = jnp.full((SUB_C, LANES), -1.0, jnp.float32)
    u_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)
    v_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)

    def slab(bx, ts_b, ad_b):
        tx0 = (bx[0] - o_x) * inv_dx
        tx1 = (bx[3] - o_x) * inv_dx
        ty0 = (bx[1] - o_y) * inv_dy
        ty1 = (bx[4] - o_y) * inv_dy
        tz0 = (bx[2] - o_z) * inv_dz
        tz1 = (bx[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        return (near <= far) & (far > 0.0) & (near * ad_b < ts_b)

    def super_body(si, _):
        sb = sup_ref[si]
        bh_s = slab(sb, t_out[...], ad_ref[...])

        @pl.when(jnp.any(bh_s))
        def _():
            c0 = sb[6].astype(jnp.int32)
            ncl = sb[7].astype(jnp.int32)

            def cluster_body(off, _):
                bx = box_ref[c0 + off]
                ts_b = t_out[...]
                ad_b = ad_ref[...]
                bh = slab(bx, ts_b, ad_b)

                @pl.when(jnp.any(bh))
                def _():
                    first = bx[6].astype(jnp.int32)
                    nrows = bx[7].astype(jnp.int32)

                    def tri_body(k, carry):
                        ts_b, ad_b, prim, us_b, vs_b = carry
                        row = tri_ref[first + k]
                        for j in range(4):
                            b = 32 * j
                            det = -(d_x * row[b + 12] + d_y * row[b + 13]
                                    + d_z * row[b + 14])
                            up = (c_x * row[b + 3] + c_y * row[b + 4]
                                  + c_z * row[b + 5] + d_x * row[b + 9]
                                  + d_y * row[b + 10] + d_z * row[b + 11])
                            vp = -(c_x * row[b + 0] + c_y * row[b + 1]
                                   + c_z * row[b + 2] + d_x * row[b + 6]
                                   + d_y * row[b + 7] + d_z * row[b + 8])
                            tp = (o_x * row[b + 12] + o_y * row[b + 13]
                                  + o_z * row[b + 14] - row[b + 15])
                            s = jnp.where(det >= 0.0, 1.0, -1.0)
                            ad = det * s
                            us = up * s
                            vs = vp * s
                            ts = tp * s
                            hit = (
                                (ad > 1e-12)
                                & (jnp.minimum(jnp.minimum(us, vs),
                                               ad - us - vs) >= 0.0)
                                & (ts > 0.0) & (ts * ad_b < ts_b * ad)
                            )
                            ts_b = jnp.where(hit, ts, ts_b)
                            ad_b = jnp.where(hit, ad, ad_b)
                            prim = jnp.where(hit, row[b + 16], prim)
                            us_b = jnp.where(hit, us, us_b)
                            vs_b = jnp.where(hit, vs, vs_b)
                        return ts_b, ad_b, prim, us_b, vs_b

                    carry = (ts_b, ad_b, p_out[...], u_out[...], v_out[...])
                    carry = jax.lax.fori_loop(0, nrows, tri_body, carry)
                    t_out[...] = carry[0]
                    ad_ref[...] = carry[1]
                    p_out[...] = carry[2]
                    u_out[...] = carry[3]
                    v_out[...] = carry[4]

                return 0

            jax.lax.fori_loop(0, ncl, cluster_body, 0)

        return 0

    jax.lax.fori_loop(0, sup_ref.shape[0], super_body, 0)
    inv = 1.0 / ad_ref[...]
    t_out[...] = t_out[...] * inv
    u_out[...] = u_out[...] * inv
    v_out[...] = v_out[...] * inv


def _clu2_anyhit_kernel(sup_ref, box_ref, tri_ref, ox, oy, oz, dx, dy, dz,
                        mt, occ_out):
    (o_x, o_y, o_z, d_x, d_y, d_z, c_x, c_y, c_z,
     inv_dx, inv_dy, inv_dz) = _clu2_common(ox, oy, oz, dx, dy, dz)
    t_max = mt[...]
    occ_out[...] = jnp.zeros((SUB_C, LANES), jnp.float32)

    def slab(bx, occ):
        tx0 = (bx[0] - o_x) * inv_dx
        tx1 = (bx[3] - o_x) * inv_dx
        ty0 = (bx[1] - o_y) * inv_dy
        ty1 = (bx[4] - o_y) * inv_dy
        tz0 = (bx[2] - o_z) * inv_dz
        tz1 = (bx[5] - o_z) * inv_dz
        near = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        far = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        return (near <= far) & (far > 0.0) & (near < t_max) & (occ < 0.5)

    def super_body(si, _):
        sb = sup_ref[si]
        bh_s = slab(sb, occ_out[...])

        @pl.when(jnp.any(bh_s))
        def _():
            c0 = sb[6].astype(jnp.int32)
            ncl = sb[7].astype(jnp.int32)

            def cluster_body(off, _):
                bx = box_ref[c0 + off]
                occ = occ_out[...]
                bh = slab(bx, occ)

                @pl.when(jnp.any(bh))
                def _():
                    first = bx[6].astype(jnp.int32)
                    nrows = bx[7].astype(jnp.int32)

                    def tri_body(k, occ):
                        row = tri_ref[first + k]
                        for j in range(4):
                            b = 32 * j
                            det = -(d_x * row[b + 12] + d_y * row[b + 13]
                                    + d_z * row[b + 14])
                            up = (c_x * row[b + 3] + c_y * row[b + 4]
                                  + c_z * row[b + 5] + d_x * row[b + 9]
                                  + d_y * row[b + 10] + d_z * row[b + 11])
                            vp = -(c_x * row[b + 0] + c_y * row[b + 1]
                                   + c_z * row[b + 2] + d_x * row[b + 6]
                                   + d_y * row[b + 7] + d_z * row[b + 8])
                            tp = (o_x * row[b + 12] + o_y * row[b + 13]
                                  + o_z * row[b + 14] - row[b + 15])
                            s = jnp.where(det >= 0.0, 1.0, -1.0)
                            ad = det * s
                            us = up * s
                            vs = vp * s
                            ts = tp * s
                            hit = (
                                (ad > 1e-12)
                                & (jnp.minimum(jnp.minimum(us, vs),
                                               ad - us - vs) >= 0.0)
                                & (ts > 0.0) & (ts < t_max * ad)
                            )
                            occ = jnp.where(hit, 1.0, occ)
                        return occ

                    occ_out[...] = jax.lax.fori_loop(
                        0, nrows, tri_body, occ)

                return 0

            jax.lax.fori_loop(0, ncl, cluster_body, 0)

        return 0

    jax.lax.fori_loop(0, sup_ref.shape[0], super_body, 0)


def _clu2_call(ctab2, o, d, maxt, kernel, n_out, interpret):
    n = o.shape[0]
    blk = SUB_C * LANES
    pad = (-n) % blk
    npad = n + pad
    o = o - ctab2.anchor[None, :]

    def prep(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(npad // LANES, LANES)

    args = [
        prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
        prep(d[:, 0]), prep(d[:, 1]), prep(d[:, 2]),
        prep(jnp.where(jnp.isfinite(maxt), maxt, jnp.float32(3.4e38))),
    ]
    ray_spec = pl.BlockSpec((SUB_C, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(npad // blk,),
        in_specs=[tbl_spec] * 3 + [ray_spec] * 7,
        out_specs=[ray_spec] * n_out if n_out > 1 else ray_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)]
            * n_out
            if n_out > 1
            else jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)
        ),
        scratch_shapes=(
            [pltpu.VMEM((SUB_C, LANES), jnp.float32)] if n_out > 1 else []
        ),
        interpret=interpret,
    )(ctab2.supers, ctab2.boxes, ctab2.rows, *args)
    return outs, npad


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_intersect_clu2(ctab2, o, d, maxt, interpret: bool = False):
    """Closest-hit over a ClusterTable2 (two-level treelet gating).

    Returns (t [N], prim [N] i32 (-1 = miss), u [N], v [N])."""
    n = o.shape[0]
    outs, npad = _clu2_call(ctab2, o, d, maxt, _clu2_kernel, 4, interpret)
    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_occluded_clu2(ctab2, o, d, maxt, interpret: bool = False):
    """Any-hit occlusion over a ClusterTable2 (True = occluded)."""
    n = o.shape[0]
    occ, npad = _clu2_call(ctab2, o, d, maxt, _clu2_anyhit_kernel, 1,
                           interpret)
    return occ.reshape(npad)[:n] > 0.5


@functools.partial(jax.jit, static_argnames=("interpret", "n_tris"))
def pallas_intersect_q(tri_q, anchor, o, d, maxt, interpret: bool = False,
                       n_tris: int | None = None):
    """Closest-hit over the precomputed-quantities table (pack_tri_q).

    Returns (t [N], prim [N] i32 (-1 = miss), u [N], v [N])."""
    n = o.shape[0]
    if n_tris is None:
        n_tris = tri_q.shape[0]
    n_tris = min(-(-n_tris // Q_UNROLL) * Q_UNROLL, tri_q.shape[0])
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
        functools.partial(_q_kernel, n_tris=n_tris),
        grid=(npad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)] * 4,
        interpret=interpret,
    )(tri_q, *args)
    t, p, u, v = [x.reshape(npad)[:n] for x in outs]
    prim = p.astype(jnp.int32)
    return jnp.where(prim >= 0, t, jnp.inf), prim, u, v


@functools.partial(jax.jit, static_argnames=("interpret", "n_tris"))
def pallas_occluded_q(tri_q, anchor, o, d, maxt, interpret: bool = False,
                      n_tris: int | None = None):
    """Any-hit occlusion test over the pack_tri_q table."""
    n = o.shape[0]
    if n_tris is None:
        n_tris = tri_q.shape[0]
    n_tris = min(-(-n_tris // Q_UNROLL_A) * Q_UNROLL_A, tri_q.shape[0])
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
    occ = pl.pallas_call(
        functools.partial(_q_anyhit_kernel, n_tris=n_tris),
        grid=(npad // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32),
        interpret=interpret,
    )(tri_q, *args)
    return occ.reshape(npad)[:n] > 0.5
