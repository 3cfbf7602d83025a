"""q-kernel vs classic brute: correctness + fold-proof speed on cbox.xml
bounce rays (the render's dominant ray class)."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip

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
tri_q, anchor = ip.pack_tri_q(p0, p1, p2)
tri_q = jnp.asarray(tri_q); anchor = jnp.asarray(anchor)

brute = jax.jit(lambda o, d, mt: ip.pallas_intersect(geo.tri_isect, o, d, mt, n_tris=geo.n_faces))
bq = jax.jit(lambda o, d, mt: ip.pallas_intersect_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))
brute_a = jax.jit(lambda o, d, mt: ip.pallas_occluded(geo.tri_isect, o, d, mt, n_tris=geo.n_faces))
bq_a = jax.jit(lambda o, d, mt: ip.pallas_occluded_q(tri_q, anchor, o, d, mt, n_tris=geo.n_faces))

K = 8
def rep_c(fn):
    def f(o, d, mt):
        for _ in range(K):
            t, p, u, v = fn(o, d, mt)
            o = o * (1.0 + 1e-38 * t[:, None])  # fold-proof feedback
        return t, p, u, v
    return jax.jit(f)
def rep_a(fn):
    def f(o, d, mt):
        for _ in range(K):
            occ = fn(o, d, mt)
            mt = mt + occ.astype(jnp.float32) * 1e-35
        return occ
    return jax.jit(f)
def timeit(g, *args):
    r = jax.block_until_ready(g(*args))
    t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / K / (N / 1e6) * 1e3  # ms/M

g_br, g_bq = rep_c(brute), rep_c(bq)
g_ba, g_qa = rep_a(brute_a), rep_a(bq_a)

lp = np.array([0.0, 0.99, 0.0])
alive = np.ones(N, bool)
for depth in range(4):
    oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
    # correctness first (single calls)
    t0_, p0_, u0_, v0_ = [np.asarray(z) for z in brute(oj, dj, maxt)]
    t1_, p1_, u1_, v1_ = [np.asarray(z) for z in bq(oj, dj, maxt)]
    both = np.isfinite(t0_) & np.isfinite(t1_)
    pm = (p0_ == p1_).mean()
    terr = np.abs(t0_[both] - t1_[both]) / np.maximum(np.abs(t0_[both]), 1e-6)
    same_prim = both & (p0_ == p1_)
    uverr = max(np.abs(u0_[same_prim] - u1_[same_prim]).max(initial=0),
                np.abs(v0_[same_prim] - v1_[same_prim]).max(initial=0))
    t_br = timeit(g_br, oj, dj, maxt)
    t_bq = timeit(g_bq, oj, dj, maxt)
    # shadow rays toward the light
    hit = np.isfinite(t0_) & (p0_ >= 0) & alive
    hp = o + np.where(np.isfinite(t0_), t0_, 2.0)[:, None] * d
    dsh = lp - hp; dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
    dsh = dsh / np.maximum(dist, 1e-9)
    osh = np.where(hit[:, None], hp + 1e-4 * dsh, 1e8)
    msh = jnp.asarray(np.where(hit, dist[:, 0] * 0.999, -1.0), jnp.float32)
    oshj = jnp.asarray(osh, jnp.float32); dshj = jnp.asarray(dsh, jnp.float32)
    oc0 = np.asarray(brute_a(oshj, dshj, msh))
    oc1 = np.asarray(bq_a(oshj, dshj, msh))
    am = (oc0 == oc1).mean()
    t_ba = timeit(g_ba, oshj, dshj, msh)
    t_qa = timeit(g_qa, oshj, dshj, msh)
    print(f"depth {depth}: prim-match {pm:.5f} t-relerr max {terr.max(initial=0):.2e} "
          f"uv-err {uverr:.2e} occ-match {am:.5f} | closest classic={t_br:6.1f} q={t_bq:6.1f} "
          f"| anyhit classic={t_ba:6.1f} q={t_qa:6.1f} ms/M")
    # next bounce
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
