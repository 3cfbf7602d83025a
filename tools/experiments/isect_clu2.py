"""clu2 (two-level treelet kernel) vs packet BVH / q brute on TPU.

Workloads: 82k-face sphere (camera scanline rays, morton-sorted bounce
rays, shadow rays) and cbox.xml 2892 faces (the mid-size routing case)."""
import os
_args = os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _args:
    os.environ["LIBTPU_INIT_ARGS"] = (_args + " --xla_tpu_scoped_vmem_limit_kib=65536").strip()

import time
import jax, jax.numpy as jnp
import numpy as np

import mitsuba3_plt_tpu as mi
import mitsuba3_plt_tpu.ops.intersect_pallas as ip
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.scene import shape as shp
from mitsuba3_plt_tpu.scene.bvh import pack_clusters2

K = 4


def timeit(g, *args, n=None):
    r = jax.block_until_ready(g(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K / (n / 1e6) * 1e3  # ms/M rays


def rep_c(fn):
    def f(o, d, mt):
        for _ in range(K):
            out = fn(o, d, mt)
            t = out[0]
            o = o * (1.0 + 1e-38 * t[:, None])
        return out
    return jax.jit(f)


def rep_a(fn):
    def f(o, d, mt):
        for _ in range(K):
            occ = fn(o, d, mt)
            mt = mt + occ.astype(jnp.float32) * 1e-35
        return occ
    return jax.jit(f)


def bench_scene(name, scene, o_cam, d_cam, light_p, n_depths=3):
    geo = scene.geo
    ct2 = pack_clusters2(scene.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2)
    print(f"[{name}] faces={geo.n_faces} supers={ct2.supers.shape[0]} "
          f"clusters={ct2.boxes.shape[0]} rows={ct2.rows.shape[0]} "
          f"(VMEM {ct2.rows.shape[0]*512/2**20:.1f} MB)")
    N = o_cam.shape[0]
    maxt = jnp.full((N,), jnp.inf)

    c2 = jax.jit(lambda o, d, mt: ip.pallas_intersect_clu2(ct2, o, d, mt))
    a2 = jax.jit(lambda o, d, mt: ip.pallas_occluded_clu2(ct2, o, d, mt))

    def sort_pipe(fn, anyhit=False):
        def run(o, d, mt):
            perm, inv = scene._packet_perm(o, d)
            if anyhit:
                return fn(o[perm], d[perm], mt[perm])[inv]
            t, p, u, v = fn(o[perm], d[perm], mt[perm])
            return t[inv], p[inv], u[inv], v[inv]
        return run

    variants_c = {"clu2": c2, "clu2+sort": jax.jit(sort_pipe(c2))}
    variants_a = {"clu2": a2, "clu2+sort": jax.jit(sort_pipe(a2, True))}
    if scene.pbvh is not None:
        pk = lambda o, d, mt: ip.pallas_bvh_intersect(scene.pbvh, o, d, mt)
        pka = lambda o, d, mt: ip.pallas_bvh_occluded(scene.pbvh, o, d, mt)
        variants_c["packet+sort"] = jax.jit(sort_pipe(pk))
        variants_a["packet+sort"] = jax.jit(sort_pipe(pka, True))
    if geo.n_faces <= 4096:
        variants_c["q"] = jax.jit(
            lambda o, d, mt: ip.pallas_intersect_q(
                geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces))
        variants_a["q"] = jax.jit(
            lambda o, d, mt: ip.pallas_occluded_q(
                geo.tri_q, geo.tri_anchor, o, d, mt, n_tris=geo.n_faces))

    reps_c = {k: rep_c(v) for k, v in variants_c.items()}
    reps_a = {k: rep_a(v) for k, v in variants_a.items()}

    rng = np.random.default_rng(0)
    o, d = np.asarray(o_cam), np.asarray(d_cam)
    p0 = np.asarray(geo.tri_p0); p1 = np.asarray(geo.tri_p1)
    p2 = np.asarray(geo.tri_p2)
    alive = np.ones(N, bool)
    for depth in range(n_depths):
        oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
        ref = variants_c["clu2"]
        t0_, p0_ = [np.asarray(z) for z in ref(oj, dj, maxt)[:2]]
        row = {k: timeit(g, oj, dj, maxt, n=N) for k, g in reps_c.items()}
        # shadow rays
        hit = np.isfinite(t0_) & (p0_ >= 0) & alive
        hp = o + np.where(np.isfinite(t0_), t0_, 2.0)[:, None] * d
        dsh = light_p - hp
        dist = np.linalg.norm(dsh, axis=-1, keepdims=True)
        dsh = dsh / np.maximum(dist, 1e-9)
        osh = np.where(hit[:, None], hp + 1e-4 * dsh, 1e8)
        msh = jnp.asarray(np.where(hit, dist[:, 0] * 0.999, 0.0), jnp.float32)
        oshj = jnp.asarray(osh, jnp.float32)
        dshj = jnp.asarray(dsh, jnp.float32)
        row_a = {k: timeit(g, oshj, dshj, msh, n=N) for k, g in reps_a.items()}
        print(f"[{name}] depth {depth} (alive {alive.mean():.2f}): closest "
              + " ".join(f"{k}={v:6.1f}" for k, v in row.items())
              + " | anyhit " + " ".join(f"{k}={v:6.1f}" for k, v in row_a.items())
              + " ms/M", flush=True)
        # next bounce
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


# --- 82k sphere -------------------------------------------------------------
mesh = shp.make_sphere(subdiv=6)
scene, _ = mi.load_dict({
    "type": "scene",
    "sensor": {"type": "perspective", "fov": 45,
               "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
               "film": {"type": "hdrfilm", "width": 512, "height": 512}},
    "light": {"type": "point", "position": [2, 2, 3],
              "intensity": [40, 40, 40]},
    "ball": {"type": "mesh", "mesh": mesh,
             "bsdf": {"type": "diffuse", "reflectance": 0.7}},
})
N = 512 * 512 * 2
lane = np.arange(N); pix = lane // 2
x = pix % 512; y = pix // 512
rng = np.random.default_rng(1)
uv = np.stack([(x + rng.random(N)) / 512, (y + rng.random(N)) / 512], -1)
o, d = scene.sensor.sample_ray(jnp.asarray(uv, jnp.float32),
                               jnp.zeros((N, 2), jnp.float32))
bench_scene("sphere82k", scene, o, d, np.array([2.0, 2.0, 3.0]))

# --- cbox 2892 --------------------------------------------------------------
scene2, _ = mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                         resx=500, resy=500)
N2 = 500 * 500 * 8
lane = np.arange(N2); pix = lane // 8
x = pix % 500; y = pix // 500
uv = np.stack([(x + rng.random(N2)) / 500, (y + rng.random(N2)) / 500], -1)
o2, d2 = scene2.sensor.sample_ray(jnp.asarray(uv, jnp.float32),
                                  jnp.zeros((N2, 2), jnp.float32))
bench_scene("cbox", scene2, o2, d2, np.array([0.0, 0.99, 0.0]))
