"""mesh82k component ablation (round 4): where do the 82.6 ms/spp go?

Times, at the bench's shapes (81,920-face sphere, 512^2 x 4 spp regen with
131k lanes), the isolated packet-BVH pipeline pieces on realistic ray sets:
sort-key+argsort, ray gathers, BVH kernel, result scatter-back, any-hit, and
the full render pass at several regen lane counts.
"""
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
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.core.rng import hash_combine

W = H = 512
spp = 4
mesh = shp.make_sphere(subdiv=6)
scene, _ = mi.load_dict({
    "type": "scene",
    "integrator": {"type": "path", "max_depth": 4},
    "sensor": {
        "type": "perspective", "fov": 45,
        "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
        "film": {"type": "hdrfilm", "width": W, "height": H},
    },
    "light": {"type": "point", "position": [2, 2, 3],
              "intensity": [40, 40, 40]},
    "ball": {"type": "mesh", "mesh": mesh,
             "bsdf": {"type": "diffuse", "reflectance": 0.7}},
})
print("faces:", mesh.faces.shape[0], "pbvh:", scene.pbvh is not None)
integ = PathIntegrator(max_depth=4, rr_depth=3)
total = W * H * spp

from mitsuba3_plt_tpu.config import RGB

def run_pass(n_lanes):
    @jax.jit
    def f(seed):
        return integ.sample_regen(scene, seed, W, H, spp, RGB, n_lanes).sum()
    t0 = time.perf_counter(); jax.block_until_ready(f(jnp.uint32(0)))
    comp = time.perf_counter() - t0
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(jnp.uint32(1 + i)))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1]
    print(f"regen n_lanes={n_lanes}: {dt*1e3:.0f} ms/pass = "
          f"{dt/spp*1e3:.1f} ms/spp = {total/dt/1e6:.2f} M samples/s "
          f"(compile {comp:.0f}s)")

# component timings on a realistic bounce-ray set ----------------------------
N = 1 << 17  # 131072, the bench regen lane count
rng = np.random.default_rng(0)
lane = rng.integers(0, total, N)
pix = lane // spp
x = pix % W; y = pix // W
uv = np.stack([(x + rng.random(N)) / W, (y + rng.random(N)) / H], -1)
o, d = scene.sensor.sample_ray(jnp.asarray(uv, jnp.float32),
                               jnp.asarray(rng.random((N, 2), np.float32)))
o = np.asarray(o); d = np.asarray(d)
maxt = jnp.full((N,), jnp.inf)

K = 8
def timeit(g, *args):
    r = jax.block_until_ready(g(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); r = jax.block_until_ready(g(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e3  # ms per call

@jax.jit
def g_sortkey(o, d):
    for _ in range(K):
        perm, inv = scene._packet_perm(o, d)
        o = o * (1.0 + 1e-38 * perm[:, None].astype(jnp.float32))
    return perm, inv

@jax.jit
def g_full(o, d, mt):
    for _ in range(K):
        perm, inv = scene._packet_perm(o, d)
        t, p, u, v = ip.pallas_bvh_intersect(
            scene.pbvh, o[perm], d[perm], mt[perm])
        t, p = t[inv], p[inv]
        o = o * (1.0 + 1e-38 * t[:, None])
    return t, p

@jax.jit
def g_nosort(o, d, mt):
    for _ in range(K):
        t, p, u, v = ip.pallas_bvh_intersect(scene.pbvh, o, d, mt)
        o = o * (1.0 + 1e-38 * t[:, None])
    return t, p

@jax.jit
def g_anyhit(o, d, mt):
    for _ in range(K):
        perm, inv = scene._packet_perm(o, d)
        occ = ip.pallas_bvh_occluded(scene.pbvh, o[perm], d[perm], mt[perm])[inv]
        mt = mt + occ.astype(jnp.float32) * 1e-35
    return occ

oj, dj = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)

for depth in range(3):
    t_full = timeit(g_full, oj, dj, maxt)
    t_nosort = timeit(g_nosort, oj, dj, maxt)
    t_key = timeit(g_sortkey, oj, dj)
    t_any = timeit(g_anyhit, oj, dj, maxt)
    print(f"depth {depth} @131k rays: full={t_full:.2f} sorted-kernel-only"
          f"(camera-coherent-order)={t_nosort:.2f} sort+inv={t_key:.2f} "
          f"anyhit={t_any:.2f} ms/call "
          f"({t_full/(N/1e6):.1f} ms/M full)")
    # bounce: cosine hemisphere from hits
    from mitsuba3_plt_tpu.librender.records import Ray

    si = scene.ray_intersect(Ray.create(oj, dj))
    hit = np.asarray(si.valid)
    hp = np.asarray(si.p)
    nrm = np.asarray(si.n)
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
    o = np.where(hit[:, None], hp + 1e-4 * nd, 1e8).astype(np.float32)
    d = np.where(hit[:, None], nd, np.array([[0., 0., 1.]])).astype(np.float32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

run_pass(1 << 17)
run_pass(1 << 18)
run_pass(1 << 19)
