"""Scene: SoA geometry + materials + emitters + sensors + BVH, with
ray_intersect producing SurfaceInteraction records.

TPU-native replacement for the reference's Scene/Shape plugin aggregation
(src/render/scene.cpp, include/mitsuba/render/scene.h:76-262): everything is
a pytree of arrays; the host loader (loader.py) flattens plugin objects into
these tables at load time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import math as m
from ..librender.bsdf import MaterialTable
from ..librender.records import Ray, SurfaceInteraction
from ..librender.sensor import Sensor
from . import intersect as isect
from .bvh import BVH, build_bvh, pack_packet_bvh
from .emitters import EmitterTable


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geometry:
    """Triangle soup (pre-gathered vertex data, one row per face).

    `tri_isect` packs (p0, e1, e2) rows padded to the intersection chunk size
    for the gather-free chunked intersector; `tri_attr` packs every per-face
    attribute into one [F, 32] matrix so hit-point shading does a SINGLE
    gather per bounce (in-loop gathers cost ~2 ms/256k lanes on TPU — one
    packed fetch instead of 12 separate ones)."""

    tri_p0: Any  # [F, 3]
    tri_p1: Any
    tri_p2: Any
    tri_n0: Any  # [F, 3] shading normals per corner
    tri_n1: Any
    tri_n2: Any
    tri_uv0: Any  # [F, 2]
    tri_uv1: Any
    tri_uv2: Any
    face_n: Any    # [F, 3] geometric normal
    tri_mat: Any   # [F] int32 material index
    tri_emitter: Any  # [F] int32 emitter index (-1)
    tri_shape: Any    # [F] int32 source shape id
    tri_isect: Any  # [F_pad, 9] packed (p0, e1, e2) for chunked intersection
    tri_attr: Any   # [F, 32] packed shading attributes (see pack_attributes)
    # --- analytic spheres (reference src/shapes/sphere.cpp:240-330) -------
    # intersected exactly (no tessellation bias); S is small so the test is
    # a vectorized [N, S] broadcast merged with the triangle result
    sph_center: Any = None  # [S, 3]
    sph_radius: Any = None  # [S]
    sph_attr: Any = None    # [S, 3] (mat, emitter, shape) as f32

    @property
    def n_faces(self):
        return self.tri_p0.shape[0]

    @property
    def n_spheres(self):
        return 0 if self.sph_center is None else self.sph_center.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    geo: Geometry
    bvh: BVH
    materials: MaterialTable
    emitters: EmitterTable
    sensor: Sensor
    medium: Any = None  # optional global homogeneous medium (scene/media.py)
    pbvh: Any = None    # PacketBVH for the Pallas packet traversal (built by
                        # assemble_scene for scenes above the brute-force cap)
    env_emitter: int = dataclasses.field(default=-1, metadata=dict(static=True))

    # Below this face count, gather-free brute force (Pallas kernel on TPU)
    # beats the per-lane BVH walk (in-loop gathers dominate the walk's cost).
    BRUTE_FORCE_MAX_FACES = 4096
    # Above this, the PacketBVH tables outgrow VMEM (~16 MB/core) and the
    # XLA skip-link walk takes over.
    PACKET_BVH_MAX_FACES = 150_000

    def _small_scene_intersect(self, ray: Ray):
        """Gather-free brute force: Pallas kernel on TPU, chunked scan on CPU
        (where Mosaic is unavailable)."""
        geo = self.geo
        if jax.default_backend() == "tpu":
            from ..ops.intersect_pallas import pallas_intersect

            return pallas_intersect(geo.tri_isect, ray.o, ray.d, ray.maxt)
        return isect.chunked_intersect(geo.tri_isect, ray.o, ray.d, ray.maxt)

    def _packet_perm(self, o, d):
        """Coherence sort for the packet-BVH kernel: rays grouped by
        direction octant + origin Morton cell so each [SUB_B, 128] tile
        traverses a tight subtree. The argsort + gathers cost ~tens of ms at
        2M lanes; unsorted bounce rays cost the kernel seconds (tile-union
        traversal degenerates toward brute force)."""
        geo = self.geo
        lo = self.pbvh.box[0, 0:3]
        hi = self.pbvh.box[0, 3:6]
        rel = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 0.999)
        cell = (rel * 8.0).astype(jnp.int32)  # [N, 3] in [0, 8)

        def spread3(x):  # 3-bit -> every 3rd bit
            x = (x | (x << 4)) & 0x0C3
            x = (x | (x << 2)) & 0x249
            return x

        morton = (
            spread3(cell[:, 0])
            | (spread3(cell[:, 1]) << 1)
            | (spread3(cell[:, 2]) << 2)
        )
        octant = (
            (d[:, 0] < 0).astype(jnp.int32)
            | ((d[:, 1] < 0).astype(jnp.int32) << 1)
            | ((d[:, 2] < 0).astype(jnp.int32) << 2)
        )
        key = (octant << 9) | morton
        perm = jnp.argsort(key)
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype)
        )
        return perm, inv

    def _sphere_intersect(self, ray: Ray):
        """Nearest analytic sphere hit: [N] (t, sphere index or -1).

        Vectorized [N, S] quadratic (sphere.cpp:240-290); S is tiny so this
        is pure fused elementwise work, no gathers."""
        geo = self.geo
        c = geo.sph_center  # [S, 3]
        r = geo.sph_radius  # [S]
        oc = ray.o[:, None, :] - c[None, :, :]          # [N, S, 3]
        b = jnp.sum(oc * ray.d[:, None, :], axis=-1)    # [N, S]
        cc = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
        disc = b * b - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        eps = 1e-4
        t_hit = jnp.where(t0 > eps, t0, jnp.where(t1 > eps, t1, jnp.inf))
        t_hit = jnp.where(disc >= 0, t_hit, jnp.inf)
        t_hit = jnp.where(t_hit < ray.maxt[:, None], t_hit, jnp.inf)
        best = jnp.argmin(t_hit, axis=-1)
        t_best = jnp.min(t_hit, axis=-1)
        idx = jnp.where(jnp.isfinite(t_best), best.astype(jnp.int32), -1)
        return t_best, idx

    # ------------------------------------------------------------------
    def ray_intersect(self, ray: Ray, brute_force: bool = False) -> SurfaceInteraction:
        geo = self.geo
        if brute_force or geo.n_faces <= Scene.BRUTE_FORCE_MAX_FACES:
            t, prim, u, v = self._small_scene_intersect(ray)
        elif self.pbvh is not None and jax.default_backend() == "tpu":
            from ..ops.intersect_pallas import pallas_bvh_intersect

            perm, inv = self._packet_perm(ray.o, ray.d)
            t, prim, u, v = pallas_bvh_intersect(
                self.pbvh, ray.o[perm], ray.d[perm], ray.maxt[perm]
            )
            t, prim, u, v = t[inv], prim[inv], u[inv], v[inv]
        else:
            t, prim, u, v = isect.bvh_intersect(
                self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d, ray.maxt
            )
        sph_idx = None
        if geo.n_spheres:
            t_s, sph_idx = self._sphere_intersect(ray)
            tri_valid = prim >= 0
            sph_wins = (sph_idx >= 0) & (
                ~tri_valid | (t_s < jnp.where(tri_valid, t, jnp.inf))
            )
            t = jnp.where(sph_wins, t_s, t)
            prim = jnp.where(sph_wins, geo.n_faces + jnp.maximum(sph_idx, 0),
                             prim)
        valid = prim >= 0
        prim_c = jnp.maximum(prim, 0)

        # keep p finite on miss lanes (t = inf would poison gradients of any
        # downstream expression even under where-masks)
        p = ray.o + ray.d * jnp.where(valid, t, 1.0)[..., None]
        # ONE packed fetch for all shading attributes (one-hot MXU matmul
        # for small scenes — in-scan random gathers are ~10x slower)
        attr = m.small_gather(geo.tri_attr, prim_c)  # [N, 32]
        ng = attr[..., 0:3]
        n0 = attr[..., 3:6]
        n1 = attr[..., 6:9]
        n2 = attr[..., 9:12]
        uv0 = attr[..., 12:14]
        uv1 = attr[..., 14:16]
        uv2 = attr[..., 16:18]
        a_mat = attr[..., 18].astype(jnp.int32)
        a_emitter = attr[..., 19].astype(jnp.int32)
        a_shape = attr[..., 20].astype(jnp.int32)
        w = 1.0 - u - v
        ns = fr.normalize(
            n0 * w[..., None] + n1 * u[..., None] + n2 * v[..., None]
        )
        # flip geometric normal to the shading side consistency (Mitsuba keeps
        # ng fixed and shading frame from ns)
        uv = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]

        if geo.n_spheres:
            # analytic-sphere overrides (exact normal/uv, sphere.cpp:290-330)
            is_sph = valid & (prim >= geo.n_faces)
            s_c = jnp.maximum(prim - geo.n_faces, 0)
            center = m.small_gather(geo.sph_center, s_c)
            n_sph = fr.normalize(p - center)
            phi = jnp.arctan2(n_sph[..., 1], n_sph[..., 0])
            theta = m.safe_acos(n_sph[..., 2])
            uv_sph = jnp.stack(
                [phi * (0.5 / jnp.pi) + 0.5, theta / jnp.pi], axis=-1
            )
            sattr = m.small_gather(geo.sph_attr, s_c)
            ng = jnp.where(is_sph[..., None], n_sph, ng)
            ns = jnp.where(is_sph[..., None], n_sph, ns)
            uv = jnp.where(is_sph[..., None], uv_sph, uv)
            a_mat = jnp.where(is_sph, sattr[..., 0].astype(jnp.int32), a_mat)
            a_emitter = jnp.where(
                is_sph, sattr[..., 1].astype(jnp.int32), a_emitter
            )
            a_shape = jnp.where(
                is_sph, sattr[..., 2].astype(jnp.int32), a_shape
            )

        sh_s, sh_t = fr.coordinate_system(ns)
        wi_world = -ray.d
        wi_local = jnp.stack(
            [
                fr.dot(wi_world, sh_s),
                fr.dot(wi_world, sh_t),
                fr.dot(wi_world, ns),
            ],
            axis=-1,
        )
        return SurfaceInteraction(
            valid=valid,
            t=jnp.where(valid, t, jnp.inf),
            p=p,
            n=ng,
            sh_s=sh_s,
            sh_t=sh_t,
            sh_n=ns,
            uv=uv,
            wi=wi_local,
            prim_idx=prim,
            mat_idx=jnp.where(valid, a_mat, -1),
            emitter_idx=jnp.where(valid, a_emitter, -1),
            shape_idx=jnp.where(valid, a_shape, -1),
        )

    def ray_test(self, ray: Ray) -> Any:
        """Shadow-ray occlusion test (True = occluded)."""
        geo = self.geo
        if geo.n_faces <= Scene.BRUTE_FORCE_MAX_FACES:
            if jax.default_backend() == "tpu":
                from ..ops.intersect_pallas import pallas_occluded

                occ = pallas_occluded(geo.tri_isect, ray.o, ray.d, ray.maxt)
            else:
                occ = isect.chunked_occluded(
                    geo.tri_isect, ray.o, ray.d, ray.maxt
                )
        elif self.pbvh is not None and jax.default_backend() == "tpu":
            from ..ops.intersect_pallas import pallas_bvh_occluded

            perm, inv = self._packet_perm(ray.o, ray.d)
            occ = pallas_bvh_occluded(
                self.pbvh, ray.o[perm], ray.d[perm], ray.maxt[perm]
            )[inv]
        else:
            occ = isect.bvh_occluded(
                self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d,
                ray.maxt,
            )
        if geo.n_spheres:
            _, sph_idx = self._sphere_intersect(ray)
            occ = occ | (sph_idx >= 0)
        return occ


# ---------------------------------------------------------------------------
# host-side assembly
# ---------------------------------------------------------------------------

def build_geometry(
    meshes, mat_ids, emitter_ids, shape_ids=None, spheres=None
) -> Tuple[Geometry, BVH]:
    """meshes: list[HostMesh] (already transformed to world); mat_ids /
    emitter_ids: per-mesh ints (-1 = no emitter); spheres: optional list of
    dicts {center, radius, mat, emitter, shape} intersected analytically."""
    P0, P1, P2, N0, N1, N2, U0, U1, U2 = [], [], [], [], [], [], [], [], []
    FN, MAT, EMI, SHP = [], [], [], []

    for k, mesh in enumerate(meshes):
        f = mesh.faces
        v = mesh.vertices
        p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
        fn = np.cross(p1 - p0, p2 - p0)
        fn_len = np.linalg.norm(fn, axis=-1, keepdims=True)
        fn = fn / np.maximum(fn_len, 1e-20)
        if mesh.normals is not None and not mesh.face_normals:
            n0, n1, n2 = (
                mesh.normals[f[:, 0]],
                mesh.normals[f[:, 1]],
                mesh.normals[f[:, 2]],
            )
        else:
            n0 = n1 = n2 = fn
        if mesh.uvs is not None:
            u0, u1, u2 = mesh.uvs[f[:, 0]], mesh.uvs[f[:, 1]], mesh.uvs[f[:, 2]]
        else:
            u0 = u1 = u2 = np.zeros((len(f), 2), np.float32)

        P0.append(p0); P1.append(p1); P2.append(p2)
        N0.append(n0); N1.append(n1); N2.append(n2)
        U0.append(u0); U1.append(u1); U2.append(u2)
        FN.append(fn)
        MAT.append(np.full(len(f), mat_ids[k], np.int32))
        EMI.append(np.full(len(f), emitter_ids[k], np.int32))
        SHP.append(np.full(len(f), k if shape_ids is None else shape_ids[k], np.int32))

    cat = lambda xs: np.concatenate(xs, 0).astype(np.float32)
    cati = lambda xs: np.concatenate(xs, 0).astype(np.int32)

    p0c, p1c, p2c = cat(P0), cat(P1), cat(P2)
    nf_total = len(p0c)

    # packed intersection rows (p0, e1, e2), chunk-padded with degenerate tris
    CHUNK = 64
    pad = (-nf_total) % CHUNK
    isect_rows = np.concatenate([p0c, p1c - p0c, p2c - p0c], axis=-1)
    isect_rows = np.concatenate(
        [isect_rows, np.zeros((pad, 9), np.float32)], axis=0
    )

    # packed shading attributes [F, 32]: ng(3) n0(3) n1(3) n2(3) uv0(2)
    # uv1(2) uv2(2) mat(1) emitter(1) shape(1) pad->32
    attr = np.zeros((nf_total, 32), np.float32)
    attr[:, 0:3] = cat(FN)
    attr[:, 3:6] = cat(N0)
    attr[:, 6:9] = cat(N1)
    attr[:, 9:12] = cat(N2)
    attr[:, 12:14] = cat(U0)
    attr[:, 14:16] = cat(U1)
    attr[:, 16:18] = cat(U2)
    attr[:, 18] = cati(MAT)
    attr[:, 19] = cati(EMI)
    attr[:, 20] = cati(SHP)

    geo = Geometry(
        tri_p0=jnp.asarray(p0c), tri_p1=jnp.asarray(p1c),
        tri_p2=jnp.asarray(p2c),
        tri_n0=jnp.asarray(cat(N0)), tri_n1=jnp.asarray(cat(N1)),
        tri_n2=jnp.asarray(cat(N2)),
        tri_uv0=jnp.asarray(cat(U0)), tri_uv1=jnp.asarray(cat(U1)),
        tri_uv2=jnp.asarray(cat(U2)),
        face_n=jnp.asarray(cat(FN)),
        tri_mat=jnp.asarray(cati(MAT)),
        tri_emitter=jnp.asarray(cati(EMI)),
        tri_shape=jnp.asarray(cati(SHP)),
        tri_isect=jnp.asarray(isect_rows),
        tri_attr=jnp.asarray(attr),
        **(
            dict(
                sph_center=jnp.asarray(
                    np.stack([np.asarray(s["center"], np.float32)
                              for s in spheres])
                ),
                sph_radius=jnp.asarray(
                    np.asarray([s["radius"] for s in spheres], np.float32)
                ),
                sph_attr=jnp.asarray(
                    np.asarray(
                        [[s.get("mat", 0), s.get("emitter", -1),
                          s.get("shape", -1)] for s in spheres],
                        np.float32,
                    )
                ),
            )
            if spheres
            else {}
        ),
    )

    # BVH build over the concatenated soup
    p0_np, p1_np, p2_np = cat(P0), cat(P1), cat(P2)
    nf = len(p0_np)
    verts = np.concatenate([p0_np, p1_np, p2_np], 0)
    faces = np.stack(
        [np.arange(nf), np.arange(nf) + nf, np.arange(nf) + 2 * nf], -1
    ).astype(np.int32)
    bvh = build_bvh(verts, faces)
    return geo, bvh


def scene_bounds(geo: Geometry):
    lo = np.minimum.reduce(
        [np.asarray(geo.tri_p0).min(0), np.asarray(geo.tri_p1).min(0),
         np.asarray(geo.tri_p2).min(0)]
    )
    hi = np.maximum.reduce(
        [np.asarray(geo.tri_p0).max(0), np.asarray(geo.tri_p1).max(0),
         np.asarray(geo.tri_p2).max(0)]
    )
    if geo.sph_center is not None:
        c = np.asarray(geo.sph_center)
        r = np.asarray(geo.sph_radius)[:, None]
        lo = np.minimum(lo, (c - r).min(0))
        hi = np.maximum(hi, (c + r).max(0))
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2)
    return center.astype(np.float32), radius
