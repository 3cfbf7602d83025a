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
from .bvh import BVH, build_bvh
from .emitters import EmitterTable


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geometry:
    """Triangle soup (pre-gathered vertex data, one row per face)."""

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

    @property
    def n_faces(self):
        return self.tri_p0.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    geo: Geometry
    bvh: BVH
    materials: MaterialTable
    emitters: EmitterTable
    sensor: Sensor
    env_emitter: int = dataclasses.field(default=-1, metadata=dict(static=True))

    # ------------------------------------------------------------------
    def ray_intersect(self, ray: Ray, brute_force: bool = False) -> SurfaceInteraction:
        geo = self.geo
        if brute_force:
            t, prim, u, v = isect.brute_force_intersect(
                geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d, ray.maxt
            )
        else:
            t, prim, u, v = isect.bvh_intersect(
                self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d, ray.maxt
            )
        valid = prim >= 0
        prim_c = jnp.maximum(prim, 0)

        p = ray.o + ray.d * t[..., None]
        ng = geo.face_n[prim_c]
        w = 1.0 - u - v
        ns = fr.normalize(
            geo.tri_n0[prim_c] * w[..., None]
            + geo.tri_n1[prim_c] * u[..., None]
            + geo.tri_n2[prim_c] * v[..., None]
        )
        # flip geometric normal to the shading side consistency (Mitsuba keeps
        # ng fixed and shading frame from ns)
        uv = (
            geo.tri_uv0[prim_c] * w[..., None]
            + geo.tri_uv1[prim_c] * u[..., None]
            + geo.tri_uv2[prim_c] * v[..., None]
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
            mat_idx=jnp.where(valid, geo.tri_mat[prim_c], -1),
            emitter_idx=jnp.where(valid, geo.tri_emitter[prim_c], -1),
            shape_idx=jnp.where(valid, geo.tri_shape[prim_c], -1),
        )

    def ray_test(self, ray: Ray) -> Any:
        """Shadow-ray occlusion test (True = occluded)."""
        geo = self.geo
        return isect.bvh_occluded(
            self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d, ray.maxt
        )


# ---------------------------------------------------------------------------
# host-side assembly
# ---------------------------------------------------------------------------

def build_geometry(
    meshes, mat_ids, emitter_ids, shape_ids=None
) -> Tuple[Geometry, BVH]:
    """meshes: list[HostMesh] (already transformed to world); mat_ids /
    emitter_ids: per-mesh ints (-1 = no emitter)."""
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

    geo = Geometry(
        tri_p0=jnp.asarray(cat(P0)), tri_p1=jnp.asarray(cat(P1)),
        tri_p2=jnp.asarray(cat(P2)),
        tri_n0=jnp.asarray(cat(N0)), tri_n1=jnp.asarray(cat(N1)),
        tri_n2=jnp.asarray(cat(N2)),
        tri_uv0=jnp.asarray(cat(U0)), tri_uv1=jnp.asarray(cat(U1)),
        tri_uv2=jnp.asarray(cat(U2)),
        face_n=jnp.asarray(cat(FN)),
        tri_mat=jnp.asarray(cati(MAT)),
        tri_emitter=jnp.asarray(cati(EMI)),
        tri_shape=jnp.asarray(cati(SHP)),
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
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2)
    return center.astype(np.float32), radius
