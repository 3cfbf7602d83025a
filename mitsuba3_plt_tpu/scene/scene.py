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
    tri_attr: Any   # [F, 40] packed shading attributes (see pack_attributes)
    # precomputed-quantities table for the Pallas brute kernels
    # (ops/intersect_pallas.pack_tri_q): rows (e1, e2, p0 x e1, p0 x e2,
    # e1 x e2, p0.n2) relative to tri_anchor — no cross products and no
    # division inside the triangle loop (~19 FMA/pair, the VPU floor)
    tri_q: Any = None       # [F_pad, 16]
    tri_anchor: Any = None  # [3] scene-centre anchor (f32 conditioning)
    # --- analytic spheres (reference src/shapes/sphere.cpp:240-330) -------
    # intersected exactly (no tessellation bias); S is small so the test is
    # a vectorized [N, S] broadcast merged with the triangle result
    sph_center: Any = None  # [S, 3]
    sph_radius: Any = None  # [S]
    sph_attr: Any = None    # [S, 3] (mat, emitter, shape) as f32
    # --- analytic disks (reference src/shapes/disk.cpp): plane hit clipped
    # to radius; frame (n, s) carries the uv orientation ---
    dsk_center: Any = None  # [D, 3]
    dsk_n: Any = None       # [D, 3]
    dsk_s: Any = None       # [D, 3] in-plane u axis
    dsk_radius: Any = None  # [D]
    dsk_attr: Any = None    # [D, 3]
    # --- analytic open cylinders (reference src/shapes/cylinder.cpp) ---
    cyl_p0: Any = None      # [C, 3]
    cyl_axis: Any = None    # [C, 3] unit
    cyl_len: Any = None     # [C]
    cyl_radius: Any = None  # [C]
    cyl_attr: Any = None    # [C, 3]
    # optional MXU brute-force table (ops/intersect_pallas.pack_tri_mxu);
    # not built by default: at K = 16 features the systolic array runs at
    # 1/8 depth utilization and full-f32 precision (needed for scene-scale
    # coordinates) costs 6 passes, so the VPU loop wins in practice
    tri_mxu: Any = None

    @property
    def n_faces(self):
        return self.tri_p0.shape[0]

    @property
    def n_spheres(self):
        return 0 if self.sph_center is None else self.sph_center.shape[0]

    @property
    def n_disks(self):
        return 0 if self.dsk_center is None else self.dsk_center.shape[0]

    @property
    def n_cylinders(self):
        return 0 if self.cyl_p0 is None else self.cyl_p0.shape[0]


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
    ctab: Any = None    # ClusterTable for the flat treelet-gated kernel
                        # (kept for the legacy kernel + its tests; routing
                        # now uses ctab2)
    ctab2: Any = None   # ClusterTable2 for the TWO-LEVEL treelet kernel
                        # (clu2): coherent camera tiles on any size, and the
                        # primary big-mesh route (built by assemble_scene)
    sdfs: Any = ()      # tuple of SDFGrid shapes (scene/sdf.py, sphere-traced)
    env_emitter: int = dataclasses.field(default=-1, metadata=dict(static=True))

    # Below this face count, gather-free brute force (Pallas kernel on TPU)
    # beats the per-lane BVH walk (in-loop gathers dominate the walk's cost).
    BRUTE_FORCE_MAX_FACES = 4096
    # Cluster-gated kernel range: above this, treelet AABB gating beats pure
    # brute force (tested every-triangle work dominates); the upper bound is
    # where the sequential AABB scan itself outgrows the packet-BVH walk.
    CLUSTER_MIN_FACES = 768
    CLUSTER_MAX_FACES = 32768
    # Above this, the PacketBVH tables outgrow the raised scoped-VMEM
    # budget (64 MB, set in __init__/bench before libtpu init; narrow rows
    # pad the lane dim to 128, so the [T, 16] tri table costs T*8 KB) and
    # the XLA skip-link walk takes over.
    PACKET_BVH_MAX_FACES = 150_000

    def _small_scene_intersect(self, ray: Ray):
        """Gather-free brute force: Pallas kernel on TPU, chunked scan on CPU
        (where Mosaic is unavailable)."""
        geo = self.geo
        if jax.default_backend() == "tpu":
            from ..ops.intersect_pallas import pallas_intersect_q

            # Pallas custom calls have no AD rules; the hit SEARCH is
            # detached (discrete), and downstream differentiable
            # quantities (p, frames) are rebuilt from ray.o/ray.d, so
            # texture/emitter/medium gradients are unaffected. Interior
            # geometry gradients use the CPU differentiable path;
            # boundary terms come from the silhouette edge sampler.
            sg = jax.lax.stop_gradient
            return pallas_intersect_q(
                geo.tri_q, geo.tri_anchor, sg(ray.o), sg(ray.d),
                sg(ray.maxt), n_tris=geo.n_faces,
            )
        return isect.chunked_intersect(geo.tri_isect, ray.o, ray.d, ray.maxt)

    def _packet_perm(self, o, d):
        """Coherence sort for the packet-BVH kernel: rays grouped by
        direction octant + origin Morton cell so each [SUB_B, 128] tile
        traverses a tight subtree. The argsort + gathers cost ~tens of ms at
        2M lanes; unsorted bounce rays cost the kernel seconds (tile-union
        traversal degenerates toward brute force)."""
        geo = self.geo
        lo = self.pbvh.nodes[0, 0:3]
        hi = self.pbvh.nodes[0, 3:6]
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
        # direction Morton as the low bits: camera rays share ONE origin
        # cell, so without this the sort leaves them in scanline order and
        # each packet tile spans a long thin screen strip (wide BVH-node
        # unions). 64^3 quantization: a narrow camera cone still spans
        # many cells, grouping screen-adjacent rays into square-ish tiles.
        def spread6(x):  # 6-bit -> every 3rd bit (18 bits)
            x = (x | (x << 8)) & 0x00F00F
            x = (x | (x << 4)) & 0x0C30C3
            x = (x | (x << 2)) & 0x249249
            return x

        dcell = jnp.clip(
            ((d * 0.5 + 0.5) * 64.0), 0.0, 63.999
        ).astype(jnp.int32)
        dmorton = (
            spread6(dcell[:, 0])
            | (spread6(dcell[:, 1]) << 1)
            | (spread6(dcell[:, 2]) << 2)
        )
        key = ((octant << 27) | (morton << 18) | dmorton).astype(jnp.uint32)
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

    def _disk_intersect(self, ray: Ray):
        """Nearest analytic disk hit (disk.cpp:200-260): plane intersection
        clipped to the radius. Vectorized [N, D]."""
        geo = self.geo
        c = geo.dsk_center
        nrm = geo.dsk_n
        r = geo.dsk_radius
        dn = jnp.sum(ray.d[:, None, :] * nrm[None, :, :], axis=-1)  # [N, D]
        t = jnp.sum((c[None, :, :] - ray.o[:, None, :]) * nrm[None, :, :],
                    axis=-1) / jnp.where(jnp.abs(dn) > 1e-9, dn, 1e-9)
        p = ray.o[:, None, :] + ray.d[:, None, :] * t[..., None]
        rel = p - c[None, :, :]
        r2 = jnp.sum(rel * rel, axis=-1)
        eps = 1e-4
        ok = (jnp.abs(dn) > 1e-9) & (t > eps) & (r2 <= (r * r)[None, :])
        t_hit = jnp.where(ok & (t < ray.maxt[:, None]), t, jnp.inf)
        best = jnp.argmin(t_hit, axis=-1)
        t_best = jnp.min(t_hit, axis=-1)
        idx = jnp.where(jnp.isfinite(t_best), best.astype(jnp.int32), -1)
        return t_best, idx

    def _cyl_intersect(self, ray: Ray):
        """Nearest analytic open-cylinder hit (cylinder.cpp:240-320):
        quadratic against the infinite cylinder, clipped to [0, len] along
        the axis. Vectorized [N, C]."""
        geo = self.geo
        p0 = geo.cyl_p0
        ax = geo.cyl_axis
        ln = geo.cyl_len
        r = geo.cyl_radius
        oc = ray.o[:, None, :] - p0[None, :, :]            # [N, C, 3]
        d_a = jnp.sum(ray.d[:, None, :] * ax[None, :, :], -1)
        oc_a = jnp.sum(oc * ax[None, :, :], -1)
        d_perp = ray.d[:, None, :] - d_a[..., None] * ax[None, :, :]
        oc_perp = oc - oc_a[..., None] * ax[None, :, :]
        A = jnp.sum(d_perp * d_perp, -1)
        B = jnp.sum(d_perp * oc_perp, -1)
        Cc = jnp.sum(oc_perp * oc_perp, -1) - (r * r)[None, :]
        disc = B * B - A * Cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        A_safe = jnp.where(A > 1e-12, A, 1e-12)
        t0 = (-B - sq) / A_safe
        t1 = (-B + sq) / A_safe
        eps = 1e-4

        def clipped(t):
            h = oc_a + t * d_a
            return jnp.where(
                (t > eps) & (h >= 0.0) & (h <= ln[None, :]), t, jnp.inf
            )

        t_hit = jnp.minimum(clipped(t0), clipped(t1))
        t_hit = jnp.where((disc >= 0) & (A > 1e-12), t_hit, jnp.inf)
        t_hit = jnp.where(t_hit < ray.maxt[:, None], t_hit, jnp.inf)
        best = jnp.argmin(t_hit, axis=-1)
        t_best = jnp.min(t_hit, axis=-1)
        idx = jnp.where(jnp.isfinite(t_best), best.astype(jnp.int32), -1)
        return t_best, idx

    def _analytic_intersect(self, ray: Ray):
        """Merge all analytic primitive families: returns (t, flat_idx) with
        flat_idx in the extended-prim numbering starting at n_faces:
        [spheres | disks | cylinders]; -1 = no analytic hit."""
        geo = self.geo
        t_best = jnp.full(ray.o.shape[0], jnp.inf)
        idx_best = jnp.full(ray.o.shape[0], -1, jnp.int32)
        off = 0
        if geo.n_spheres:
            t_s, i_s = self._sphere_intersect(ray)
            win = (i_s >= 0) & (t_s < t_best)
            t_best = jnp.where(win, t_s, t_best)
            idx_best = jnp.where(win, i_s + off, idx_best)
        off += geo.n_spheres
        if geo.n_disks:
            t_d, i_d = self._disk_intersect(ray)
            win = (i_d >= 0) & (t_d < t_best)
            t_best = jnp.where(win, t_d, t_best)
            idx_best = jnp.where(win, i_d + off, idx_best)
        off += geo.n_disks
        if geo.n_cylinders:
            t_c, i_c = self._cyl_intersect(ray)
            win = (i_c >= 0) & (t_c < t_best)
            t_best = jnp.where(win, t_c, t_best)
            idx_best = jnp.where(win, i_c + off, idx_best)
        return t_best, idx_best

    @property
    def _n_analytic(self):
        g = self.geo
        return g.n_spheres + g.n_disks + g.n_cylinders

    # ------------------------------------------------------------------
    @staticmethod
    def _coherent_flag(coherent):
        """Normalize the coherent hint: returns (static: bool | None,
        pred: traced scalar | None). Per-lane vectors (regen depth) count
        as incoherent — the wavefront mixes fresh and bounce rays."""
        if isinstance(coherent, bool):
            return coherent, None
        c = jnp.asarray(coherent)
        if c.ndim == 0:
            return None, c
        return False, None

    def _clu2_intersect(self, ray: Ray):
        from ..ops.intersect_pallas import pallas_intersect_clu2

        sg = jax.lax.stop_gradient
        return pallas_intersect_clu2(
            self.ctab2, sg(ray.o), sg(ray.d), sg(ray.maxt)
        )

    def _incoherent_sort_key(self, o, d):
        """u32 (octant | origin-morton) key grouping incoherent rays so
        clu2 tiles get tight treelet unions (round-5
        tools/experiments/isect_bounce_octant.py: sorted clu2 ANY-HIT beats
        q brute 27.6 vs 33 ms/M on cbox bounce shadow rays, sort included;
        closest-hit stays with q — 70-78 vs 42)."""
        lo = jnp.minimum(
            jnp.min(self.geo.tri_p0, axis=0),
            jnp.minimum(jnp.min(self.geo.tri_p1, axis=0),
                        jnp.min(self.geo.tri_p2, axis=0)),
        )
        hi = jnp.maximum(
            jnp.max(self.geo.tri_p0, axis=0),
            jnp.maximum(jnp.max(self.geo.tri_p1, axis=0),
                        jnp.max(self.geo.tri_p2, axis=0)),
        )
        rel = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 0.999)
        cell = (rel * 16.0).astype(jnp.int32)

        def spread4(v):
            v = (v | (v << 8)) & 0xF00F
            v = (v | (v << 4)) & 0xC3C3
            v = (v | (v << 2)) & 0x9249
            return v

        morton = (spread4(cell[:, 0]) | (spread4(cell[:, 1]) << 1)
                  | (spread4(cell[:, 2]) << 2))
        octant = ((d[:, 0] < 0).astype(jnp.int32)
                  | ((d[:, 1] < 0).astype(jnp.int32) << 1)
                  | ((d[:, 2] < 0).astype(jnp.int32) << 2))
        return ((octant << 12) | morton).astype(jnp.uint32)

    def _clu2_occluded_sorted(self, ray: Ray):
        from ..ops.intersect_pallas import pallas_occluded_clu2

        sg = jax.lax.stop_gradient
        o, d, mt = sg(ray.o), sg(ray.d), sg(ray.maxt)
        perm = jnp.argsort(self._incoherent_sort_key(o, d))
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype)
        )
        return pallas_occluded_clu2(
            self.ctab2, o[perm], d[perm], mt[perm]
        )[inv]

    def intersect_route(self, brute_force: bool = False, coherent=False,
                        on_tpu: bool | None = None,
                        anyhit: bool = False) -> str:
        """The SINGLE routing decision used by ray_intersect/ray_test —
        exposed so tests can tripwire which kernel a scene selects
        (tests/test_golden.py::test_intersect_routing_tripwire).

        coherent: False | True | "pred" (a traced scalar hint).
        anyhit: shadow-ray (occlusion) queries. DOUBLY-confirmed negative
        result (round 5): clu2 any-hit on incoherent bounce sets wins the
        chained microbenchmark both sorted-at-SUB_C=16 (27.6 vs q's 33
        ms/M) and unsorted-at-SUB_C=64 (24.8-26.5 vs 32.4), yet BOTH
        routings regress the full render (109.5 -> 120.1 and
        106.3 -> 113.7 ms/spp respectively) — inside the bounce scan the
        q kernel overlaps with the surrounding fused work in a way the
        treelet kernel's gated grid does not. Only end-to-end renders
        gate routing changes; incoherent any-hit stays on q.
        CLOSEST-hit bounce rays also stay on q (41.5 vs clu2's 56.8 ms/M
        at SUB_C=64).
        Returns one of "brute", "clu2", "cond(clu2,q)", "packet",
        "xla-walk". ("brute" is the q kernel on TPU, the chunked scan on
        CPU.)"""
        if on_tpu is None:
            on_tpu = jax.default_backend() == "tpu"
        small = self.geo.n_faces <= Scene.BRUTE_FORCE_MAX_FACES
        if brute_force:
            return "brute"
        if on_tpu and self.ctab2 is not None and not small:
            return "clu2"
        if on_tpu and self.ctab2 is not None and coherent == "pred":
            return "cond(clu2,q)"
        if on_tpu and self.ctab2 is not None and coherent is True:
            return "clu2"
        if small:
            return "brute"
        if self.pbvh is not None and on_tpu:
            return "packet"
        return "xla-walk"

    def ray_intersect(self, ray: Ray, brute_force: bool = False,
                      coherent: Any = False) -> SurfaceInteraction:
        """`coherent` marks ray sets with tile locality (camera rays at
        bounce 0 — the reference's `coherent=true` hint, scene.h:96). It
        may be a static bool or a TRACED SCALAR predicate (the scan depth's
        `b == 0`): tile-coherent sets route to the two-level treelet kernel
        (17.6/12.5 ms/M on cbox.xml camera/shadow rays vs the q kernel's
        41.7/32.7 — tools/experiments/isect_clu2.py), incoherent small-
        scene sets stay on q brute (41.8 vs clu2's 114 on bounce rays), and
        big meshes use clu2 for every ray class (it beats the sorted packet
        walk at every depth; its unsorted bounce route exploits the lane
        order's inherited origin locality)."""
        geo = self.geo
        on_tpu = jax.default_backend() == "tpu"
        coh_static, coh_pred = self._coherent_flag(coherent)
        route = self.intersect_route(
            brute_force=brute_force,
            coherent=(True if coh_static is True
                      else ("pred" if coh_pred is not None else False)),
            on_tpu=on_tpu,
        )
        if route == "brute":
            t, prim, u, v = self._small_scene_intersect(ray)
        elif route == "clu2":
            t, prim, u, v = self._clu2_intersect(ray)
        elif route == "cond(clu2,q)":
            t, prim, u, v = jax.lax.cond(
                coh_pred,
                lambda r: self._clu2_intersect(r),
                lambda r: self._small_scene_intersect(r),
                ray,
            )
        elif route == "packet":
            from ..ops.intersect_pallas import pallas_bvh_intersect

            sg = jax.lax.stop_gradient
            perm, inv = self._packet_perm(ray.o, ray.d)
            t, prim, u, v = pallas_bvh_intersect(
                self.pbvh, sg(ray.o[perm]), sg(ray.d[perm]),
                sg(ray.maxt[perm])
            )
            t, prim, u, v = t[inv], prim[inv], u[inv], v[inv]
        else:  # "xla-walk"
            t, prim, u, v = isect.bvh_intersect(
                self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d, ray.maxt
            )
        if self._n_analytic:
            t_a, a_idx = self._analytic_intersect(ray)
            tri_valid = prim >= 0
            a_wins = (a_idx >= 0) & (
                ~tri_valid | (t_a < jnp.where(tri_valid, t, jnp.inf))
            )
            t = jnp.where(a_wins, t_a, t)
            prim = jnp.where(a_wins, geo.n_faces + jnp.maximum(a_idx, 0),
                             prim)
        sdf_n = sdf_uv = sdf_attr = None
        if self.sdfs:
            from .sdf import sdf_intersect

            n_lanes = ray.o.shape[0]
            base_sdf = geo.n_faces + self._n_analytic
            sdf_n = jnp.zeros((n_lanes, 3), jnp.float32)
            sdf_uv = jnp.zeros((n_lanes, 2), jnp.float32)
            sdf_attr = jnp.zeros((n_lanes, 3), jnp.float32)
            for s_i, sdf in enumerate(self.sdfs):
                t_s, hit_s, n_s, uv_s = sdf_intersect(
                    sdf, ray.o, ray.d, ray.maxt
                )
                cur_valid = prim >= 0
                win = hit_s & (
                    ~cur_valid | (t_s < jnp.where(cur_valid, t, jnp.inf))
                )
                t = jnp.where(win, t_s, t)
                prim = jnp.where(win, base_sdf + s_i, prim)
                sdf_n = jnp.where(win[..., None], n_s, sdf_n)
                sdf_uv = jnp.where(win[..., None], uv_s, sdf_uv)
                sdf_attr = jnp.where(win[..., None], sdf.attr[None, :], sdf_attr)
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
        has_extra = geo.tri_attr.shape[1] >= 40  # static
        w = 1.0 - u - v
        if has_extra:
            a_tan = attr[..., 21:24]
            c0 = attr[..., 24:27]
            c1 = attr[..., 27:30]
            c2 = attr[..., 30:33]
            vcol = c0 * w[..., None] + c1 * u[..., None] + c2 * v[..., None]
        else:
            a_tan = None
            vcol = None
        ns = fr.normalize(
            n0 * w[..., None] + n1 * u[..., None] + n2 * v[..., None]
        )
        # flip geometric normal to the shading side consistency (Mitsuba keeps
        # ng fixed and shading frame from ns)
        uv = uv0 * w[..., None] + uv1 * u[..., None] + uv2 * v[..., None]

        if geo.n_spheres:
            # analytic-sphere overrides (exact normal/uv, sphere.cpp:290-330)
            is_sph = valid & (prim >= geo.n_faces) & (
                prim < geo.n_faces + geo.n_spheres
            )
            s_c = jnp.clip(prim - geo.n_faces, 0, geo.n_spheres - 1)
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
        if geo.n_disks:
            # analytic-disk overrides (disk.cpp:260-300): exact frame + polar uv
            base = geo.n_faces + geo.n_spheres
            is_dsk = valid & (prim >= base) & (prim < base + geo.n_disks)
            d_c = jnp.clip(prim - base, 0, geo.n_disks - 1)
            c_d = m.small_gather(geo.dsk_center, d_c)
            n_d = m.small_gather(geo.dsk_n, d_c)
            s_d = m.small_gather(geo.dsk_s, d_c)
            r_d = m.small_gather(geo.dsk_radius[:, None], d_c)[..., 0]
            rel = p - c_d
            xloc = fr.dot(rel, s_d)
            yloc = fr.dot(rel, fr.cross(n_d, s_d))
            r_frac = jnp.sqrt(jnp.maximum(xloc * xloc + yloc * yloc, 0.0)) \
                / jnp.maximum(r_d, 1e-9)
            phi_d = jnp.arctan2(yloc, xloc) * (0.5 / jnp.pi) + 0.5
            uv_d = jnp.stack([r_frac, phi_d], axis=-1)
            dattr = m.small_gather(geo.dsk_attr, d_c)
            ng = jnp.where(is_dsk[..., None], n_d, ng)
            ns = jnp.where(is_dsk[..., None], n_d, ns)
            uv = jnp.where(is_dsk[..., None], uv_d, uv)
            a_mat = jnp.where(is_dsk, dattr[..., 0].astype(jnp.int32), a_mat)
            a_emitter = jnp.where(
                is_dsk, dattr[..., 1].astype(jnp.int32), a_emitter
            )
            a_shape = jnp.where(
                is_dsk, dattr[..., 2].astype(jnp.int32), a_shape
            )
        if geo.n_cylinders:
            # analytic-cylinder overrides (cylinder.cpp:320-360): radial
            # normal + (phi, h) uv
            base = geo.n_faces + geo.n_spheres + geo.n_disks
            is_cyl = valid & (prim >= base) & (prim < base + geo.n_cylinders)
            c_i = jnp.clip(prim - base, 0, geo.n_cylinders - 1)
            p0_c = m.small_gather(geo.cyl_p0, c_i)
            ax_c = m.small_gather(geo.cyl_axis, c_i)
            ln_c = m.small_gather(geo.cyl_len[:, None], c_i)[..., 0]
            rel = p - p0_c
            h = fr.dot(rel, ax_c)
            n_c = fr.normalize(rel - h[..., None] * ax_c)
            s_ax, t_ax = fr.coordinate_system(ax_c)
            phi_c = jnp.arctan2(fr.dot(n_c, t_ax), fr.dot(n_c, s_ax))
            uv_c = jnp.stack(
                [phi_c * (0.5 / jnp.pi) + 0.5,
                 h / jnp.maximum(ln_c, 1e-9)], axis=-1
            )
            cattr = m.small_gather(geo.cyl_attr, c_i)
            ng = jnp.where(is_cyl[..., None], n_c, ng)
            ns = jnp.where(is_cyl[..., None], n_c, ns)
            uv = jnp.where(is_cyl[..., None], uv_c, uv)
            a_mat = jnp.where(is_cyl, cattr[..., 0].astype(jnp.int32), a_mat)
            a_emitter = jnp.where(
                is_cyl, cattr[..., 1].astype(jnp.int32), a_emitter
            )
            a_shape = jnp.where(
                is_cyl, cattr[..., 2].astype(jnp.int32), a_shape
            )

        if self.sdfs:
            base_sdf = geo.n_faces + self._n_analytic
            is_sdf = valid & (prim >= base_sdf)
            ng = jnp.where(is_sdf[..., None], sdf_n, ng)
            ns = jnp.where(is_sdf[..., None], sdf_n, ns)
            uv = jnp.where(is_sdf[..., None], sdf_uv, uv)
            a_mat = jnp.where(is_sdf, sdf_attr[..., 0].astype(jnp.int32), a_mat)
            a_emitter = jnp.where(
                is_sdf, sdf_attr[..., 1].astype(jnp.int32), a_emitter
            )
            a_shape = jnp.where(
                is_sdf, sdf_attr[..., 2].astype(jnp.int32), a_shape
            )

        # tangent-aligned shading frame when the mesh carries fiber/uv
        # tangents (hair fibers need sh_s along the fiber axis); zero
        # tangent rows keep the default arbitrary frame
        sh_s, sh_t = fr.coordinate_system(ns)
        if has_extra:
            tan_len2 = jnp.sum(a_tan * a_tan, axis=-1)
            has_tan = tan_len2 > 0.25
            t_proj = a_tan - fr.dot(a_tan, ns)[..., None] * ns
            t_ok = fr.squared_norm(t_proj) > 1e-12
            t_unit = fr.normalize(
                jnp.where(t_ok[..., None], t_proj, sh_s)
            )
            use_tan = has_tan & t_ok
            sh_s = jnp.where(use_tan[..., None], t_unit, sh_s)
            sh_t = jnp.where(
                use_tan[..., None], fr.cross(ns, t_unit), sh_t
            )
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
            vcol=vcol,
        )

    def _q_occluded(self, ray: Ray):
        from ..ops.intersect_pallas import pallas_occluded_q

        sg = jax.lax.stop_gradient
        return pallas_occluded_q(
            self.geo.tri_q, self.geo.tri_anchor, sg(ray.o), sg(ray.d),
            sg(ray.maxt), n_tris=self.geo.n_faces,
        )

    def _clu2_occluded(self, ray: Ray):
        from ..ops.intersect_pallas import pallas_occluded_clu2

        sg = jax.lax.stop_gradient
        return pallas_occluded_clu2(
            self.ctab2, sg(ray.o), sg(ray.d), sg(ray.maxt)
        )

    def ray_test(self, ray: Ray, coherent: Any = False) -> Any:
        """Shadow-ray occlusion test (True = occluded). Same routing as
        ray_intersect: clu2 for coherent tiles / big meshes (12.5 ms/M on
        cbox camera-bounce shadow sets), 32-way-unrolled q any-hit for
        incoherent small-scene sets (33 ms/M; tools/experiments/)."""
        geo = self.geo
        on_tpu = jax.default_backend() == "tpu"
        coh_static, coh_pred = self._coherent_flag(coherent)
        route = self.intersect_route(
            coherent=(True if coh_static is True
                      else ("pred" if coh_pred is not None else False)),
            on_tpu=on_tpu, anyhit=True,
        )
        if route == "clu2":
            occ = self._clu2_occluded(ray)
        elif route == "cond(clu2,q)":
            occ = jax.lax.cond(
                coh_pred, self._clu2_occluded, self._q_occluded, ray
            )
        elif route == "brute":
            if on_tpu:
                occ = self._q_occluded(ray)
            else:
                occ = isect.chunked_occluded(
                    geo.tri_isect, ray.o, ray.d, ray.maxt
                )
        elif route == "packet":
            from ..ops.intersect_pallas import pallas_bvh_occluded

            sg = jax.lax.stop_gradient
            perm, inv = self._packet_perm(ray.o, ray.d)
            occ = pallas_bvh_occluded(
                self.pbvh, sg(ray.o[perm]), sg(ray.d[perm]),
                sg(ray.maxt[perm])
            )[inv]
        else:
            occ = isect.bvh_occluded(
                self.bvh, geo.tri_p0, geo.tri_p1, geo.tri_p2, ray.o, ray.d,
                ray.maxt,
            )
        if self._n_analytic:
            _, a_idx = self._analytic_intersect(ray)
            occ = occ | (a_idx >= 0)
        if self.sdfs:
            from .sdf import sdf_intersect

            for sdf in self.sdfs:
                _, hit_s, _, _ = sdf_intersect(sdf, ray.o, ray.d, ray.maxt)
                occ = occ | hit_s
        return occ


# ---------------------------------------------------------------------------
# host-side assembly
# ---------------------------------------------------------------------------

def build_geometry(
    meshes, mat_ids, emitter_ids, shape_ids=None, spheres=None, disks=None,
    cylinders=None,
) -> Tuple[Geometry, BVH]:
    """meshes: list[HostMesh] (already transformed to world); mat_ids /
    emitter_ids: per-mesh ints (-1 = no emitter); spheres / disks /
    cylinders: optional lists of analytic-primitive dicts (exact
    intersections, no tessellation bias — sphere.cpp / disk.cpp /
    cylinder.cpp roles)."""
    P0, P1, P2, N0, N1, N2, U0, U1, U2 = [], [], [], [], [], [], [], [], []
    FN, MAT, EMI, SHP, TAN, VC = [], [], [], [], [], []

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
        if mesh.tangents is not None:
            tg = (
                mesh.tangents[f[:, 0]] + mesh.tangents[f[:, 1]]
                + mesh.tangents[f[:, 2]]
            )
            tg /= np.maximum(np.linalg.norm(tg, axis=-1, keepdims=True), 1e-9)
            TAN.append(tg)
        else:
            TAN.append(np.zeros((len(f), 3), np.float32))
        if mesh.colors is not None:
            VC.append(np.concatenate(
                [mesh.colors[f[:, 0]], mesh.colors[f[:, 1]],
                 mesh.colors[f[:, 2]]], axis=-1
            ))
        else:
            VC.append(np.zeros((len(f), 9), np.float32))
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

    # precomputed-quantities rows for the Pallas brute kernels
    from ..ops.intersect_pallas import pack_tri_q

    tri_q, tri_anchor = pack_tri_q(p0c, p1c, p2c)

    # packed shading attributes: ng(3) n0(3) n1(3) n2(3) uv0(2) uv1(2)
    # uv2(2) mat(1) emitter(1) shape(1) [tangent(3) corner-colors(9) only
    # when some mesh carries them — the narrow 24-col layout keeps the
    # common per-bounce gather small]
    tan_cat = cat(TAN)
    vc_cat = cat(VC)
    has_extra = bool((np.abs(tan_cat).max() if len(tan_cat) else 0.0) > 0
                     or (np.abs(vc_cat).max() if len(vc_cat) else 0.0) > 0)
    attr = np.zeros((nf_total, 40 if has_extra else 24), np.float32)
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
    if has_extra:
        # fiber/uv tangent (zero = no tangent; frame falls back to
        # coordinate_system), consumed by the hair BSDF's fiber frame +
        # per-corner vertex colors (mesh_attribute texture role)
        attr[:, 21:24] = tan_cat
        attr[:, 24:33] = vc_cat

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
        tri_q=jnp.asarray(tri_q),
        tri_anchor=jnp.asarray(tri_anchor),

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
        **(
            dict(
                dsk_center=jnp.asarray(
                    np.stack([np.asarray(d["center"], np.float32)
                              for d in disks])
                ),
                dsk_n=jnp.asarray(
                    np.stack([np.asarray(d["n"], np.float32) for d in disks])
                ),
                dsk_s=jnp.asarray(
                    np.stack([np.asarray(d["s"], np.float32) for d in disks])
                ),
                dsk_radius=jnp.asarray(
                    np.asarray([d["radius"] for d in disks], np.float32)
                ),
                dsk_attr=jnp.asarray(
                    np.asarray(
                        [[d.get("mat", 0), d.get("emitter", -1),
                          d.get("shape", -1)] for d in disks],
                        np.float32,
                    )
                ),
            )
            if disks
            else {}
        ),
        **(
            dict(
                cyl_p0=jnp.asarray(
                    np.stack([np.asarray(c["p0"], np.float32)
                              for c in cylinders])
                ),
                cyl_axis=jnp.asarray(
                    np.stack([np.asarray(c["axis"], np.float32)
                              for c in cylinders])
                ),
                cyl_len=jnp.asarray(
                    np.asarray([c["length"] for c in cylinders], np.float32)
                ),
                cyl_radius=jnp.asarray(
                    np.asarray([c["radius"] for c in cylinders], np.float32)
                ),
                cyl_attr=jnp.asarray(
                    np.asarray(
                        [[c.get("mat", 0), c.get("emitter", -1),
                          c.get("shape", -1)] for c in cylinders],
                        np.float32,
                    )
                ),
            )
            if cylinders
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
    if geo.dsk_center is not None:
        c = np.asarray(geo.dsk_center)
        r = np.asarray(geo.dsk_radius)[:, None]
        lo = np.minimum(lo, (c - r).min(0))
        hi = np.maximum(hi, (c + r).max(0))
    if geo.cyl_p0 is not None:
        a = np.asarray(geo.cyl_p0)
        b = a + np.asarray(geo.cyl_axis) * np.asarray(geo.cyl_len)[:, None]
        r = np.asarray(geo.cyl_radius)[:, None]
        lo = np.minimum(lo, np.minimum(a, b).min(0) - r.max())
        hi = np.maximum(hi, np.maximum(a, b).max(0) + r.max())
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo) / 2)
    return center.astype(np.float32), radius
