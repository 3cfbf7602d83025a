"""Python-dict scene loader — mi.load_dict twin (reference
src/core/python/xml_v.cpp:116 load_dict semantics on the supported subset).

Accepts the Mitsuba dict convention: {"type": "scene", <name>: {"type": ...,
props...}, ...}. BSDF references use {"type": "ref", "id": name}.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core import transform as tf
from ..librender.bsdf import (
    BSDF_DIFFUSE, BSDF_CONDUCTOR, BSDF_ROUGH_CONDUCTOR, BSDF_DIELECTRIC,
    BSDF_THIN_DIELECTRIC, BSDF_ROUGH_DIELECTRIC, BSDF_PLASTIC,
    BSDF_ROUGH_PLASTIC, BSDF_MASK, BSDF_POLARIZER, BSDF_RETARDER,
    BSDF_ROUGH_GRATING, BSDF_NULL, BSDF_PRINCIPLED, BSDF_PRINCIPLED_THIN,
    BSDF_MEASURED, BSDF_HAIR, BSDF_MEASURED_POLARIZED,
)
from ..librender.sensor import Sensor
from . import shape as shp
from .loader import LoadedBSDF, assemble_scene, CONDUCTOR_PRESETS

BSDF_TYPE_MAP = {
    "diffuse": BSDF_DIFFUSE,
    "conductor": BSDF_CONDUCTOR,
    "roughconductor": BSDF_ROUGH_CONDUCTOR,
    "dielectric": BSDF_DIELECTRIC,
    "thindielectric": BSDF_THIN_DIELECTRIC,
    "roughdielectric": BSDF_ROUGH_DIELECTRIC,
    "plastic": BSDF_PLASTIC,
    "roughplastic": BSDF_ROUGH_PLASTIC,
    "mask": BSDF_MASK,
    "polarizer": BSDF_POLARIZER,
    "retarder": BSDF_RETARDER,
    "roughgrating": BSDF_ROUGH_GRATING,
    "null": BSDF_NULL,
    "principled": BSDF_PRINCIPLED,
    "principledthin": BSDF_PRINCIPLED_THIN,
    "measured": BSDF_MEASURED,
    "hair": BSDF_HAIR,
    "measured_polarized": BSDF_MEASURED_POLARIZED,
}


def _color(v):
    if isinstance(v, dict):
        # {"type": "rgb"/"spectrum", "value": ...}
        v = v.get("value", 0.5)
    if np.isscalar(v):
        return (float(v),) * 3
    return tuple(float(x) for x in v)


def _parse_bsdf_dict(d: dict) -> LoadedBSDF:
    t = d.get("type", "diffuse")
    twosided = False
    while t == "twosided":
        inner = next(
            (v for v in d.values() if isinstance(v, dict) and "type" in v
             and v["type"] in BSDF_TYPE_MAP or
             (isinstance(v, dict) and v.get("type") == "twosided")),
            {"type": "diffuse"},
        )
        d = inner
        t = d.get("type", "diffuse")
        twosided = True
    bt = BSDF_TYPE_MAP.get(t, BSDF_DIFFUSE)
    kw = {"twosided": twosided}

    refl = d.get("reflectance")
    if isinstance(refl, dict) and refl.get("type") == "mesh_attribute":
        kw["mesh_attribute"] = True
    elif isinstance(refl, dict) and refl.get("type") == "volume":
        kw["volume_tex"] = refl.get("grid", refl.get("filename"))
    elif "reflectance" in d:
        kw["base_color"] = _color(d["reflectance"])
    if "diffuse_reflectance" in d:
        kw["base_color"] = _color(d["diffuse_reflectance"])
    if "specular_reflectance" in d:
        kw.setdefault("base_color", _color(d["specular_reflectance"]))
    if "specular_transmittance" in d:
        kw["transmittance"] = _color(d["specular_transmittance"])
    if "material" in d and d["material"] in CONDUCTOR_PRESETS:
        e, k = CONDUCTOR_PRESETS[d["material"].lower()]
        kw["eta_re"], kw["eta_im"] = e, k
        kw["ior_name"] = d["material"].lower()
    if "eta" in d:
        kw["eta_re"] = _color(d["eta"])
    if "k" in d:
        kw["eta_im"] = _color(d["k"])
    if "int_ior" in d:
        int_ior = float(d["int_ior"]) if not isinstance(d["int_ior"], str) else 1.5046
        ext = d.get("ext_ior", 1.000277)
        ext_ior = float(ext) if not isinstance(ext, str) else 1.000277
        kw["eta_re"] = (int_ior / ext_ior,) * 3
    if "alpha" in d:
        a = float(d["alpha"]) if np.isscalar(d["alpha"]) else float(d["alpha"])
        kw["alpha"] = (a, a)
    if "alpha_u" in d or "alpha_v" in d:
        kw["alpha"] = (float(d.get("alpha_u", 0.1)), float(d.get("alpha_v", 0.1)))
    if "distribution" in d:
        kw["mf_type"] = 0 if d["distribution"] == "ggx" else 1
    if bt == BSDF_PRINCIPLED:
        if "base_color" in d:
            kw["base_color"] = _color(d["base_color"])
        rough = float(d.get("roughness", 0.5))
        kw["alpha"] = (rough, rough)
        kw["pr_params"] = (
            float(d.get("metallic", 0.0)), float(d.get("specular", 0.5)),
            float(d.get("spec_tint", 0.0)), float(d.get("sheen", 0.0)),
            float(d.get("sheen_tint", 0.5)), float(d.get("clearcoat", 0.0)),
            float(d.get("clearcoat_gloss", 0.0)),
            float(d.get("anisotropic", 0.0)),
        )
    if bt == BSDF_PRINCIPLED_THIN:
        # thin pr_params layout (src/bsdfs/principledthin.cpp props)
        if "base_color" in d:
            kw["base_color"] = _color(d["base_color"])
        rough = float(d.get("roughness", 0.5))
        kw["alpha"] = (rough, rough)
        kw["eta_re"] = (float(d.get("eta", 1.5)),) * 3
        kw["pr_params"] = (
            float(d.get("spec_trans", 0.0)),
            float(d.get("diff_trans", 0.0)) / 2.0,
            float(d.get("spec_tint", 0.0)), float(d.get("sheen", 0.0)),
            float(d.get("sheen_tint", 0.5)), float(d.get("flatness", 0.0)),
            0.0, float(d.get("anisotropic", 0.0)),
        )
    if bt == BSDF_HAIR:
        sig = d.get("sigma_a")
        use_sig = sig is not None
        kw["base_color"] = _color(sig) if use_sig else (0.42, 0.42, 0.42)
        kw["eta_re"] = (float(d.get("int_ior", 1.55)),) * 3
        kw["pr_params"] = (
            float(d.get("beta_m", 0.3)), float(d.get("beta_n", 0.3)),
            float(d.get("alpha", 2.0)), float(d.get("eumelanin", 1.3)),
            float(d.get("pheomelanin", 0.0)), 1.0 if use_sig else 0.0,
            0.0, 0.0,
        )
    if bt == BSDF_MEASURED_POLARIZED:
        if "filename" in d:
            kw["filename"] = d["filename"]
        if "data" in d:
            kw["mpol_data"] = d["data"]
        kw["alpha"] = (float(d.get("alpha_sample", 0.3)),) * 2
    if bt == BSDF_MEASURED:
        if "filename" in d:
            kw["filename"] = d["filename"]
        if "data" in d:
            kw["meas_data"] = d["data"]  # parsed tensor dict (tests)
    if "opacity" in d:
        kw["weight"] = float(d["opacity"]) if np.isscalar(d["opacity"]) else 0.5
    if "theta" in d:
        kw["weight"] = float(d["theta"])
    # grating params
    for src, dst in [
        ("inv_period", "grt_inv_period"), ("height", "grt_height"),
        ("lobes", "grt_lobes"), ("multiplier", "grt_multiplier"),
        ("coherence", "grt_coherence"),
    ]:
        if src in d:
            v = d[src]
            if dst == "grt_inv_period":
                v = (float(v), 0.0) if np.isscalar(v) else tuple(v)
            kw[dst] = v
    if "inv_period_x" in d:
        kw["grt_inv_period"] = (
            float(d["inv_period_x"]), float(d.get("inv_period_y", 0.0))
        )
    if "lobe_type" in d:
        kw["grt_type"] = {"sinusoidal": 0, "rectangular": 1, "linear": 2}.get(
            d["lobe_type"], 0
        ) | (16 if d.get("radial", False) else 0)
    return LoadedBSDF(bt, **kw)


def _to_world(d):
    v = d.get("to_world")
    if v is None:
        return np.eye(4, dtype=np.float32)
    return np.asarray(v, np.float32)


def load_dict(scene_dict: Dict):
    """Build a Scene from a Mitsuba-style dict. Returns (scene, meta)."""
    assert scene_dict.get("type") == "scene", "top-level type must be 'scene'"

    named_bsdfs: Dict[str, int] = {}
    bsdf_list = []
    meshes, mesh_mat, mesh_emitter = [], [], []
    emitters = []
    sensor = None
    integrator_cfg = {"type": "path"}
    spp = 16

    def add_bsdf(lb):
        bsdf_list.append(lb)
        return len(bsdf_list) - 1

    items = [(k, v) for k, v in scene_dict.items()
             if isinstance(v, dict) and "type" in v]

    # pass 1: integrator / sensor / named bsdfs / emitters
    for name, obj in items:
        t = obj["type"]
        if t in ("path", "direct", "depth", "aov", "moment", "plt", "stokes",
                 "stokes_fw", "mispath", "prb"):
            integrator_cfg = dict(obj)
        elif t in BSDF_TYPE_MAP or t == "twosided":
            named_bsdfs[name] = add_bsdf(_parse_bsdf_dict(obj))
        elif t in ("area",):
            pass  # handled inline with shapes
        elif t in ("point", "constant", "directional", "spot", "envmap",
                   "directionalspot", "projector"):
            e = {"type": t, **{k: v for k, v in obj.items() if k != "type"}}
            if "to_world" in obj:
                e["to_world"] = np.asarray(obj["to_world"], np.float32)
            for key in ("radiance", "intensity", "irradiance"):
                if key in obj:
                    v = obj[key]
                    if isinstance(v, np.ndarray) and v.ndim == 3:
                        e["image"] = v  # textured irradiance (projector)
                    else:
                        e["radiance"] = _color(v)
            emitters.append(e)
        elif t in ("perspective", "orthographic", "thinlens"):
            fw = fh = 256
            film = next((v for v in obj.values()
                         if isinstance(v, dict) and v.get("type") == "hdrfilm"),
                        None)
            if film:
                fw = int(film.get("width", 256))
                fh = int(film.get("height", 256))
            smp = next((v for v in obj.values()
                        if isinstance(v, dict)
                        and v.get("type") in ("independent", "stratified",
                                              "multijitter")), None)
            if smp:
                spp = int(smp.get("sample_count", 16))
            tw = _to_world(obj)
            if t == "perspective":
                sensor = Sensor.perspective(tw, float(obj.get("fov", 45.0)),
                                            fw, fh)
            elif t == "orthographic":
                sensor = Sensor.orthographic(tw, fw, fh)
            else:
                sensor = Sensor.thinlens(
                    tw, float(obj.get("fov", 45.0)), fw, fh,
                    aperture_radius=float(obj.get("aperture_radius", 0.1)),
                    focus_distance=float(obj.get("focus_distance", 1.0)),
                )

    # pass 2: shapes
    MAKERS = {
        "rectangle": shp.make_rectangle, "cube": shp.make_cube,
        "sphere": shp.make_sphere, "disk": shp.make_disk,
        "cylinder": shp.make_cylinder,
    }
    disks = []
    cylinders = []
    sdf_shapes = []

    def _shape_mat(obj):
        for v in obj.values():
            if not isinstance(v, dict):
                continue
            vt = v.get("type")
            if vt == "ref" and v.get("id") in named_bsdfs:
                return named_bsdfs[v["id"]]
            if vt in BSDF_TYPE_MAP or vt == "twosided":
                return add_bsdf(_parse_bsdf_dict(v))
        return add_bsdf(LoadedBSDF(BSDF_DIFFUSE, base_color=(0.5,) * 3))

    for name, obj in items:
        t = obj["type"]
        if t == "sdfgrid":
            g = obj.get("grid")
            if g is None and "filename" in obj:
                from ..utils.io import read_vol

                g, _, _ = read_vol(obj["filename"])
                g = g[..., 0]
            sdf_shapes.append({
                "grid": np.asarray(g, np.float32),
                "to_world": np.asarray(_to_world(obj), np.float32),
                "mat": _shape_mat(obj),
            })
            continue
        if t not in ("rectangle", "cube", "sphere", "disk", "cylinder",
                     "ply", "obj", "mesh", "bsplinecurve", "linearcurve"):
            continue
        has_emitter = any(
            isinstance(v, dict) and v.get("type") in ("area", "directionalarea")
            for v in obj.values()
        )
        if t in ("disk", "cylinder") and not has_emitter:
            # analytic primitives (disk.cpp / cylinder.cpp) when uniformly
            # scaled; tessellated fallback otherwise
            M = np.asarray(_to_world(obj), np.float64)
            R = M[:3, :3]
            sx = float(np.linalg.norm(R[:, 0]))
            sy = float(np.linalg.norm(R[:, 1]))
            if abs(sx - sy) < 1e-5 * max(sx, sy, 1e-9):
                mat_idx = _shape_mat(obj)
                if t == "disk":
                    disks.append({
                        "center": M[:3, 3].astype(np.float32),
                        "n": (R[:, 2] / max(np.linalg.norm(R[:, 2]), 1e-12)
                              ).astype(np.float32),
                        "s": (R[:, 0] / max(sx, 1e-12)).astype(np.float32),
                        "radius": sx * float(obj.get("radius", 1.0)),
                        "mat": mat_idx, "emitter": -1,
                        "shape": 20000 + len(disks),
                    })
                else:
                    p0l = np.append(
                        np.asarray(obj.get("p0", (0, 0, 0)), np.float64), 1.0
                    )
                    p1l = np.append(
                        np.asarray(obj.get("p1", (0, 0, 1)), np.float64), 1.0
                    )
                    p0w = (M @ p0l)[:3]
                    p1w = (M @ p1l)[:3]
                    axis = p1w - p0w
                    length = float(np.linalg.norm(axis))
                    cylinders.append({
                        "p0": p0w.astype(np.float32),
                        "axis": (axis / max(length, 1e-12)).astype(np.float32),
                        "length": length,
                        "radius": sx * float(obj.get("radius", 1.0)),
                        "mat": mat_idx, "emitter": -1,
                        "shape": 30000 + len(cylinders),
                    })
                continue
        if t == "mesh":
            mesh = obj["mesh"]  # in-memory HostMesh (bench/tests)
        elif t in ("bsplinecurve", "linearcurve"):
            mesh = shp.load_curve_mesh(
                obj["filename"], bspline=(t == "bsplinecurve")
            )
        elif t == "ply":
            mesh = shp.load_ply(obj["filename"])
        elif t == "obj":
            mesh = shp.load_obj(obj["filename"])
        else:
            mesh = MAKERS[t]()
        tw = _to_world(obj)
        if t == "sphere" and "center" in obj:
            tw = tw @ tf.translate(np.asarray(obj["center"])) @ tf.scale(
                obj.get("radius", 1.0)
            )
        mesh = mesh.transformed(tw.astype(np.float32))
        if obj.get("face_normals", False):
            mesh = shp.HostMesh(vertices=mesh.vertices, faces=mesh.faces,
                                normals=None, uvs=mesh.uvs, face_normals=True)

        mat_idx = None
        em_idx = -1
        for k, v in obj.items():
            if not isinstance(v, dict):
                continue
            vt = v.get("type")
            if vt == "ref" and v.get("id") in named_bsdfs:
                mat_idx = named_bsdfs[v["id"]]
            elif vt in BSDF_TYPE_MAP or vt == "twosided":
                mat_idx = add_bsdf(_parse_bsdf_dict(v))
            elif vt in ("area", "directionalarea"):
                emitters.append({
                    "type": vt, "mesh_index": len(meshes),
                    "radiance": _color(v.get("radiance", (1, 1, 1))),
                })
                em_idx = len(emitters) - 1
        if mat_idx is None:
            mat_idx = add_bsdf(LoadedBSDF(BSDF_DIFFUSE, base_color=(0.5,) * 3))

        meshes.append(mesh)
        mesh_mat.append(mat_idx)
        mesh_emitter.append(em_idx)

    return assemble_scene(
        meshes, mesh_mat, mesh_emitter, bsdf_list, emitters, sensor,
        integrator_cfg, spp, disks=disks, cylinders=cylinders,
        sdf_shapes=sdf_shapes,
    )
