"""Reference-parity report: render the scenes the reference ships results
for, at matched resolution, and compare against its actual output
(results/*/result*.exr decoded with the native PIZ codec; tonemapped PNGs
where no HDR reference exists).

Reference scheme: src/render/tests/test_renders.py:159-232 compares per-
pixel z-tests against stored references; here we report RMSE / relMSE and
a tonemapped 8-bit mean|diff| so residual MC noise in our render reads
directly (the references are converged: 4096-8192 spp).

Usage: PYTHONPATH=. python tools/parity_report.py [--spp 512] [--out docs/PARITY.md]
Runs on whatever backend JAX picks (TPU when available).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"


def render_scene(xml, w, h, spp, integrator=None, rfilter=None):
    import mitsuba3_plt_tpu as mi

    scene, meta = mi.load_file(xml, resx=w, resy=h)
    if integrator or rfilter:
        meta = dict(meta)
    if integrator:
        meta["integrator"] = dict(meta.get("integrator") or {})
        meta["integrator"]["type"] = integrator
    if rfilter:
        meta["rfilter"] = rfilter
    t0 = time.perf_counter()
    img = np.asarray(mi.render((scene, meta), spp=spp))
    dt = time.perf_counter() - t0
    return img, dt


def metrics(ours, ref):
    diff = ours - ref
    rmse = float(np.sqrt(np.mean(diff ** 2)))
    rel = float(np.mean(diff ** 2 / (ref ** 2 + 1e-2)))
    # tonemapped 8-bit comparison (what the eye sees)
    from mitsuba3_plt_tpu.utils.io import tonemap_srgb

    t_ours = tonemap_srgb(ours).astype(np.float32)
    t_ref = tonemap_srgb(ref).astype(np.float32)
    mad8 = float(np.abs(t_ours - t_ref).mean())
    return dict(rmse=round(rmse, 5), relMSE=round(rel, 5),
                tonemapped_mad_8bit=round(mad8, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=512)
    ap.add_argument("--out", default="docs/PARITY.md")
    ap.add_argument("--jobs", default="")
    ap.add_argument("--rfilter", default=None,
                    help="override reconstruction filter (e.g. box)")
    args = ap.parse_args()

    from mitsuba3_plt_tpu.utils.exr import read_exr_rgb

    jobs = [
        # name, scene, integrator, (w,h), reference image, kind
        ("cbox-path", f"{REF}/scenes/cbox/cbox.xml", "path", (500, 500),
         f"{REF}/results/cbox-path/result_s0.exr", "exr"),
        ("cbox-plt", f"{REF}/scenes/cbox/cbox.xml", "plt", (500, 500),
         f"{REF}/results/cbox-plt/result_s0.exr", "exr"),
        ("gratings-plt", f"{REF}/scenes/gratings/gratings.xml", "plt",
         (800, 600), f"{REF}/results/grating-spp/plt/result_4096.png", "png"),
        # disk.xml runs max_depth=12 PLT (the heaviest workload); spp
        # scaled down to keep the report under an hour
        ("disk-plt", f"{REF}/scenes/disk/disk.xml", "plt",
         (800, 600), f"{REF}/results/disk/result_s0.png", "png", 8),
        ("veach-path", f"{REF}/scenes/veach-mis/scene.xml", "path",
         (1280, 720), f"{REF}/results/veach/path.png", "png"),
    ]
    if args.jobs:
        keep = set(args.jobs.split(","))
        jobs = [j for j in jobs if j[0] in keep]

    rows = []
    for job in jobs:
        name, xml, integ, (w, h), refpath, kind = job[:6]
        spp = args.spp // job[6] if len(job) > 6 else args.spp
        if not os.path.exists(refpath):
            print(f"[{name}] reference missing: {refpath}", file=sys.stderr)
            continue
        print(f"[{name}] rendering {w}x{h} spp={spp} ({integ})...",
              file=sys.stderr)
        try:
            ours, dt = render_scene(xml, w, h, spp, integ,
                                    rfilter=args.rfilter)
        except Exception as e:
            rows.append((name, {"error": repr(e)[:120]}, 0.0))
            continue
        ours = np.asarray(ours[..., :3], np.float32)
        if kind == "exr":
            ref = read_exr_rgb(refpath)
            mt = metrics(ours, ref)
        else:
            from PIL import Image
            from mitsuba3_plt_tpu.utils.io import tonemap_srgb

            refpng = np.asarray(Image.open(refpath), np.float32)[..., :3]
            t_ours = tonemap_srgb(ours).astype(np.float32)
            mt = {"tonemapped_mad_8bit":
                  round(float(np.abs(t_ours - refpng).mean()), 3)}
        rows.append((name, mt, dt))
        print(f"[{name}] {mt} ({dt:.1f}s)", file=sys.stderr)

    lines = [
        "# Reference parity report",
        "",
        f"Rendered at matched resolution, spp={args.spp} (references are "
        "4096-8192 spp), compared against the reference's shipped renders "
        "decoded from its PIZ EXRs / PNGs. relMSE = mean((a-b)^2/(b^2+0.01)).",
        "",
        "| scene | metrics | our render time |",
        "|---|---|---|",
    ]
    for name, mt, dt in rows:
        lines.append(f"| {name} | {json.dumps(mt)} | {dt:.1f}s |")
    out = "\n".join(lines) + "\n"
    with open(args.out, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
