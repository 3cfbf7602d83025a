"""Render CLI — the role of the reference's C++ `mitsuba` binary
(src/mitsuba/mitsuba.cpp:37-150) and the fork's headless harness
(scripts/rendering/main-headless.py:23-111):

    python -m mitsuba3_plt_tpu.cli scene.xml -o out/result \\
        --spp 256 -D key=value --variant rgb --integrator plt

Writes <out>.pfm (+ .png tonemapped) and <out>_params.json with timing in
the fork's params.json convention (time_per_sample et al.), plus S0..S3
bitmaps when a stokes integrator runs.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="mitsuba3_plt_tpu renderer")
    ap.add_argument("scene", help="scene .xml file or .py dict module")
    ap.add_argument("-o", "--output", default="result")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("-m", "--variant", default="rgb",
                    help="rgb | rgb_polarized | spectral | spectral_polarized")
    ap.add_argument("-D", "--define", action="append", default=[],
                    help="scene parameter overrides key=value")
    ap.add_argument("--integrator", default=None,
                    help="override integrator (path/plt/stokes/...)")
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resx", type=int, default=None)
    ap.add_argument("--resy", type=int, default=None)
    ap.add_argument("--sampler", default="independent")
    ap.add_argument("--timeout", type=float, default=None,
                    help="cooperative render timeout in seconds; writes the "
                         "partial image (reference integrator.cpp timeout)")
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the render")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    import numpy as np
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.utils.io import write_bitmap

    mi.set_variant(args.variant)

    params = {}
    for d in args.define:
        k, _, v = d.partition("=")
        params[k] = v
    if args.resx:
        params["resx"] = args.resx
    if args.resy:
        params["resy"] = args.resy

    t0 = time.perf_counter()
    scene, meta = mi.load_file(args.scene, parameters=params)
    t_load = time.perf_counter() - t0

    integrator_cfg = meta.get("integrator", {"type": "path"})
    if args.integrator:
        integrator_cfg = {**integrator_cfg, "type": args.integrator}
    if args.max_depth:
        integrator_cfg["max_depth"] = args.max_depth
    from mitsuba3_plt_tpu.integrators import make_integrator

    integ = make_integrator(integrator_cfg)
    spp = args.spp or meta.get("spp", 16)

    stats = {}

    def _progress(done, total, elapsed):
        if not args.quiet:
            pct = 100.0 * done / total
            print(f"\r[{pct:5.1f}%] pass {done}/{total}  {elapsed:7.1f}s",
                  end="", flush=True)

    import contextlib

    import jax

    prof_ctx = (
        jax.profiler.trace(args.profile) if args.profile
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with prof_ctx:
        img = np.asarray(
            mi.render(
                (scene, {**meta, "integrator": integrator_cfg}),
                integrator=integ, spp=spp, seed=args.seed,
                sampler_type=args.sampler,
                timeout=args.timeout, progress=_progress, stats=stats,
            )
        )
    t_render = time.perf_counter() - t0
    if not args.quiet:
        print()

    out = args.output
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    if img.shape[-1] >= 15:
        # stokes AOVs: split like the fork's stokes_to_bitmaps
        write_bitmap(out + ".pfm", img[..., :3])
        write_bitmap(out + ".png", img[..., :3])
        for i, name in enumerate(["S0", "S1", "S2", "S3"]):
            write_bitmap(f"{out}_{name}.pfm", img[..., 3 + 3 * i:6 + 3 * i])
    else:
        write_bitmap(out + ".pfm", img[..., :3])
        write_bitmap(out + ".png", img[..., :3])

    meta_out = {
        "scene": os.path.abspath(args.scene),
        "variant": args.variant,
        "integrator": integrator_cfg,
        "spp": spp,
        "resolution": list(scene.sensor.resolution),
        "load_time_s": round(t_load, 3),
        "render_time_s": round(t_render, 3),
        "time_per_sample": round(t_render / max(spp, 1) * 1e3, 3),  # ms/spp
        # compile vs steady-state split (the reference's params.json only
        # records wall time; keep both so perf numbers are comparable)
        **{k: v for k, v in stats.items()},
        "time_per_sample_steady": (
            round(stats["steady_s_per_pass"]
                  / max(stats["spp_done"] // max(stats["passes_done"], 1), 1)
                  * 1e3, 3)
            if stats.get("steady_s_per_pass") else None
        ),
    }
    with open(out + "_params.json", "w") as f:
        json.dump(meta_out, f, indent=2)
    print(json.dumps(meta_out))


if __name__ == "__main__":
    main()
