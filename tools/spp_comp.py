"""spp-convergence analysis: RMSE (and relMSE) vs sample count against a
high-spp reference render — the fork's scripts/rendering/spp-comp.py role
(FLIP is perceptual and omitted; relMSE covers the same ranking use).

    python tools/spp_comp.py scene.xml --integrator plt --spps 16 64 256
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json
import time


def rmse(a, b):
    import numpy as np

    return float(np.sqrt(np.mean((a - b) ** 2)))


def rel_mse(a, ref):
    import numpy as np

    return float(np.mean((a - ref) ** 2 / (ref * ref + 1e-2)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--integrator", default=None)
    ap.add_argument("--spps", type=int, nargs="+", default=[16, 64, 256])
    ap.add_argument("--ref-spp", type=int, default=2048)
    ap.add_argument("--resx", type=int, default=128)
    ap.add_argument("--resy", type=int, default=128)
    ap.add_argument("-o", "--output", default="spp_comp.json")
    args = ap.parse_args(argv)

    import numpy as np
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.integrators import make_integrator

    scene, meta = mi.load_file(args.scene, resx=args.resx, resy=args.resy)
    icfg = meta.get("integrator", {"type": "path"})
    if args.integrator:
        icfg = {**icfg, "type": args.integrator}
    integ = make_integrator(icfg)

    ref = np.asarray(
        mi.render((scene, meta), integrator=integ, spp=args.ref_spp, seed=999)
    )

    # one fixed spp_per_pass across all runs -> ONE compiled pass shape;
    # compile time is reported once, steady-state timing excludes it
    # (bench-methodology parity with bench.py: compile and steady-state
    # must never be conflated)
    mw = getattr(integ, "max_wavefront", None) or (1 << 21)
    spp_per_pass = max(1, min(min(args.spps), mw // (args.resx * args.resy)
                              or 1))

    rows = []
    for spp in args.spps:
        stats = {}
        t0 = time.perf_counter()
        img = np.asarray(
            mi.render((scene, meta), integrator=integ, spp=spp, seed=0,
                      spp_per_pass=spp_per_pass, stats=stats)
        )
        dt = time.perf_counter() - t0
        compile_s = stats.get("compile_s") or 0.0
        steady_s = max(dt - compile_s, 1e-9)
        # after the first spp value the pass function is cached; compile_s
        # then measures only the first-pass dispatch
        rows.append({
            "spp": spp,
            "time_s": round(dt, 3),
            "compile_s": round(compile_s, 3),
            "steady_s": round(steady_s, 3),
            "steady_ms_per_spp": round(steady_s / spp * 1e3, 3),
            "camera_samples_per_s": round(
                args.resx * args.resy * spp / steady_s, 1
            ),
            "rmse": round(rmse(img, ref), 6),
            "rel_mse": round(rel_mse(img, ref), 6),
        })
        print(rows[-1])

    out = {"scene": args.scene, "integrator": icfg, "ref_spp": args.ref_spp,
           "resolution": [args.resx, args.resy], "rows": rows}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
