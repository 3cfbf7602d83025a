"""Multi-device scaling report: rays/s at 1 chip / N chips (/ N hosts).

BASELINE.json asks for rays/s reported at 1 chip, 1 host, and N>=2 hosts with
>= 85% scaling efficiency. This harness runs the sharded render path
(mitsuba3_plt_tpu/parallel/render.py) over growing mesh sizes and writes the
params.json-style report. On a single-chip box, run with
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py
to validate the sharding path on a virtual mesh (relative efficiency numbers
on virtual CPU devices are NOT hardware numbers — the report marks them).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time


def main():
    import jax

    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.parallel.render import make_mesh, make_render_pass_sharded

    n_dev = len(jax.devices())
    width = height = 256
    spp = 4
    scene, _ = cornell_box(width, height)
    integ = PathIntegrator(max_depth=4, rr_depth=5)

    sizes = [1]
    d = 2
    while d <= n_dev:
        sizes.append(d)
        d *= 2

    results = []
    for nd in sizes:
        mesh = make_mesh(nd)
        run = make_render_pass_sharded(
            integ.sample, mesh, width, height, spp, RGB
        )
        out = jax.block_until_ready(run(scene, 0, 0))  # compile
        ts = []
        for i in range(1, 4):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(scene, 0, i))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        sps = width * height * spp / dt
        results.append({"devices": nd, "time_s": round(dt, 4),
                        "camera_samples_per_s": round(sps, 1)})

    base = results[0]["camera_samples_per_s"]
    for r in results:
        r["efficiency"] = round(
            r["camera_samples_per_s"] / (base * r["devices"]), 4
        )

    report = {
        "backend": jax.default_backend(),
        "n_devices": n_dev,
        "workload": f"cbox {width}x{height} spp{spp} depth4",
        "virtual_devices": jax.default_backend() == "cpu",
        "results": results,
    }
    print(json.dumps(report, indent=2))
    with open("scaling_report.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
