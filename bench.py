"""Benchmark harness: renders the Cornell box with the path integrator and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md): the reference's classic MIS path tracer does
500x500 px / 44.64 ms-per-spp  ~= 5.6 M camera samples/s on its (unspecified)
NVIDIA GPU. vs_baseline = our camera-samples/s over that number.
"""
from __future__ import annotations

import json
import time

REF_CAMERA_SAMPLES_PER_S = 5.6e6  # BASELINE.md derived anchor (cbox-path)


def main():
    import jax

    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.common import render

    width = height = 512
    spp_per_pass = 8
    scene, _ = cornell_box(width, height)
    integ = PathIntegrator(max_depth=6, rr_depth=5)

    def run(spp, seed=0):
        img = render(
            scene, integ.sample, seed=seed, spp=spp, cfg=RGB,
            spp_per_pass=spp_per_pass,
        )
        jax.block_until_ready(img)
        return img

    run(spp_per_pass, seed=1)  # warmup/compile
    n_spp = 32
    t0 = time.perf_counter()
    run(n_spp)
    dt = time.perf_counter() - t0

    samples_per_s = width * height * n_spp / dt
    print(
        json.dumps(
            {
                "metric": "cbox_path_camera_samples_per_s",
                "value": round(samples_per_s, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_s / REF_CAMERA_SAMPLES_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
