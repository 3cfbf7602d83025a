"""Benchmark harness: renders the Cornell box with the path integrator and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md): the reference's classic MIS path tracer does
500x500 px / 44.64 ms-per-spp ~= 5.6 M camera samples/s on its (unspecified)
NVIDIA GPU. vs_baseline = our camera-samples/s over that number.

Methodology: one jitted pass function built once (scene passed as an
argument, not a closure constant), one warmup call for compilation, then the
median of repeated timed passes — compilation is excluded, as in the
reference's params.json timings which report steady render time.
"""
from __future__ import annotations

import json
import time

REF_CAMERA_SAMPLES_PER_S = 5.6e6  # BASELINE.md derived anchor (cbox-path)


def main():
    import jax
    import jax.numpy as jnp

    from mitsuba3_plt_tpu.scene.presets import cornell_box
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.common import sample_rays
    from mitsuba3_plt_tpu.core.rng import Sampler
    from mitsuba3_plt_tpu.librender.film import ImageBlock

    width = height = 512
    spp_pass = 8
    scene, _ = cornell_box(width, height)
    integ = PathIntegrator(max_depth=6, rr_depth=5)

    @jax.jit
    def render_pass(scene, block_data, pass_idx):
        sampler = Sampler.create(0, width * height * spp_pass).fork_traced(
            pass_idx
        )
        ray, uv, wl, _ = sample_rays(scene, sampler, width, height, spp_pass,
                                     RGB)
        values, valid = integ.sample(scene, sampler, ray, wl, RGB)
        block = ImageBlock(
            data=block_data, width=width, height=height, n_channels=3,
            rfilter=0,
        )
        return block.put(uv, values, valid).data

    data = ImageBlock.create(width, height, 3).data
    data = jax.block_until_ready(render_pass(scene, data, 0))  # compile

    times = []
    for p in range(1, 5):
        t0 = time.perf_counter()
        data = jax.block_until_ready(render_pass(scene, data, p))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    samples_per_s = width * height * spp_pass / dt
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
