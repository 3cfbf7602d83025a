"""ImageBlock accumulation paths: the scatter-free ordered filtered splat
(channel-major tap layout, round 5) must agree with the scatter splat
(reference ImageBlock::put role, imageblock.cpp:119-126)."""
import numpy as np
import jax.numpy as jnp

from mitsuba3_plt_tpu.librender.film import (
    ImageBlock, FILTER_BOX, FILTER_GAUSSIAN, FILTER_MITCHELL,
)


def _ordered_samples(w, h, spp, C, seed=0):
    rng = np.random.default_rng(seed)
    n = w * h * spp
    lane = np.arange(n) // spp
    jit2 = rng.random((n, 2))
    uv = np.stack([
        (lane % w + jit2[:, 0]) / w,
        (lane // w + jit2[:, 1]) / h,
    ], -1).astype(np.float32)
    vals = rng.random((n, C)).astype(np.float32)
    act = rng.random(n) > 0.1
    return jnp.asarray(uv), jnp.asarray(vals), jnp.asarray(act)


def test_ordered_filtered_matches_scatter_gaussian():
    w, h, spp, C = 12, 10, 4, 3
    uv, vals, act = _ordered_samples(w, h, spp, C)
    a = ImageBlock.create(w, h, C, FILTER_GAUSSIAN).put_ordered_filtered(
        uv, vals, act, spp
    )
    b = ImageBlock.create(w, h, C, FILTER_GAUSSIAN).put(uv, vals, act)
    # interior pixels (the two paths clip borders identically only inside)
    ia = np.asarray(a.develop())[1:-1, 1:-1]
    ib = np.asarray(b.develop())[1:-1, 1:-1]
    np.testing.assert_allclose(ia, ib, rtol=2e-4, atol=2e-5)


def test_ordered_filtered_matches_scatter_mitchell():
    w, h, spp, C = 9, 9, 2, 4
    uv, vals, act = _ordered_samples(w, h, spp, C, seed=3)
    a = ImageBlock.create(w, h, C, FILTER_MITCHELL).put_ordered_filtered(
        uv, vals, act, spp
    )
    b = ImageBlock.create(w, h, C, FILTER_MITCHELL).put(uv, vals, act)
    ia = np.asarray(a.develop())[2:-2, 2:-2]
    ib = np.asarray(b.develop())[2:-2, 2:-2]
    np.testing.assert_allclose(ia, ib, rtol=5e-4, atol=5e-5)


def test_ordered_box_matches_put():
    w, h, spp, C = 8, 8, 4, 3
    uv, vals, act = _ordered_samples(w, h, spp, C, seed=5)
    a = ImageBlock.create(w, h, C, FILTER_BOX).put_ordered(vals, act, spp)
    b = ImageBlock.create(w, h, C, FILTER_BOX).put(uv, vals, act)
    np.testing.assert_allclose(
        np.asarray(a.develop()), np.asarray(b.develop()), rtol=1e-6
    )
