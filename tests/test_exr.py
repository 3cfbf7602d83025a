"""EXR codec tests: PIZ decode of the reference's shipped renders (validated
against their paired PNGs), ZIP write/read round-trip, and bitmap dispatch.

Reference role: src/core/bitmap.cpp EXR path (OpenEXR); the files under
/root/reference/results and /root/reference/scenes are PIZ HALF scanline
images written by OpenEXR, so decoding them exercises format parity.
"""
import os

import numpy as np
import pytest

from mitsuba3_plt_tpu.utils.exr import read_exr, read_exr_rgb, write_exr
from mitsuba3_plt_tpu.utils.io import read_bitmap, tonemap_srgb

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_piz_decode_matches_png():
    """Decoded PIZ EXR, tonemapped, must match the renderer's own PNG dump
    of the same buffer to within 8-bit rounding."""
    from PIL import Image

    exr = read_exr_rgb(f"{REF}/results/cbox-path/result_s0.exr")
    png = np.asarray(
        Image.open(f"{REF}/results/cbox-path/result_s0.png"), np.float32
    )[:, :, :3]
    assert exr.shape == (500, 500, 3)
    tm = tonemap_srgb(exr).astype(np.float32)
    assert np.abs(tm - png).max() <= 1.0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_piz_decode_envmap_asset():
    img = read_exr_rgb(f"{REF}/scenes/cbox-grating/cbox.exr")
    assert img.ndim == 3 and img.shape[2] == 3
    assert np.isfinite(img).all()
    # a real render: non-constant, non-negative-dominated
    assert img.std() > 1e-3 and (img >= 0).mean() > 0.99


def test_zip_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 53, 3)).astype(np.float32) ** 2
    p = str(tmp_path / "rt.exr")
    write_exr(p, img, ["R", "G", "B"], half=False)
    back = read_exr_rgb(p)
    np.testing.assert_allclose(back, img, rtol=0, atol=0)

    # half precision path
    write_exr(p, img, ["R", "G", "B"], half=True)
    back = read_exr_rgb(p)
    np.testing.assert_allclose(
        back, img.astype(np.float16).astype(np.float32), rtol=0, atol=0
    )

    # single channel
    write_exr(p, img[:, :, 0])
    chans, _ = read_exr(p)
    assert list(chans) == ["Y"]


def test_read_bitmap_dispatch(tmp_path):
    img = np.full((8, 8, 3), 0.25, np.float32)
    p = str(tmp_path / "x.exr")
    write_exr(p, img)
    np.testing.assert_allclose(read_bitmap(p), img)
