"""Image I/O: PNG (tonemapped, via PIL), PFM (float HDR), NPY.

The reference writes EXR via OpenEXR (scripts/rendering/main-headless.py);
this environment has no EXR codec, so the HDR interchange format is PFM
(+ .npy for exact arrays). write_bitmap dispatches on extension —
mi.util.write_bitmap twin.
"""
from __future__ import annotations

import numpy as np


def tonemap_srgb(img, exposure: float = 1.0):
    """Linear -> sRGB 8-bit with simple exposure."""
    x = np.clip(np.asarray(img, np.float32) * exposure, 0.0, None)
    srgb = np.where(
        x <= 0.0031308, 12.92 * x, 1.055 * np.power(np.maximum(x, 1e-9), 1 / 2.4) - 0.055
    )
    return (np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)


def write_pfm(path: str, img: np.ndarray):
    """Portable FloatMap: color 'PF' or gray 'Pf', bottom-up rows."""
    img = np.asarray(img, np.float32)
    color = img.ndim == 3 and img.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{img.shape[1]} {img.shape[0]}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.flipud(img).tobytes())


def read_pfm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, 3) if color else data.reshape(h, w)
    return np.flipud(img).copy()


def write_bitmap(path: str, img, exposure: float = 1.0):
    """Dispatch on extension: .png/.jpg (tonemapped), .pfm (float), .npy."""
    img = np.asarray(img)
    low = path.lower()
    if low.endswith(".npy"):
        np.save(path, img)
    elif low.endswith(".pfm"):
        write_pfm(path, img)
    elif low.endswith((".png", ".jpg", ".jpeg")):
        from PIL import Image

        arr = tonemap_srgb(img, exposure)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, -1)
        if arr.shape[-1] > 3:
            arr = arr[..., :3]
        Image.fromarray(arr).save(path)
    else:
        raise ValueError(f"unsupported image format: {path}")
