"""Image I/O: EXR (native PIZ/ZIP codec), PNG (via PIL), PFM, NPY.

write_bitmap/read_bitmap dispatch on extension — mi.util.write_bitmap /
Bitmap ctor twins (reference src/core/bitmap.cpp). 8-bit sources are
converted sRGB->linear on read like the reference's bitmap texture
(raw=false default); EXR/PFM/NPY stay linear.
"""
from __future__ import annotations

import numpy as np


def srgb_to_linear(x):
    x = np.asarray(x, np.float32)
    return np.where(x <= 0.04045, x / 12.92, np.power((x + 0.055) / 1.055, 2.4))


def read_bitmap(path: str) -> np.ndarray:
    """Read an image file as linear float32 [h, w, 3]."""
    low = path.lower()
    if low.endswith(".exr"):
        from .exr import read_exr_rgb

        return read_exr_rgb(path)
    if low.endswith(".pfm"):
        img = read_pfm(path)
        return np.repeat(img[..., None], 3, -1) if img.ndim == 2 else img
    if low.endswith(".npy"):
        img = np.load(path).astype(np.float32)
        return np.repeat(img[..., None], 3, -1) if img.ndim == 2 else img
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return srgb_to_linear(arr)


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
    elif low.endswith(".exr"):
        from .exr import write_exr

        names = None
        if img.ndim == 3 and img.shape[2] == 3:
            names = ["R", "G", "B"]
        write_exr(path, img, names)
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


def read_vol(path: str):
    """Mitsuba .vol grid-volume loader (reference src/volumes/grid.cpp
    VOL3 format: 'VOL' magic, version 3, dtype int32 (1 = float32),
    res xyz int32, channels int32, bbox 6 floats, raw data).

    Returns (data [Dz, Dy, Dx, C] float32, bbox_min [3], bbox_max [3])."""
    import struct

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"VOL":
        raise ValueError(f"{path}: not a .vol file")
    version = raw[3]
    if version != 3:
        raise ValueError(f"{path}: unsupported .vol version {version}")
    dtype, xres, yres, zres, channels = struct.unpack_from("<iiiii", raw, 4)
    if dtype != 1:
        raise ValueError(f"{path}: only float32 .vol supported (type {dtype})")
    bbox = struct.unpack_from("<6f", raw, 24)
    data = np.frombuffer(
        raw, np.float32, xres * yres * zres * channels, 48
    ).reshape(zres, yres, xres, channels)
    return (
        data.copy(),
        np.asarray(bbox[:3], np.float32),
        np.asarray(bbox[3:], np.float32),
    )


def write_vol(path: str, data, bbox_min=(0, 0, 0), bbox_max=(1, 1, 1)):
    """Write a float32 .vol grid (tests + tooling). data [Dz, Dy, Dx, C]
    or [Dz, Dy, Dx]."""
    import struct

    d = np.asarray(data, np.float32)
    if d.ndim == 3:
        d = d[..., None]
    zres, yres, xres, channels = d.shape
    with open(path, "wb") as f:
        f.write(b"VOL" + bytes([3]))
        f.write(struct.pack("<iiiii", 1, xres, yres, zres, channels))
        f.write(struct.pack("<6f", *bbox_min, *bbox_max))
        f.write(d.tobytes())
