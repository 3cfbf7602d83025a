"""Polarization false-color visualization (reference
src/python/python/polvis.py role): degree/angle-of-linear-polarization
maps from Stokes AOV renders.

Input: the stokes integrator's [H, W, C] output whose channels contain
RGB + S0..S3 (3 channels each, as produced by integrators/stokes.py), or
explicit s0..s3 arrays.
"""
from __future__ import annotations

import numpy as np


def split_stokes(img: np.ndarray):
    """Stokes-AOV image -> (rgb, s0, s1, s2, s3) with [H, W, 3] each.

    Accepts BOTH layouts: the native 15-channel [rgb, S0..S3] of
    integrators/stokes.py and the reference's 16-channel EXR layout
    [R, G, B, A, S0..S3] that its polvis consumers assert
    (src/python/python/polvis.py:16, s0 at channels 4:7)."""
    img = np.asarray(img)
    ch = img.shape[-1]
    if ch == 16:
        rgb = img[..., 0:3]
        s = [img[..., 4 + 3 * i : 7 + 3 * i] for i in range(4)]
        return (rgb, *s)
    if ch < 15:
        raise ValueError(f"need >= 15 channels, got {ch}")
    rgb = img[..., 0:3]
    s = [img[..., 3 + 3 * i : 6 + 3 * i] for i in range(4)]
    return (rgb, *s)


def dolp(s0, s1, s2, s3=None):
    """Degree of (linear, or total when s3 given) polarization [H, W]."""
    s0l = np.mean(np.asarray(s0), axis=-1) if np.ndim(s0) == 3 else s0
    s1l = np.mean(np.asarray(s1), axis=-1) if np.ndim(s1) == 3 else s1
    s2l = np.mean(np.asarray(s2), axis=-1) if np.ndim(s2) == 3 else s2
    mag = s1l * s1l + s2l * s2l
    if s3 is not None:
        s3l = np.mean(np.asarray(s3), axis=-1) if np.ndim(s3) == 3 else s3
        mag = mag + s3l * s3l
    return np.sqrt(np.maximum(mag, 0.0)) / np.maximum(np.abs(s0l), 1e-9)


def aolp(s1, s2):
    """Angle of linear polarization in [0, pi) [H, W]."""
    s1l = np.mean(np.asarray(s1), axis=-1) if np.ndim(s1) == 3 else s1
    s2l = np.mean(np.asarray(s2), axis=-1) if np.ndim(s2) == 3 else s2
    return np.mod(0.5 * np.arctan2(s2l, s1l), np.pi)


def _hsv_to_rgb(h, s, v):
    h6 = (h * 6.0) % 6.0
    i = np.floor(h6).astype(int)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    out = np.zeros(h.shape + (3,), np.float32)
    tab = [
        (v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q),
    ]
    for idx, (r, g, b) in enumerate(tab):
        m = i == idx
        out[m, 0] = r[m]
        out[m, 1] = g[m]
        out[m, 2] = b[m]
    return out


def polvis(img, mode: str = "dolp"):
    """False-color map [H, W, 3] from a stokes AOV image.

    mode: 'dolp' (grayscale heat), 'aolp' (hue = angle, value = DoLP),
    's1'/'s2'/'s3' (signed red/blue diverging)."""
    rgb, s0, s1, s2, s3 = split_stokes(img)
    if mode == "dolp":
        d = np.clip(dolp(s0, s1, s2, s3), 0.0, 1.0)
        return np.stack([d, d, d], axis=-1)
    if mode == "aolp":
        h = aolp(s1, s2) / np.pi
        d = np.clip(dolp(s0, s1, s2), 0.0, 1.0)
        return _hsv_to_rgb(h, np.ones_like(h), d)
    if mode in ("s1", "s2", "s3"):
        comp = {"s1": s1, "s2": s2, "s3": s3}[mode]
        c = np.mean(comp, axis=-1)
        denom = np.maximum(np.abs(np.mean(s0, axis=-1)), 1e-9)
        x = np.clip(c / denom, -1.0, 1.0)
        out = np.zeros(x.shape + (3,), np.float32)
        out[..., 0] = np.maximum(x, 0.0)       # + -> red
        out[..., 2] = np.maximum(-x, 0.0)      # - -> blue
        return out
    raise ValueError(f"unknown polvis mode {mode!r}")
