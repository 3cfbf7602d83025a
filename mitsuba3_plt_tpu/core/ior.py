"""Spectral conductor IOR curves (role of the reference's
resources/data/ior/*.spd database consumed by src/bsdfs/conductor.cpp via
props.texture — the data submodule is not checked out in the reference
tree, so the common metals are embedded here).

Values are approximate digitizations of the public Johnson & Christy (1972)
measurements (Au/Ag/Cu) and the Palik handbook (Al), sampled on a coarse
visible grid; linear interpolation in between, flat extrapolation outside.
Absolute accuracy is a few percent — adequate for rendering, and a strict
upgrade over fixed RGB eta/k (conductor Fresnel now disperses with
wavelength in the spectral variants).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# wavelength grid (nm)
IOR_WAVELENGTHS = np.array(
    [400.0, 450.0, 500.0, 550.0, 600.0, 650.0, 700.0, 750.0], np.float32
)
N_IOR = len(IOR_WAVELENGTHS)

# name -> (eta(lambda), k(lambda)) on IOR_WAVELENGTHS
CONDUCTOR_SPECTRA = {
    "au": (
        [1.66, 1.50, 0.86, 0.35, 0.21, 0.15, 0.15, 0.17],
        [1.96, 1.88, 1.90, 2.49, 3.06, 3.57, 4.10, 4.66],
    ),
    "ag": (
        [0.05, 0.04, 0.05, 0.06, 0.06, 0.07, 0.08, 0.09],
        [2.12, 2.66, 3.13, 3.59, 4.15, 4.52, 4.80, 5.29],
    ),
    "al": (
        [0.49, 0.62, 0.77, 0.96, 1.20, 1.47, 1.83, 2.40],
        [4.86, 5.47, 6.08, 6.69, 7.26, 7.79, 8.31, 8.62],
    ),
    "cu": (
        [1.18, 1.17, 1.12, 1.04, 0.47, 0.22, 0.21, 0.24],
        [2.21, 2.36, 2.60, 2.59, 2.81, 3.43, 4.05, 4.54],
    ),
    # ideal mirror
    "none": ([0.0] * N_IOR, [1.0] * N_IOR),
}

# anchor wavelengths used to lift RGB eta/k triples to a spectral curve
# (sRGB primaries' dominant wavelengths)
_RGB_ANCHORS = np.array([620.0, 550.0, 460.0], np.float32)  # R, G, B


def curve_for_material(name: str):
    """(eta [N_IOR], k [N_IOR]) numpy arrays for a named metal, or None."""
    c = CONDUCTOR_SPECTRA.get(name.lower())
    if c is None:
        return None
    return (
        np.asarray(c[0], np.float32), np.asarray(c[1], np.float32)
    )


def curve_from_rgb(eta_rgb, k_rgb):
    """Lift RGB eta/k triples to the IOR grid: linear interpolation through
    the (B, G, R) anchors, flat extrapolation. Exact for constant triples."""
    anchors = _RGB_ANCHORS[::-1].copy()           # ascending: B, G, R
    eta_a = np.asarray(eta_rgb, np.float64)[::-1]
    k_a = np.asarray(k_rgb, np.float64)[::-1]
    eta = np.interp(IOR_WAVELENGTHS, anchors, eta_a)
    k = np.interp(IOR_WAVELENGTHS, anchors, k_a)
    return eta.astype(np.float32), k.astype(np.float32)


def interp_ior(curve, wavelengths):
    """Evaluate a per-lane curve [N, N_IOR] at wavelengths [N, C] (nm)."""
    grid = jnp.asarray(IOR_WAVELENGTHS)
    t = (wavelengths - grid[0]) / (grid[-1] - grid[0]) * (N_IOR - 1)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, N_IOR - 2)
    f = jnp.clip(t - i, 0.0, 1.0)
    v0 = jnp.take_along_axis(curve, i, axis=-1)
    v1 = jnp.take_along_axis(curve, i + 1, axis=-1)
    return v0 * (1.0 - f) + v1 * f
