#!/usr/bin/env python
"""Dispersion / diffraction analysis plots — the role of the fork's
scripts/dispersion/*.py and scripts/diffraction/*.py experiment layer
(reference scripts/dispersion/dispersion.py, scripts/diffraction/
diffraction.py): sweep the wave-BSDF over outgoing directions and
wavelengths and plot the grating's order structure.

Usage:
    python tools/analysis.py [--out docs/img] [--inv-period 0.6]
                             [--height 0.04] [--lobes 7]

Writes three PNGs:
  diffraction_orders.png   order intensity vs order index (several heights)
  dispersion_angles.png    diffraction angle vs wavelength per order
  wbsdf_sweep.png          wBSDF response over the outgoing-angle sweep at
                           RGB wavelengths (the diffraction rainbow)
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from mitsuba3_plt_tpu.plt.grating import (
    Grating, order_intensities, diffract,
)


def make_grating(n, inv_period=0.6, height=0.04, lobes=7, gtype=0):
    uv = jnp.full((n, 2), 0.25, jnp.float32)
    return Grating.create(
        grating_angle=jnp.zeros((n,)),
        inv_period=jnp.tile(jnp.asarray([[inv_period, 0.0]], jnp.float32),
                            (n, 1)),
        q=jnp.full((n,), height, jnp.float32),
        lobes=jnp.full((n,), lobes, jnp.int32),
        gtype=jnp.zeros((n,), jnp.int32),
        multiplier=jnp.ones((n,)),
        uv=uv,
    )


def plot_orders(args):
    heights = [0.02, 0.04, 0.08, 0.16]
    wi = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    n_ord = 6
    for h in heights:
        g = make_grating(1, inv_period=args.inv_period, height=h,
                         lobes=args.lobes)
        inten = np.asarray(
            order_intensities(g, wi, jnp.asarray(0.55), n_ord)
        )[0]
        ax.plot(range(n_ord + 1), inten, marker="o",
                label=f"height = {h:.2f} um")
    ax.set_xlabel("diffraction order |m|")
    ax.set_ylabel("relative intensity")
    ax.set_title(
        f"Sinusoidal grating order structure (550 nm, "
        f"1/d = {args.inv_period}/um)"
    )
    ax.set_yscale("log")
    ax.grid(alpha=0.3)
    ax.legend()
    out = os.path.join(args.out, "diffraction_orders.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)


def plot_dispersion(args):
    wls = np.linspace(0.38, 0.75, 60)
    wi = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    g = make_grating(1, inv_period=args.inv_period, height=args.height,
                     lobes=args.lobes)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for order in (1, 2, 3):
        angs = []
        for wl in wls:
            lobe = jnp.asarray([[order, 0]], jnp.int32)
            wo, ok = diffract(g, wi, lobe, jnp.asarray(float(wl)))
            wo_np = np.asarray(wo)[0]
            valid = bool(np.asarray(ok)[0])
            angs.append(
                np.degrees(np.arctan2(wo_np[0], wo_np[2])) if valid
                else np.nan
            )
        ax.plot(wls * 1000, angs, label=f"order {order}")
    ax.set_xlabel("wavelength (nm)")
    ax.set_ylabel("diffraction angle (deg)")
    ax.set_title(
        f"Grating dispersion (normal incidence, 1/d = {args.inv_period}/um)"
    )
    ax.grid(alpha=0.3)
    ax.legend()
    out = os.path.join(args.out, "dispersion_angles.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)


def plot_wbsdf_sweep(args):
    """wBSDF lobe response over an outgoing-angle sweep at RGB wavelengths
    (the fork's dispersion.py polar-sweep analysis)."""
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.librender.bsdf import BSDFContext, BSDF_ROUGH_GRATING
    from mitsuba3_plt_tpu.scene.loader import LoadedBSDF, build_material_table
    from mitsuba3_plt_tpu.plt import wbsdf as wb
    from mitsuba3_plt_tpu.plt.wbsdf import PLTSamplePhaseData

    tab = build_material_table([
        LoadedBSDF(
            BSDF_ROUGH_GRATING,
            base_color=(1.0, 1.0, 1.0), alpha=(0.05, 0.05),
            eta_re=(0.2,) * 3, eta_im=(3.9,) * 3,
            grt_inv_period=(args.inv_period, 0.0), grt_height=args.height,
            grt_lobes=args.lobes, grt_type=0, grt_multiplier=10.0,
            grt_coherence=6e5,
        )
    ])
    n = 721
    theta = np.radians(np.linspace(-85, 85, n))
    wo = jnp.asarray(
        np.stack([np.sin(theta), np.zeros(n), np.cos(theta)], -1), jnp.float32
    )
    from mitsuba3_plt_tpu.librender.records import SurfaceInteraction

    z = jnp.zeros((n, 3), jnp.float32)
    e = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (n, 1))
    e2 = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
    ang_i = np.radians(25.0)
    wi = jnp.tile(
        jnp.asarray([np.sin(ang_i), 0.0, np.cos(ang_i)], jnp.float32), (n, 1)
    )
    si = SurfaceInteraction(
        valid=jnp.ones((n,), bool), t=jnp.ones((n,)), p=z, n=nrm,
        sh_s=e, sh_t=e2, sh_n=nrm, uv=jnp.full((n, 2), 0.25),
        wi=wi, prim_idx=jnp.zeros((n,), jnp.int32),
        mat_idx=jnp.zeros((n,), jnp.int32),
        emitter_idx=jnp.full((n,), -1, jnp.int32),
        shape_idx=jnp.zeros((n,), jnp.int32),
    )
    import dataclasses

    sd = PLTSamplePhaseData.zeros(n, 3)
    sd = dataclasses.replace(
        sd,
        sampling_wavelengths=jnp.tile(
            jnp.asarray([[620.0, 550.0, 460.0]], jnp.float32), (n, 1)
        ),
    )
    val = np.asarray(
        wb.wbsdf_eval(
            tab, jnp.zeros((n,), jnp.int32), si, wo, sd, BSDFContext(), RGB
        )
    )
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for c, (name, color) in enumerate(
        [("620 nm", "tab:red"), ("550 nm", "tab:green"),
         ("460 nm", "tab:blue")]
    ):
        ax.plot(np.degrees(theta), val[:, c], label=name, color=color,
                linewidth=1.0)
    ax.set_xlabel("outgoing angle (deg, plane of incidence)")
    ax.set_ylabel("wBSDF response")
    ax.set_yscale("log")
    ax.set_title(
        f"roughgrating wBSDF sweep (25 deg incidence, "
        f"1/d = {args.inv_period}/um, h = {args.height} um)"
    )
    ax.grid(alpha=0.3)
    ax.legend()
    out = os.path.join(args.out, "wbsdf_sweep.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/img")
    ap.add_argument("--inv-period", type=float, default=0.6)
    ap.add_argument("--height", type=float, default=0.04)
    ap.add_argument("--lobes", type=int, default=7)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    plot_orders(args)
    plot_dispersion(args)
    plot_wbsdf_sweep(args)


if __name__ == "__main__":
    main()
