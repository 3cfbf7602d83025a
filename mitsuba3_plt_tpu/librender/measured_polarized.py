"""Polarized measured pBSDF (reference src/bsdfs/measured_polarized.cpp):
a tensor-file with Mueller-matrix measurements over the isotropic
Rusinkiewicz parameterization (phi_d, theta_d, theta_h) x wavelength.

Tensor fields (measured_polarized.cpp:129-154): theta_h [1, Nth],
theta_d [1, Ntd], phi_d [1, Npd], wvls [Nwl], and
M [Npd, Ntd, Nth, Nwl, 4, 4].

Evaluation follows the reference exactly: rotate both directions so the
outgoing azimuth is zero, convert to Rusinkiewicz coordinates,
multilinearly interpolate the 4-D tensor (non-uniform grids), then rotate
the matrix's Stokes reference frames (which lie in the plane of
reflection) into the implicit bases of the transport directions.
Sampling is the reference's fixed diffuse/GGX mixture (alpha_sample).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import frame as fr
from ..core import warp
from . import microfacet as mf
from . import mueller as mu

COSINE_HEMISPHERE_PDF_WEIGHT = 0.9  # measured_polarized.cpp:195


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PolarizedMeasurement:
    theta_h: Any   # [Nth]
    theta_d: Any   # [Ntd]
    phi_d: Any     # [Npd]
    wvls: Any      # [Nwl] (nm)
    M: Any         # [Npd, Ntd, Nth, Nwl, 16] (4x4 row-major flattened)
    alpha_sample: Any  # scalar GGX roughness for the sampling lobe

    @staticmethod
    def from_tensors(d: dict, alpha_sample: float = 0.3):
        M = np.asarray(d["M"], np.float32)
        npd, ntd, nth, nwl = M.shape[:4]
        return PolarizedMeasurement(
            theta_h=jnp.asarray(np.asarray(d["theta_h"]).reshape(-1)),
            theta_d=jnp.asarray(np.asarray(d["theta_d"]).reshape(-1)),
            phi_d=jnp.asarray(np.asarray(d["phi_d"]).reshape(-1)),
            wvls=jnp.asarray(np.asarray(d["wvls"]).reshape(-1)),
            M=jnp.asarray(np.nan_to_num(M).reshape(npd, ntd, nth, nwl, 16)),
            alpha_sample=jnp.asarray(alpha_sample, jnp.float32),
        )


def _bracket(grid, x):
    """(i, w): linear-interpolation bracket on a small non-uniform grid."""
    k = grid.shape[0]
    i = jnp.clip(
        jnp.sum((grid <= x[..., None]).astype(jnp.int32), -1) - 1, 0,
        jnp.maximum(k - 2, 0),
    )
    g0 = grid[i]
    g1 = grid[jnp.minimum(i + 1, k - 1)]
    w = jnp.where(
        g1 > g0, jnp.clip((x - g0) / jnp.maximum(g1 - g0, 1e-9), 0.0, 1.0),
        0.0,
    )
    return i, w


def _rotate_z(v, phi):
    c = jnp.cos(phi)[..., None]
    s = jnp.sin(phi)[..., None]
    return jnp.concatenate(
        [
            v[..., 0:1] * c - v[..., 1:2] * s,
            v[..., 0:1] * s + v[..., 1:2] * c,
            v[..., 2:3],
        ],
        axis=-1,
    )


def directions_to_rusinkiewicz(i, o):
    """(phi_d, theta_h, theta_d) of the standard-frame direction pair
    (measured_polarized.cpp directions_to_rusinkiewicz)."""
    h = fr.normalize(i + o)
    n = jnp.asarray([0.0, 0.0, 1.0])
    b = fr.normalize(jnp.cross(jnp.broadcast_to(n, h.shape), h))
    t = fr.normalize(jnp.cross(b, h))
    td = jnp.arccos(jnp.clip(fr.dot(h, i), -1.0, 1.0))
    th = jnp.arccos(jnp.clip(h[..., 2], -1.0, 1.0))
    i_prj = fr.normalize(i - fr.dot(i, h)[..., None] * h)
    cos_pd = jnp.clip(fr.dot(t, i_prj), -1.0, 1.0)
    sin_pd = jnp.clip(fr.dot(b, i_prj), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def eval_mueller_tensor(tab: PolarizedMeasurement, pd, th, td, lam):
    """Multilinear interpolation of the Mueller tensor at per-lane
    (phi_d, theta_h, theta_d, lambda [N, C]). Returns [N, C, 4, 4]."""
    npd, ntd, nth, nwl = tab.M.shape[:4]
    Mflat = tab.M.reshape(-1, 16)

    # phi_d is symmetric: fold to the measured half-range if needed
    pd_g = tab.phi_d
    pd_f = jnp.where(pd < pd_g[0], pd + 2.0 * jnp.pi, pd)
    i_pd, w_pd = _bracket(pd_g, pd_f)
    i_td, w_td = _bracket(tab.theta_d, td)
    i_th, w_th = _bracket(tab.theta_h, th)

    C = lam.shape[-1]
    out = jnp.zeros((pd.shape[0], C, 16), jnp.float32)
    i_wl, w_wl = _bracket(
        tab.wvls, lam.reshape(-1)
    )
    i_wl = i_wl.reshape(lam.shape)
    w_wl = w_wl.reshape(lam.shape)

    for dpd in (0, 1):
        wp = (1 - w_pd) if dpd == 0 else w_pd
        ip = jnp.minimum(i_pd + dpd, npd - 1)
        for dtd in (0, 1):
            wt = (1 - w_td) if dtd == 0 else w_td
            it = jnp.minimum(i_td + dtd, ntd - 1)
            for dth in (0, 1):
                wh = (1 - w_th) if dth == 0 else w_th
                ih = jnp.minimum(i_th + dth, nth - 1)
                base = ((ip * ntd + it) * nth + ih) * nwl
                for dwl in (0, 1):
                    ww = (1 - w_wl) if dwl == 0 else w_wl
                    iw = jnp.minimum(i_wl + dwl, nwl - 1)
                    rows = Mflat[base[..., None] + iw]  # [N, C, 16]
                    out = out + (
                        (wp * wt * wh)[..., None] * ww
                    )[..., None] * rows
    return out.reshape(pd.shape[0], C, 4, 4)


def eval_pbsdf(tab: PolarizedMeasurement, wi, wo, mode_radiance, cfg,
               wavelengths):
    """Polarized eval: [N, 4, 4, C] Mueller (or [N, C] when cfg is
    unpolarized), already multiplied by cos_theta_o."""
    n = wi.shape[0]
    cos_i = fr.cos_theta(wi)
    cos_o = fr.cos_theta(wo)
    active = (cos_i > 0) & (cos_o > 0)

    wo_hat = wo if mode_radiance else wi
    wi_hat = wi if mode_radiance else wo
    phi_std = jnp.arctan2(wi_hat[..., 1], wi_hat[..., 0])
    wo_std = _rotate_z(wo_hat, -phi_std)
    wi_std = _rotate_z(wi_hat, -phi_std)
    pd, th, td = directions_to_rusinkiewicz(wo_std, wi_std)

    if wavelengths is None:
        lam = jnp.full((n, cfg.n_channels), 570.0)
        # RGB approximation at primary anchors
        if cfg.n_channels == 3:
            lam = jnp.broadcast_to(
                jnp.asarray([620.0, 550.0, 460.0]), (n, 3)
            )
    else:
        lam = wavelengths

    Mv = eval_mueller_tensor(tab, pd, th, td, lam)  # [N, C, 4, 4]
    Mv = Mv.at[..., 0, 0].set(jnp.maximum(Mv[..., 0, 0], 0.0))

    if not cfg.polarized:
        val = Mv[..., 0, 0] * cos_o[..., None]
        return jnp.where(active[..., None], jnp.maximum(val, 0.0), 0.0)

    # Stokes frames of the tensor lie in the reflection plane (Figure 4)
    zo = -wo_std
    to = fr.normalize(jnp.cross(wo_std - wi_std, zo))
    yo = fr.normalize(jnp.cross(to, zo))
    xo = jnp.cross(yo, zo)
    zi = wi_std
    ti = fr.normalize(jnp.cross(wi_std - wo_std, zi))
    yi = fr.normalize(jnp.cross(ti, zi))
    xi = jnp.cross(yi, zi)
    xo_hat = _rotate_z(xo, phi_std)
    xi_hat = _rotate_z(xi, phi_std)

    R_in = mu.rotate_stokes_basis(
        -wo_hat, xo_hat, mu.stokes_basis(-wo_hat)
    )  # [N, 4, 4]
    R_out = mu.rotate_stokes_basis(
        wi_hat, xi_hat, mu.stokes_basis(wi_hat)
    )
    # per-channel: R_out @ M_c @ R_in^T
    Mrot = jnp.einsum(
        "nij,ncjk,nlk->ncil", R_out, Mv, R_in
    )  # [N, C, 4, 4]
    value = jnp.moveaxis(Mrot, 1, -1) * cos_o[..., None, None, None]
    return jnp.where(active[..., None, None, None], value, 0.0)


def pdf_pbsdf(tab: PolarizedMeasurement, wi, wo):
    cos_i = fr.cos_theta(wi)
    cos_o = fr.cos_theta(wo)
    active = (cos_i > 0) & (cos_o > 0)
    h = fr.normalize(wi + wo)
    a = tab.alpha_sample
    pdf_diffuse = jnp.maximum(cos_o, 0.0) / jnp.pi
    pdf_mf = mf.pdf_vndf(wi, h, a, a, mf.GGX) / jnp.maximum(
        4.0 * fr.dot(wo, h), 1e-9
    )
    pdf = (
        COSINE_HEMISPHERE_PDF_WEIGHT * pdf_diffuse
        + (1.0 - COSINE_HEMISPHERE_PDF_WEIGHT) * pdf_mf
    )
    return jnp.where(active, pdf, 0.0)


def sample_pbsdf(tab: PolarizedMeasurement, wi, u1, u2):
    """Returns (wo, pdf)."""
    a = tab.alpha_sample
    pick_diff = u1 < COSINE_HEMISPHERE_PDF_WEIGHT
    wo_d = warp.square_to_cosine_hemisphere(u2)
    mvec, _ = mf.sample_vndf_ggx(wi, u2, a, a)
    wo_s = fr.reflect_n(wi, mvec)
    wo = jnp.where(pick_diff[..., None], wo_d, wo_s)
    return wo, pdf_pbsdf(tab, wi, wo)
