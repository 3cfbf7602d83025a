"""Hair fiber BSDF (reference src/bsdfs/hair.cpp — the Chiang et al. 2016
near-field hair model, same algebra as PBRT's HairBSDF).

Frame convention: the shading frame of fiber hits is tangent-aligned
(scene.py packs fiber tangents into tri_attr and builds sh_s along the
fiber), so in BSDF-local coordinates x = fiber axis, z = outward radial
normal, y completes the cross-section. sin(theta) = w.x (longitudinal),
phi = atan2(w.y, w.z) (azimuth in the cross-section measured from the hit
normal).

The fiber offset h is derived deterministically from the tube-hit
geometry: the hit normal makes angle gamma_o with the incoming view
direction's cross-section projection, and h = sin(gamma_o) (equivalent to
the reference's per-curve-intersection h, which our tessellated tubes
encode in the hit normal instead).

p = 0 (R), 1 (TT), 2 (TRT), 3 (residual) lobes; longitudinal M_p is the
log-I0 stabilized spherical Gaussian, azimuthal N_p the trimmed logistic
around Phi(p, gamma_o, gamma_t).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import frame as fr
from . import fresnel as fres

P_MAX = 3
SQRT_PI_OVER_8 = 0.626657069


def _log_bessel_i0(x):
    """log(I0(x)), stable for large x (PBRT LogI0)."""
    small = jnp.log(
        1.0 + x * x * (0.25 + x * x * (1.0 / 64.0 + x * x / 2304.0))
    )
    big = x + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / jnp.maximum(x, 1e-9)) + 1.0 / jnp.maximum(8.0 * x, 1e-9))
    return jnp.where(x > 12.0, big, small)


def _bessel_i0(x):
    """I0(x) via series (adequate for the v > 0.1 branch)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    fact = 1.0
    for i in range(10):
        if i > 0:
            fact *= i
        val = val + x2i / (fact * fact)
        x2i = x2i * 0.25 * x * x
    return val


def hair_params(p):
    """Per-lane derived constants from the material row.

    pr_params layout for BSDF_HAIR: [beta_m, beta_n, alpha_deg, eumelanin,
    pheomelanin, use_sigma_a, 0, 0]; eta in eta_re[:, 0]; explicit sigma_a
    in base_color (when use_sigma_a > 0.5)."""
    pr = p["pr_params"]
    beta_m = jnp.clip(pr[..., 0], 0.01, 1.0)
    beta_n = jnp.clip(pr[..., 1], 0.01, 1.0)
    alpha = pr[..., 2]
    v0 = (
        0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20
    ) ** 2
    v = jnp.stack([v0, 0.25 * v0, 4.0 * v0, 4.0 * v0], axis=-1)  # [N, 4]
    s = SQRT_PI_OVER_8 * (
        0.265 * beta_n + 1.194 * beta_n ** 2 + 5.372 * beta_n ** 22
    )
    # scale tilt: sin/cos of 2^k alpha
    sin_a = jnp.sin(jnp.deg2rad(alpha))
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    sin2k = [sin_a, 2.0 * cos_a * sin_a]
    cos2k = [cos_a, cos_a * cos_a - sin_a * sin_a]
    sin2k.append(2.0 * cos2k[1] * sin2k[1])
    cos2k.append(cos2k[1] * cos2k[1] - sin2k[1] * sin2k[1])
    eta = jnp.maximum(p["eta_re"][..., 0], 1.0001)
    return v, s, jnp.stack(sin2k, -1), jnp.stack(cos2k, -1), eta


def hair_sigma_a(p, cfg, wavelengths):
    """Absorption coefficient [N, C]: explicit (base_color) or from melanin
    concentrations (hair.cpp eumelanin/pheomelanin mapping)."""
    pr = p["pr_params"]
    use_sig = pr[..., 5] > 0.5
    n = pr.shape[0]
    # melanin absorption at RGB (PBRT SigmaAFromConcentration)
    eumelanin = jnp.maximum(pr[..., 3], 0.0)
    pheomelanin = jnp.maximum(pr[..., 4], 0.0)
    eu_rgb = jnp.asarray([0.419, 0.697, 1.37])
    ph_rgb = jnp.asarray([0.187, 0.4, 1.05])
    mel = (
        eumelanin[..., None] * eu_rgb + pheomelanin[..., None] * ph_rgb
    )
    sig_rgb = jnp.where(use_sig[..., None], p["base_color"], mel)
    if cfg.n_channels == 3:
        return sig_rgb
    # spectral: flat in the hero channels (melanin curves are smooth)
    return jnp.broadcast_to(
        jnp.mean(sig_rgb, -1, keepdims=True), (n, cfg.n_channels)
    )


def _mp(cos_i, cos_o, sin_i, sin_o, v):
    a = cos_i * cos_o / v
    b = sin_i * sin_o / v
    small_v = v <= 0.1
    mp_small = jnp.exp(
        _log_bessel_i0(a) - b - 1.0 / v + 0.6931
        + jnp.log(1.0 / (2.0 * v))
    )
    sinh = jnp.sinh(jnp.clip(1.0 / v, 0.0, 30.0))
    mp_big = jnp.exp(-b) * _bessel_i0(a) / (2.0 * v * jnp.maximum(sinh, 1e-9))
    return jnp.where(small_v, mp_small, mp_big)


def _logistic(x, s):
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x, s):
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x, s, a, b):
    return _logistic(x, s) / jnp.maximum(
        _logistic_cdf(b, s) - _logistic_cdf(a, s), 1e-9
    )


def _sample_trimmed_logistic(u, s, a, b):
    k = _logistic_cdf(b, s) - _logistic_cdf(a, s)
    x = -s * jnp.log(
        1.0 / jnp.clip(u * k + _logistic_cdf(a, s), 1e-9, 1.0 - 1e-9) - 1.0
    )
    return jnp.clip(x, a, b)


def _phi_fn(pl, gamma_o, gamma_t):
    return 2.0 * pl * gamma_t - 2.0 * gamma_o + pl * jnp.pi


def _np_term(phi, pl, s, gamma_o, gamma_t):
    dphi = phi - _phi_fn(pl, gamma_o, gamma_t)
    dphi = jnp.mod(dphi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return _trimmed_logistic(dphi, s, -jnp.pi, jnp.pi)


def _ap(cos_theta_o, eta, h, T):
    """Attenuations [N, P_MAX+1, C] (PBRT Ap)."""
    cos_gamma_o = jnp.sqrt(jnp.maximum(1.0 - h * h, 0.0))
    cos_t = cos_theta_o * cos_gamma_o
    f, _, _, _ = fres.fresnel_dielectric(cos_t, eta)
    f = f[..., None]  # [N, 1]
    a0 = jnp.broadcast_to(f, T.shape)
    a1 = (1.0 - f) ** 2 * T
    a2 = a1 * T * f
    a3 = a2 * T * f / jnp.maximum(1.0 - T * f, 1e-4)
    return jnp.stack([a0, a1, a2, a3], axis=1)  # [N, 4, C]


def _geometry(wi, wo, p, cfg, wavelengths):
    """Shared angles/attenuations. wi = viewer side (toward camera in local
    frame), wo = light side, both [N, 3] in the fiber frame."""
    v, s, sin2k, cos2k, eta = hair_params(p)
    sigma_a = hair_sigma_a(p, cfg, wavelengths)

    sin_theta_o = jnp.clip(wi[..., 0], -1.0, 1.0)
    cos_theta_o = jnp.sqrt(jnp.maximum(1.0 - sin_theta_o ** 2, 1e-9))
    phi_o = jnp.arctan2(wi[..., 1], wi[..., 2])
    sin_theta_i = jnp.clip(wo[..., 0], -1.0, 1.0)
    cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i ** 2, 1e-9))
    phi_i = jnp.arctan2(wo[..., 1], wo[..., 2])

    # deterministic fiber offset from the tube-hit normal (see module doc):
    # gamma_o = azimuth of the viewer direction relative to the hit normal
    h = jnp.clip(jnp.sin(phi_o), -1.0 + 1e-5, 1.0 - 1e-5)
    gamma_o = jnp.arcsin(h)

    # refracted cone
    sin_theta_t = sin_theta_o / eta
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t ** 2, 1e-9))
    etap = jnp.sqrt(
        jnp.maximum(eta ** 2 - sin_theta_o ** 2, 1e-9)
    ) / cos_theta_o
    sin_gamma_t = jnp.clip(h / etap, -1.0 + 1e-6, 1.0 - 1e-6)
    cos_gamma_t = jnp.sqrt(jnp.maximum(1.0 - sin_gamma_t ** 2, 0.0))
    gamma_t = jnp.arcsin(sin_gamma_t)

    # transmittance through the interior
    T = jnp.exp(
        -sigma_a * (2.0 * cos_gamma_t / jnp.maximum(cos_theta_t, 1e-4))[..., None]
    )
    ap = _ap(cos_theta_o, eta, h, T)  # [N, 4, C]
    return dict(
        v=v, s=s, sin2k=sin2k, cos2k=cos2k, eta=eta,
        sin_theta_o=sin_theta_o, cos_theta_o=cos_theta_o, phi_o=phi_o,
        sin_theta_i=sin_theta_i, cos_theta_i=cos_theta_i, phi_i=phi_i,
        gamma_o=gamma_o, gamma_t=gamma_t, ap=ap,
    )


def _tilted(sin_o, cos_o, sin2k, cos2k, pl):
    """Scale-tilt rotated (sin, cos) theta_o for lobe pl (PBRT)."""
    if pl == 0:
        s = sin_o * cos2k[..., 1] - cos_o * sin2k[..., 1]
        c = cos_o * cos2k[..., 1] + sin_o * sin2k[..., 1]
    elif pl == 1:
        s = sin_o * cos2k[..., 0] + cos_o * sin2k[..., 0]
        c = cos_o * cos2k[..., 0] - sin_o * sin2k[..., 0]
    elif pl == 2:
        s = sin_o * cos2k[..., 2] + cos_o * sin2k[..., 2]
        c = cos_o * cos2k[..., 2] - sin_o * sin2k[..., 2]
    else:
        s, c = sin_o, cos_o
    return s, jnp.abs(c)


def hair_eval(p, wi, wo, cfg, wavelengths):
    """f(wi, wo) * cos_theta_wo [N, C] — matches the repo BSDF eval
    contract (value already contains the outgoing cosine, like the
    reference's Spectrum eval)."""
    g = _geometry(wi, wo, p, cfg, wavelengths)
    phi = g["phi_i"] - g["phi_o"]
    out = 0.0
    for pl in range(P_MAX + 1):
        s_op, c_op = _tilted(
            g["sin_theta_o"], g["cos_theta_o"], g["sin2k"], g["cos2k"], pl
        )
        mp = _mp(g["cos_theta_i"], c_op, g["sin_theta_i"], s_op,
                 g["v"][..., min(pl, 3)])
        if pl < P_MAX:
            npv = _np_term(phi, float(pl), g["s"], g["gamma_o"], g["gamma_t"])
        else:
            npv = jnp.full_like(phi, 1.0 / (2.0 * jnp.pi))
        out = out + g["ap"][:, pl] * (mp * npv)[..., None]
    # PBRT divides by |cos(theta_i of the incoming/viewer dir)|; the cosine
    # of the outgoing direction cancels in the estimator the same way
    out = out / jnp.maximum(jnp.abs(fr.cos_theta(wi)), 1e-4)[..., None]
    return jnp.maximum(out, 0.0)


def _ap_pdf(g, cfg):
    lum = jnp.mean(g["ap"], axis=-1)  # [N, 4]
    return lum / jnp.maximum(jnp.sum(lum, -1, keepdims=True), 1e-9)


def hair_pdf(p, wi, wo, cfg):
    g = _geometry(wi, wo, p, cfg, None)
    phi = g["phi_i"] - g["phi_o"]
    apdf = _ap_pdf(g, cfg)
    pdf = 0.0
    for pl in range(P_MAX + 1):
        s_op, c_op = _tilted(
            g["sin_theta_o"], g["cos_theta_o"], g["sin2k"], g["cos2k"], pl
        )
        mp = _mp(g["cos_theta_i"], c_op, g["sin_theta_i"], s_op,
                 g["v"][..., min(pl, 3)])
        if pl < P_MAX:
            npv = _np_term(phi, float(pl), g["s"], g["gamma_o"], g["gamma_t"])
        else:
            npv = jnp.full_like(phi, 1.0 / (2.0 * jnp.pi))
        pdf = pdf + apdf[..., pl] * mp * npv
    return pdf


def hair_sample(p, wi, u1, u2, cfg, wavelengths):
    """Returns (wo [N, 3], pdf [N]). Lobe pick uses u1 (rescaled within the
    chosen interval for a fresh uniform), theta uses (u1', u2[0]), phi uses
    u2[1]."""
    g = _geometry(wi, wi, p, cfg, wavelengths)  # wo unused for sampling setup
    apdf = _ap_pdf(g, cfg)  # [N, 4]
    c0 = apdf[..., 0]
    c1 = c0 + apdf[..., 1]
    c2 = c1 + apdf[..., 2]
    pl_pick = (
        (u1 >= c0).astype(jnp.int32) + (u1 >= c1).astype(jnp.int32)
        + (u1 >= c2).astype(jnp.int32)
    )
    lo = jnp.where(
        pl_pick == 0, 0.0,
        jnp.where(pl_pick == 1, c0, jnp.where(pl_pick == 2, c1, c2)),
    )
    w_pick = jnp.take_along_axis(apdf, pl_pick[..., None], -1)[..., 0]
    u1r = jnp.clip((u1 - lo) / jnp.maximum(w_pick, 1e-9), 1e-5, 1.0 - 1e-5)

    wo_all = []
    for pl in range(P_MAX + 1):
        s_op, c_op = _tilted(
            g["sin_theta_o"], g["cos_theta_o"], g["sin2k"], g["cos2k"], pl
        )
        v = g["v"][..., min(pl, 3)]
        u0 = jnp.maximum(u2[..., 0], 1e-5)
        cos_theta = 1.0 + v * jnp.log(
            u0 + (1.0 - u0) * jnp.exp(-2.0 / jnp.maximum(v, 1e-5))
        )
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
        cos_phi_c = jnp.cos(2.0 * jnp.pi * u1r)
        sin_theta_i = -cos_theta * s_op + sin_theta * cos_phi_c * c_op
        cos_theta_i = jnp.sqrt(jnp.maximum(1.0 - sin_theta_i ** 2, 1e-9))
        if pl < P_MAX:
            dphi = _phi_fn(float(pl), g["gamma_o"], g["gamma_t"]) + \
                _sample_trimmed_logistic(u2[..., 1], g["s"], -jnp.pi, jnp.pi)
        else:
            dphi = 2.0 * jnp.pi * u2[..., 1]
        phi_i = g["phi_o"] + dphi
        wo_all.append(jnp.stack(
            [sin_theta_i, cos_theta_i * jnp.sin(phi_i),
             cos_theta_i * jnp.cos(phi_i)], axis=-1
        ))
    wo = wo_all[0]
    for pl in range(1, P_MAX + 1):
        wo = jnp.where((pl_pick == pl)[..., None], wo_all[pl], wo)
    pdf = hair_pdf(p, wi, wo, cfg)
    return wo, pdf
