"""Fresnel equations: scalar/unpolarized and fully polarized (complex amplitudes).

Complex arithmetic is hand-rolled on (re, im) pairs so every op lowers to
plain VPU float math (no complex64 — keeps the code Pallas-portable).

Conventions match the reference (independent implementation of the same
physics): Verdet sign convention for a_p, conjugated-kappa handling, signed
cos_theta_t; see /root/reference/include/mitsuba/render/fresnel.h:34-275.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m


# --- minimal complex helpers on (re, im) tuples ------------------------------

def c_add(a, b):
    return (a[0] + b[0], a[1] + b[1])


def c_sub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def c_mul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def c_div(a, b):
    d = b[0] * b[0] + b[1] * b[1]
    d = jnp.maximum(d, 1e-30)
    return ((a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d)


def c_rcp(a):
    d = jnp.maximum(a[0] * a[0] + a[1] * a[1], 1e-30)
    return (a[0] / d, -a[1] / d)


def c_sqrt(a):
    """Principal square root of a complex number."""
    r = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
    re = jnp.sqrt(jnp.maximum(0.5 * (r + a[0]), 0.0))
    im_mag = jnp.sqrt(jnp.maximum(0.5 * (r - a[0]), 0.0))
    im = jnp.where(a[1] >= 0, im_mag, -im_mag)
    return (re, im)


def c_abs2(a):
    return a[0] * a[0] + a[1] * a[1]


def c_conj(a):
    return (a[0], -a[1])


def c_scale(a, s):
    return (a[0] * s, a[1] * s)


def sincos_arg_diff(a, b):
    """(sin, cos) of delta = arg(a) - arg(b) without trig: from a * conj(b)."""
    p = c_mul(a, c_conj(b))
    n = jnp.sqrt(jnp.maximum(c_abs2(p), 1e-30))
    valid = c_abs2(p) > 1e-30
    cos_d = jnp.where(valid, p[0] / n, 1.0)
    sin_d = jnp.where(valid, p[1] / n, 0.0)
    return sin_d, cos_d


# --- unpolarized Fresnel ------------------------------------------------------

def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized dielectric Fresnel.

    Returns (F, cos_theta_t, eta_it, eta_ti); cos_theta_t is signed (opposite
    hemisphere of cos_theta_i), 0 under TIR.
    """
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    cos_theta_t_sqr = 1.0 - eta_ti * eta_ti * (1.0 - cos_theta_i * cos_theta_i)
    cos_theta_i_abs = jnp.abs(cos_theta_i)
    cos_theta_t_abs = m.safe_sqrt(cos_theta_t_sqr)

    a_s = (cos_theta_i_abs - eta_it * cos_theta_t_abs) / (
        cos_theta_i_abs + eta_it * cos_theta_t_abs
    )
    a_p = (eta_it * cos_theta_i_abs - cos_theta_t_abs) / (
        eta_it * cos_theta_i_abs + cos_theta_t_abs
    )
    F = 0.5 * (a_s * a_s + a_p * a_p)
    tir = cos_theta_t_sqr <= 0.0
    F = jnp.where(tir, 1.0, F)
    index_matched = eta == 1.0
    F = jnp.where(index_matched, 0.0, F)

    cos_theta_t = jnp.where(tir, 0.0, m.mulsign_neg(cos_theta_t_abs, cos_theta_i))
    return F, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta_re, eta_im):
    """Unpolarized conductor Fresnel reflectance (eta = eta_re + i*eta_im)."""
    ct2 = cos_theta_i * cos_theta_i
    st2 = jnp.maximum(1.0 - ct2, 0.0)
    e2 = eta_re * eta_re - eta_im * eta_im
    ek2 = 2.0 * eta_re * eta_im

    t0 = e2 - st2
    a2pb2 = m.safe_sqrt(t0 * t0 + ek2 * ek2)
    t1 = a2pb2 + ct2
    a = m.safe_sqrt(0.5 * (a2pb2 + t0))
    t2 = 2.0 * a * jnp.abs(cos_theta_i)
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ct2 * a2pb2 + st2 * st2
    t4 = t2 * st2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rs + rp)


# --- polarized Fresnel (complex amplitudes) ----------------------------------

def fresnel_diffuse_reflectance(eta):
    """Average dielectric Fresnel reflectance for a diffusely-lit surface
    (Egan & Hilgeman fit, same polynomial the reference uses in
    include/mitsuba/render/fresnel.h fresnel_diffuse_reflectance)."""
    eta = jnp.asarray(eta, jnp.float32)
    inv_eta = 1.0 / eta
    inv2 = inv_eta * inv_eta
    inv3 = inv2 * inv_eta
    inv4 = inv3 * inv_eta
    inv5 = inv4 * inv_eta
    above = (
        0.919317 - 3.4793 * inv_eta + 6.75335 * inv2
        - 7.80989 * inv3 + 4.98554 * inv4 - 1.36881 * inv5
    )
    below = (
        -9.23372 + 22.2272 * eta - 20.9292 * eta * eta
        + 10.2291 * eta ** 3 - 2.54396 * eta ** 4 + 0.254913 * eta ** 5
    )
    return jnp.where(eta >= 1.0, above, below)


def fresnel_polarized_dielectric(cos_theta_i, eta):
    """Real-eta polarized Fresnel. Returns (a_s, a_p, cos_theta_t, eta_it, eta_ti)
    with a_s/a_p complex pairs (the imaginary part carries the TIR phase)."""
    outside = cos_theta_i >= 0.0
    rcp_eta = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp_eta)
    eta_ti = jnp.where(outside, rcp_eta, eta)

    cos_theta_t_sqr = 1.0 - eta_ti * eta_ti * (1.0 - cos_theta_i * cos_theta_i)
    cos_theta_i_abs = jnp.abs(cos_theta_i)
    ctt = c_sqrt((cos_theta_t_sqr, jnp.zeros_like(cos_theta_t_sqr)))
    # Sign choice for the TIR phase (Clarke, "Stellar Polarimetry" A.2)
    ctt = (m.mulsign(ctt[0], cos_theta_t_sqr), m.mulsign(ctt[1], cos_theta_t_sqr))

    eit = (eta_it, jnp.zeros_like(eta_it))
    num_s = c_sub((cos_theta_i_abs, jnp.zeros_like(cos_theta_i_abs)), c_mul(eit, ctt))
    den_s = c_add((cos_theta_i_abs, jnp.zeros_like(cos_theta_i_abs)), c_mul(eit, ctt))
    a_s = c_div(num_s, den_s)
    num_p = c_sub(c_scale(eit, cos_theta_i_abs), ctt)
    den_p = c_add(c_scale(eit, cos_theta_i_abs), ctt)
    a_p = c_div(num_p, den_p)

    bad = jnp.logical_or(eta == 1.0, eta == 0.0)
    a_s = (jnp.where(bad, 0.0, a_s[0]), jnp.where(bad, 0.0, a_s[1]))
    a_p = (jnp.where(bad, 0.0, a_p[0]), jnp.where(bad, 0.0, a_p[1]))

    cos_theta_t = jnp.where(
        cos_theta_t_sqr >= 0.0, m.mulsign_neg(ctt[0], cos_theta_i), 0.0
    )
    return a_s, a_p, cos_theta_t, eta_it, eta_ti


def fresnel_polarized_conductor(cos_theta_i, eta_re, eta_im):
    """Complex-eta polarized Fresnel. Returns (a_s, a_p, cos_theta_t, eta_it, eta_ti)
    where eta_it/eta_ti are complex pairs."""
    outside = cos_theta_i >= 0.0
    # flip to the negative-kappa convention used by the polarized equations
    eta = (eta_re, jnp.where(eta_im > 0.0, -eta_im, eta_im))
    rcp_eta = c_rcp(eta)
    eta_it = (
        jnp.where(outside, eta[0], rcp_eta[0]),
        jnp.where(outside, eta[1], rcp_eta[1]),
    )
    eta_ti = (
        jnp.where(outside, rcp_eta[0], eta[0]),
        jnp.where(outside, rcp_eta[1], eta[1]),
    )

    st2 = 1.0 - cos_theta_i * cos_theta_i
    eta_ti_sq = c_mul(eta_ti, eta_ti)
    ctt_sqr = c_sub((jnp.ones_like(st2), jnp.zeros_like(st2)), c_scale(eta_ti_sq, st2))

    cos_theta_i_abs = jnp.abs(cos_theta_i)
    ctt = c_sqrt(ctt_sqr)
    ctt = (ctt[0], jnp.where(ctt[1] > 0, -ctt[1], ctt[1]))

    cia = (cos_theta_i_abs, jnp.zeros_like(cos_theta_i_abs))
    a_s = c_div(c_sub(cia, c_mul(eta_it, ctt)), c_add(cia, c_mul(eta_it, ctt)))
    a_p = c_div(
        c_sub(c_scale(eta_it, cos_theta_i_abs), ctt),
        c_add(c_scale(eta_it, cos_theta_i_abs), ctt),
    )

    sqn = c_abs2(eta)
    bad = jnp.logical_or(jnp.logical_and(sqn == 1.0, eta[1] == 0.0), sqn == 0.0)
    a_s = (jnp.where(bad, 0.0, a_s[0]), jnp.where(bad, 0.0, a_s[1]))
    a_p = (jnp.where(bad, 0.0, a_p[0]), jnp.where(bad, 0.0, a_p[1]))

    cos_theta_t = jnp.where(ctt_sqr[0] >= 0.0, m.mulsign_neg(ctt[0], cos_theta_i), 0.0)
    return a_s, a_p, cos_theta_t, eta_it, eta_ti
