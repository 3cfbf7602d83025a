"""Pallas TPU kernel for the roughgrating wave-eval lobe sum.

The PLT NEE replay evaluates the diffraction-lobe sum for every lane at
every depth (reference roughgrating.cpp:676-970). The pure-XLA version in
plt/wbsdf.py materializes ~100 [N, C, L] intermediates across fusion
boundaries (the Bessel fori_loop splits the fusion): measured 27 ms per
call at a 1.92M-lane wavefront, ~30 GB of HBM traffic for ~150 MB of real
input. This kernel fuses the ENTIRE chain — Miller-recurrence Bessel sweep,
per-order intensities, grating-equation lobe centers, acceptance cone and
angular-coherence falloff — into one pass over the wavefront: every
temporary lives in vector registers, HBM traffic is one read of the lane
inputs + one [N, C] write.

Numerical deviation from the XLA path: Mosaic has no asin lowering, so
unit_angle_dot's `2*asin(d/2)` uses a minimax polynomial (Abramowitz &
Stegun 4.4.45, |err| <= 6.8e-5 rad) — negligible against the Gaussian
falloff it feeds (tests compare the two paths at rtol 1e-3).

The (half, separable) specialization mirrors MaterialTable.grt_static:
separable means every grating in the scene is 1D and axis-aligned, so the
2D lobe grid collapses to one row times the ly multiplicity (identical
algebra to the XLA path in wbsdf.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import math as m

SUB = 32
LANES = 128
BLOCK = SUB * LANES

# grating type tags (plt/grating.py)
_SINUSOIDAL = 0
_RECTANGULAR = 1
_LINEAR = 2

_BESSEL_M = 64          # Miller start order (matches core.math.bessel_jn_fast)
_ASYMP_SWITCH = 0.75 * _BESSEL_M


def _asin_poly(z):
    """asin for z in [0, 1]: A&S 4.4.45, |err| <= 6.8e-5."""
    z = jnp.clip(z, 0.0, 1.0)
    p = 1.5707963 + z * (-0.2145988 + z * (0.0889789 + z * (
        -0.0501743 + z * (0.0308918 + z * (-0.0170881 + z * (
            0.0066700 + z * -0.0012624))))))
    return 1.5707963268 - jnp.sqrt(jnp.maximum(1.0 - z, 0.0)) * p


def _unit_angle_dot(dot_uv):
    """core.math.unit_angle_dot with the polynomial asin."""
    d = jnp.sqrt(jnp.maximum(2.0 - 2.0 * jnp.abs(dot_uv), 0.0))
    theta = 2.0 * _asin_poly(0.5 * d)
    return jnp.where(dot_uv < 0, m.Pi - theta, theta)


def _safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _bessel_sweep(a, half):
    """J_0(|a|)..J_half(|a|) by Miller downward recurrence, fully unrolled
    in registers (core.math.bessel_jn_fast algebra, M = 64, scale guards).

    Returns list of half+1 tiles."""
    x_abs = jnp.abs(a)
    x_safe = jnp.maximum(x_abs, 1e-6)
    inv_x = 1.0 / x_safe

    jp1 = jnp.zeros_like(x_safe)
    jk = jnp.full_like(x_safe, 1e-30)
    norm = jnp.zeros_like(x_safe)
    outs = [None] * (half + 1)
    for i in range(_BESSEL_M):
        k = float(_BESSEL_M - i)
        jm1 = (2.0 * k) * inv_x * jk - jp1
        jp1, jk = jk, jm1
        scale = jnp.where(jnp.abs(jk) > 1e18, 1e-18, 1.0)
        kk = int(k) - 1  # jk now holds J_kk (unnormalized)
        contrib = jnp.where(kk == 0, jk, 2.0 * jk) if kk % 2 == 0 else None
        if contrib is not None:
            norm = norm + contrib
        jp1 = jp1 * scale
        jk = jk * scale
        norm = norm * scale
        if kk <= half:
            outs[kk] = jk
            for j in range(kk + 1, half + 1):
                outs[j] = outs[j] * scale

    inv_norm = jnp.where(norm >= 0, 1.0, -1.0) / jnp.maximum(
        jnp.abs(norm), 1e-30
    )
    res = [o * inv_norm for o in outs]

    # two-term Hankel asymptotics beyond the recurrence's validity
    use_asym = x_abs > _ASYMP_SWITCH
    i8x = 1.0 / (8.0 * x_safe)
    sq = jnp.sqrt(2.0 / (m.Pi * x_safe))
    at_zero = x_abs < 1e-6
    for nu in range(half + 1):
        mu = 4.0 * float(nu) * float(nu)
        p = 1.0 - (mu - 1.0) * (mu - 9.0) * 0.5 * i8x * i8x
        q = (mu - 1.0) * i8x
        omega = x_abs - (0.5 * nu + 0.25) * m.Pi
        asym = sq * (jnp.cos(omega) * p - jnp.sin(omega) * q)
        r = jnp.where(use_asym, asym, res[nu])
        r = jnp.where(at_zero, 1.0 if nu == 0 else 0.0, r)
        res[nu] = r
    return res


def _kernel(wix, wiy, wiz, wox, woy, woz,
            gdc, gds, ipx, ipy, q, lobes, gtype, mult, coh, acone,
            *wl_and_out, half: int, separable: bool, n_channels: int):
    wl_refs = wl_and_out[:n_channels]
    out_refs = wl_and_out[n_channels:]

    wi_x, wi_y, wi_z = wix[...], wiy[...], wiz[...]
    wo_x, wo_y, wo_z = wox[...], woy[...], woz[...]
    cg, sg = gdc[...], gds[...]
    ip_x, ip_y = ipx[...], ipy[...]
    qv, lob, gt = q[...], lobes[...], gtype[...]
    mu_, co_, ac_ = mult[...], coh[...], acone[...]

    # lane-invariant (channel-independent) quantities
    px = jnp.sqrt(wi_x * wi_x + wi_z * wi_z)
    py = jnp.sqrt(wi_y * wi_y + wi_z * wi_z)
    sin_ix = jnp.where(px > m.Epsilon, wi_x / jnp.maximum(px, 1e-20), 0.0)
    sin_iy = jnp.where(py > m.Epsilon, wi_y / jnp.maximum(py, 1e-20), 0.0)
    cos_t = jnp.abs(wi_z)
    half_lobes = jnp.floor(lob * 0.5)  # lobes//2 as float
    is_1d = ip_y < m.Epsilon
    is_sin = gt < 0.5           # SINUSOIDAL = 0
    is_rect = jnp.abs(gt - 1.0) < 0.5

    if separable:
        lobe_list = [(lx, 0) for lx in range(-half, half + 1)]
    else:
        lobe_list = [
            (lx, ly)
            for lx in range(-half, half + 1)
            for ly in range(-half, half + 1)
        ]

    for c in range(n_channels):
        wl_um = wl_refs[c][...] * 1e-3
        kwn = 2.0 * m.Pi / jnp.maximum(wl_um, 1e-6)

        # ---- order intensities 0..half (grating.order_intensities) ----
        a = 4.0 * m.Pi * qv / jnp.maximum(wl_um * cos_t, 1e-12)
        J = _bessel_sweep(a, half)
        sin_half_a = jnp.sin(a * 0.5)
        base = [None] * (half + 1)
        base[0] = jnp.ones_like(a)
        for j in range(1, half + 1):
            sin_j = J[j] * J[j]
            # rect: sin(a/2) * sinc(pi j / 2) — sinc factor is a constant
            import math as _math
            _x = _math.pi * 0.5 * j
            sc = _math.sin(_x) / _x
            rect_j = sin_half_a * sc
            lin_j = 1.0 / float(j) ** 0.5
            base[j] = jnp.where(
                is_sin, sin_j, jnp.where(is_rect, rect_j, lin_j)
            )

        # inv coherence det: Coherence.isotropic(coh, 1).inv_coherence_det(k)
        # = (coh * k / (2 pi * 1e3))^2
        s = co_ * kwn * (1.0 / (2.0 * m.Pi * 1e3))
        inv_det = s * s

        acc = jnp.zeros_like(a)
        corr = jnp.zeros_like(a) if separable else None
        for (lx, ly) in lobe_list:
            ax_, ay_ = abs(lx), abs(ly)
            live = half_lobes >= float(max(ax_, ay_))
            ix = base[ax_]
            iy = jnp.where(is_1d, ix, base[ay_]) if ay_ <= half else ix
            lobe_int = mu_ * ix * iy

            lob_rx = cg * float(lx) - sg * float(ly)
            lob_ry = sg * float(lx) + cg * float(ly)
            aa = wl_um * lob_rx * ip_x - sin_ix
            bb = wl_um * lob_ry * ip_y - sin_iy
            den = aa * aa * bb * bb - 1.0
            mm = (aa * aa - 1.0) / jnp.where(
                jnp.abs(den) > 1e-12, den, 1e-12
            )
            qq = 1.0 - bb * bb * mm
            lobe_ok = (jnp.abs(aa) <= 1.0) & (jnp.abs(bb) <= 1.0)
            cd_dot_wo = (
                aa * _safe_sqrt(qq) * wo_x
                + bb * _safe_sqrt(mm) * wo_y
                + _safe_sqrt(1.0 - aa * aa * qq - bb * bb * mm) * wo_z
            )
            ang = _unit_angle_dot(cd_dot_wo)
            in_cone = jnp.abs(ang) < ac_
            ang_coh = jnp.exp(-0.5 * ang * ang * inv_det)

            sel = lobe_ok & in_cone & live
            if lx == 0 and ly == 0:
                acc = acc + jnp.where(sel, lobe_int, 0.0)
                if separable:
                    ny = 2.0 * half_lobes + 1.0
                    corr = jnp.where(
                        sel, lobe_int * (ang_coh - 1.0) * (ny - 1.0), 0.0
                    )
            else:
                acc = acc + jnp.where(sel, lobe_int * ang_coh, 0.0)

        if separable:
            ny = 2.0 * half_lobes + 1.0
            acc = acc * ny + corr
        out_refs[c][...] = acc


@functools.partial(
    jax.jit,
    static_argnames=("half", "separable", "n_channels", "interpret"),
)
def grating_lobe_sum(
    wi, wo, wl_nm, grating_dir, inv_period, q, lobes, gtype, multiplier,
    coherence, a_cone, half: int, separable: bool, n_channels: int,
    interpret: bool = False,
):
    """Fused lobe-sum eval: returns per-sampled-wavelength intensity [N, C].

    Inputs are per-lane: wi/wo [N,3] local dirs, wl_nm [N,C], grating_dir
    [N,2], inv_period [N,2] (1/um), q [N] (um), lobes [N] int, gtype [N]
    int (masked to TYPE_MASK by caller), multiplier/coherence/a_cone [N].
    """
    n = wi.shape[0]
    pad = (-n) % BLOCK
    npad = n + pad

    def prep(x):
        x = jnp.pad(x.astype(jnp.float32), (0, pad))
        return x.reshape(npad // LANES, LANES)

    ins = [
        prep(wi[:, 0]), prep(wi[:, 1]), prep(wi[:, 2]),
        prep(wo[:, 0]), prep(wo[:, 1]), prep(wo[:, 2]),
        prep(grating_dir[:, 0]), prep(grating_dir[:, 1]),
        prep(inv_period[:, 0]), prep(inv_period[:, 1]),
        prep(q), prep(lobes.astype(jnp.float32)),
        prep(gtype.astype(jnp.float32)), prep(multiplier),
        prep(coherence), prep(a_cone),
    ] + [prep(wl_nm[:, c]) for c in range(n_channels)]

    spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _kernel, half=half, separable=separable, n_channels=n_channels
        ),
        grid=(npad // BLOCK,),
        in_specs=[spec] * len(ins),
        out_specs=[spec] * n_channels,
        out_shape=[
            jax.ShapeDtypeStruct((npad // LANES, LANES), jnp.float32)
        ] * n_channels,
        interpret=interpret,
    )(*ins)
    return jnp.stack([o.reshape(npad)[:n] for o in outs], axis=-1)
