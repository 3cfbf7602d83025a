"""Measured (RGL data-driven) BSDF: tensor-file IO round trip, chi^2
sample/pdf consistency, and eval parity against the analytic GGX data the
synthetic measurement was built from (reference src/bsdfs/measured.cpp,
src/core/tensor.cpp)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.librender.bsdf import BSDFContext, BSDF_MEASURED
from mitsuba3_plt_tpu.librender import measured as meas_mod
from mitsuba3_plt_tpu.librender import microfacet as mf
from mitsuba3_plt_tpu.scene.loader import LoadedBSDF, build_material_table
from mitsuba3_plt_tpu.testing import ChiSquareTest, BSDFAdapter

ALPHA = 0.3
RES = 32
NTI = 12


def _ggx_D(m_vec):
    a2 = ALPHA * ALPHA
    ct = np.clip(m_vec[..., 2], 1e-7, 1.0)
    ct2 = ct * ct
    denom = np.pi * (ct2 * (a2 - 1.0) + 1.0) ** 2
    return np.where(m_vec[..., 2] > 0, a2 / np.maximum(denom, 1e-12), 0.0)


def _ggx_G1(v):
    ct = np.clip(np.abs(v[..., 2]), 1e-7, 1.0)
    t2 = (1.0 - ct * ct) / (ct * ct)
    return 2.0 / (1.0 + np.sqrt(1.0 + ALPHA * ALPHA * t2))


def _sph(theta, phi):
    st = np.sin(theta)
    return np.stack(
        [np.cos(phi) * st, np.sin(phi) * st, np.cos(theta)], axis=-1
    )


def make_synthetic_ggx():
    """Synthesize an isotropic GGX 'measurement' in the RGL layout.

    Identities used (F = 1 conductor):
      sigma(wi)  = cos_i / G1(wi)
      vndf grid  = D(m) <wi,m>+ x du->dm jacobian (2 pi^2 u_x sin(theta_m))
      spectra    = G1(wo) at the WARPED sample position, so that
                   eval = spectra * ndf / (4 sigma) = D G / (4 cos_i)
    """
    theta_i = np.linspace(0.0, 1.45, NTI).astype(np.float32)
    phi_i = np.zeros(1, np.float32)

    u = (np.arange(RES) / (RES - 1)).astype(np.float64)
    ux, uy = np.meshgrid(u, u)           # [RES(y), RES(x)]
    theta_m = ux * ux * (np.pi / 2.0)
    phi_m = (2.0 * uy - 1.0) * np.pi
    m_grid = _sph(theta_m, phi_m)         # [R, R, 3]
    jac_u = 2.0 * np.pi ** 2 * ux * np.sin(theta_m)

    ndf = _ggx_D(m_grid).astype(np.float32)

    # sigma over the u_wi grid: depends only on theta (isotropic)
    theta_wi = ux * ux * (np.pi / 2.0)
    wi_grid = _sph(theta_wi, np.zeros_like(theta_wi))
    sigma = (
        np.clip(wi_grid[..., 2], 1e-3, 1.0) / _ggx_G1(wi_grid)
    ).astype(np.float32)

    vndf = np.zeros((1, NTI, RES, RES), np.float32)
    lum = np.ones((1, NTI, RES, RES), np.float32)
    for ti, th in enumerate(theta_i):
        wi = _sph(th, 0.0)
        dvis = _ggx_D(m_grid) * np.maximum((m_grid * wi).sum(-1), 0.0)
        vndf[0, ti] = (dvis * jac_u).astype(np.float32)

    data = {
        "theta_i": theta_i, "phi_i": phi_i,
        "ndf": ndf, "sigma": sigma, "vndf": vndf, "luminance": lum,
        "description": np.frombuffer(b"synthetic ggx", np.uint8).copy(),
        "jacobian": np.array([1], np.uint8),
    }

    # spectra: G1(wo) at the warped sample position — build the grid by
    # forward-warping each sample node through OUR warp (self-consistent
    # with eval's inversion)
    tables = meas_mod.build_measured_tables(
        [dict(data, rgb=np.ones((1, NTI, 3, RES, RES), np.float32))]
    )
    rgb = np.zeros((1, NTI, 3, RES, RES), np.float32)
    a_grid = jnp.asarray(np.repeat(u, RES))      # marginal driver (y_s)
    b_grid = jnp.asarray(np.tile(u, RES))        # conditional driver (x_s)
    for ti, th in enumerate(theta_i):
        sl = jnp.full((RES * RES,), ti, jnp.int32)
        ux_w, uy_w, _ = meas_mod.warp_sample(
            sl, a_grid, b_grid, tables.vndf_d, tables.vndf_row,
            tables.vndf_marg, tables.vndf_cond,
        )
        th_m = np.asarray(ux_w) ** 2 * (np.pi / 2.0)
        ph_m = (2.0 * np.asarray(uy_w) - 1.0) * np.pi
        m_vec = _sph(th_m, ph_m)
        wi = _sph(th, 0.0)
        wo = 2.0 * (m_vec * wi).sum(-1, keepdims=True) * m_vec - wi
        g1o = np.where(wo[..., 2] > 0, _ggx_G1(wo), 0.0)
        # grid index: a drives y (row), b drives x (col)
        rgb[0, ti] = g1o.reshape(RES, RES)[None, :, :].repeat(3, 0)
    data["rgb"] = rgb
    return data


DATA = make_synthetic_ggx()


def test_tensor_file_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "synthetic.bsdf")
    meas_mod.write_tensor_file(path, DATA)
    back = meas_mod.read_tensor_file(path)
    assert set(back) == set(DATA)
    for k in DATA:
        np.testing.assert_array_equal(back[k], DATA[k], err_msg=k)


def test_measured_chi2():
    tab = build_material_table(
        [LoadedBSDF(BSDF_MEASURED, meas_data=DATA)]
    )
    wi = np.asarray([0.35, 0.1, 0.93])
    wi = wi / np.linalg.norm(wi)
    sf, pf = BSDFAdapter(tab, 0, wi, BSDFContext(), RGB)
    test = ChiSquareTest(
        sample_func=sf, pdf_func=pf, sample_count=200000, res=17, ires=32,
    )
    assert test.run(), test.messages


def test_measured_eval_matches_analytic_ggx():
    from mitsuba3_plt_tpu.librender import bsdfs
    from mitsuba3_plt_tpu.librender.records import SurfaceInteraction

    tab = build_material_table(
        [LoadedBSDF(BSDF_MEASURED, meas_data=DATA)]
    )
    rng = np.random.default_rng(5)
    n = 256
    wi = np.stack(
        [rng.normal(size=n), rng.normal(size=n), rng.uniform(0.3, 1.0, n)],
        axis=-1,
    )
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = np.stack(
        [rng.normal(size=n), rng.normal(size=n), rng.uniform(0.3, 1.0, n)],
        axis=-1,
    )
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)

    z = jnp.zeros((n, 3), jnp.float32)
    e = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (n, 1))
    e2 = jnp.tile(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 1))
    si = SurfaceInteraction(
        valid=jnp.ones((n,), bool), t=jnp.ones((n,)), p=z, n=nrm,
        sh_s=e, sh_t=e2, sh_n=nrm, uv=jnp.zeros((n, 2)),
        wi=jnp.asarray(wi, jnp.float32),
        prim_idx=jnp.zeros((n,), jnp.int32),
        mat_idx=jnp.zeros((n,), jnp.int32),
        emitter_idx=jnp.full((n,), -1, jnp.int32),
        shape_idx=jnp.zeros((n,), jnp.int32),
    )
    val = np.asarray(
        bsdfs.eval_(
            tab, jnp.zeros(n, jnp.int32), si, jnp.asarray(wo, jnp.float32),
            BSDFContext(), RGB,
        )
    )[..., 0]

    h = wi + wo
    h /= np.linalg.norm(h, axis=-1, keepdims=True)
    expected = (
        _ggx_D(h) * _ggx_G1(wi) * _ggx_G1(wo) / (4.0 * wi[..., 2])
    )
    # tabulated data at RES=32: expect agreement within ~15% relative on
    # the non-tail region
    mask = expected > 0.05
    rel = np.abs(val[mask] - expected[mask]) / expected[mask]
    assert np.median(rel) < 0.1, np.median(rel)
    assert np.mean(rel) < 0.25, np.mean(rel)


def test_measured_render_smoke():
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.core import transform as tf

    scene, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "point", "position": [2, 2, 4],
                  "intensity": [30, 30, 30]},
        "plane": {
            "type": "rectangle",
            "bsdf": {"type": "measured", "data": DATA},
        },
    })
    img = np.asarray(mi.render(scene, spp=16, seed=0))
    assert np.all(np.isfinite(img))
    assert img.max() > 0
