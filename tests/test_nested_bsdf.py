"""Nested-wrapper BSDFs: blendbsdf / normalmap / bumpmap
(reference src/bsdfs/{blendbsdf,normalmap,bumpmap}.cpp). Chi^2 sampling
consistency through the nested dispatch, mixture algebra, and XML loading."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.librender import bsdfs
from mitsuba3_plt_tpu.librender.bsdf import (
    BSDFContext,
    BSDF_DIFFUSE, BSDF_ROUGH_CONDUCTOR, BSDF_BLEND, BSDF_NORMALMAP,
    BSDF_BUMPMAP,
)
from mitsuba3_plt_tpu.librender.records import SurfaceInteraction
from mitsuba3_plt_tpu.scene.loader import LoadedBSDF, build_material_table
from mitsuba3_plt_tpu.testing import ChiSquareTest, BSDFAdapter


def _wrap(btype, children, **kw):
    lb = LoadedBSDF(btype, **kw)
    lb.children = children
    return lb


def _blend_lb(weight_a=0.3):
    return _wrap(
        BSDF_BLEND,
        [
            LoadedBSDF(BSDF_DIFFUSE, base_color=(0.8, 0.4, 0.2)),
            LoadedBSDF(
                BSDF_ROUGH_CONDUCTOR, eta_re=(0.2,) * 3, eta_im=(3.9,) * 3,
                alpha=(0.3, 0.3),
            ),
        ],
        weight=weight_a,
    )


def _tilt_texture(dx=0.25, dy=0.1):
    """Constant normal-map texture encoding a tilted normal."""
    n = np.array([dx, dy, 1.0])
    n /= np.linalg.norm(n)
    return np.full((4, 4, 3), (n + 1.0) / 2.0, np.float32)


def run_chi2(lb, wi, sample_count=200000, res=17, ires=8):
    tab = build_material_table([lb])
    sf, pf = BSDFAdapter(tab, 0, wi, BSDFContext(), RGB)
    test = ChiSquareTest(
        sample_func=sf, pdf_func=pf, sample_count=sample_count, res=res,
        ires=ires,
    )
    assert test.run(), test.messages


def test_chi2_blend():
    wi = np.asarray([0.3, -0.1, 0.95])
    run_chi2(_blend_lb(0.3), wi / np.linalg.norm(wi))


def test_chi2_normalmap():
    wi = np.asarray([0.2, 0.1, 0.97])
    lb = _wrap(
        BSDF_NORMALMAP,
        [LoadedBSDF(BSDF_DIFFUSE, base_color=(0.6, 0.6, 0.6))],
        texture=_tilt_texture(),
    )
    run_chi2(lb, wi / np.linalg.norm(wi))


def _si_for(wi, n):
    wi = jnp.broadcast_to(jnp.asarray(wi, jnp.float32), (n, 3))
    return SurfaceInteraction(
        valid=jnp.ones(n, bool), t=jnp.ones(n), p=jnp.zeros((n, 3)),
        n=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (n, 1)),
        sh_s=jnp.tile(jnp.asarray([[1.0, 0, 0]]), (n, 1)),
        sh_t=jnp.tile(jnp.asarray([[0.0, 1, 0]]), (n, 1)),
        sh_n=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (n, 1)),
        uv=jnp.full((n, 2), 0.4), wi=wi,
        prim_idx=jnp.zeros(n, jnp.int32), mat_idx=jnp.zeros(n, jnp.int32),
        emitter_idx=jnp.full(n, -1, jnp.int32),
        shape_idx=jnp.zeros(n, jnp.int32),
    )


def test_blend_mixture_algebra():
    """blend.eval == w*evalA + (1-w)*evalB; same for pdf."""
    w = 0.3
    tab = build_material_table([_blend_lb(w)])
    # children were appended at rows 1 (diffuse) and 2 (roughconductor)
    n = 64
    rng = np.random.default_rng(1)
    wo = rng.standard_normal((n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo = jnp.asarray(wo)
    ctx = BSDFContext()
    si = _si_for([0.3, 0.1, 0.95] / np.linalg.norm([0.3, 0.1, 0.95]), n)
    wls = jnp.full((n, 3), 550.0)

    def ev(idx):
        midx = jnp.full((n,), idx, jnp.int32)
        return bsdfs.eval_pdf(tab, midx, si, wo, ctx, RGB, wls)

    e_mix, p_mix = ev(0)
    e_a, p_a = ev(1)
    e_b, p_b = ev(2)
    np.testing.assert_allclose(
        np.asarray(e_mix), w * np.asarray(e_a) + (1 - w) * np.asarray(e_b),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p_mix), w * np.asarray(p_a) + (1 - w) * np.asarray(p_b),
        rtol=1e-5, atol=1e-6,
    )


def test_normalmap_tilts_reflection():
    """A tilted normal map must rotate the diffuse lobe's mean direction."""
    lb = _wrap(
        BSDF_NORMALMAP,
        [LoadedBSDF(BSDF_DIFFUSE, base_color=(0.6, 0.6, 0.6))],
        texture=_tilt_texture(0.4, 0.0),
    )
    tab = build_material_table([lb])
    n = 4096
    si = _si_for([0.0, 0.0, 1.0], n)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random((n, 2), dtype=np.float32))
    wls = jnp.full((n, 3), 550.0)
    bs, val, ok = bsdfs.sample(
        tab, jnp.zeros((n,), jnp.int32), si, u1, u2, BSDFContext(), RGB, wls
    )
    wo = np.asarray(bs.wo)[np.asarray(ok)]
    # cosine lobe around the tilted normal -> mean direction tilted toward +x
    assert wo[:, 0].mean() > 0.15, wo.mean(axis=0)


def test_bumpmap_smoke():
    """Bump-mapped diffuse still samples a valid distribution."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :, :] = np.linspace(0, 1, 8)[None, :, None]  # ramp height
    lb = _wrap(
        BSDF_BUMPMAP,
        [LoadedBSDF(BSDF_DIFFUSE, base_color=(0.6, 0.6, 0.6))],
        texture=tex, weight=2.0,
    )
    tab = build_material_table([lb])
    n = 1024
    si = _si_for([0.1, 0.0, 0.995], n)
    rng = np.random.default_rng(0)
    bs, val, ok = bsdfs.sample(
        tab, jnp.zeros((n,), jnp.int32), si,
        jnp.asarray(rng.random(n, dtype=np.float32)),
        jnp.asarray(rng.random((n, 2), dtype=np.float32)),
        BSDFContext(), RGB, jnp.full((n, 3), 550.0),
    )
    assert bool(np.asarray(ok).any())
    assert np.isfinite(np.asarray(val)).all()


def test_blend_xml_roundtrip(tmp_path):
    xml = """<scene version="2.1.0">
      <bsdf type="blendbsdf" id="m">
        <float name="weight" value="0.25"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.8 0.1 0.1"/></bsdf>
        <bsdf type="roughconductor"><float name="alpha" value="0.2"/></bsdf>
      </bsdf>
      <shape type="rectangle"><ref id="m" name="bsdf"/></shape>
      <emitter type="constant"><rgb name="radiance" value="1 1 1"/></emitter>
    </scene>"""
    f = tmp_path / "blend.xml"
    f.write_text(xml)
    import mitsuba3_plt_tpu as mi

    scene, meta = mi.load_file(str(f), resx=8, resy=8)
    mats = scene.materials
    assert int(np.asarray(mats.mtype)[0]) == BSDF_BLEND
    # reference semantics: weight = probability of the SECOND child
    assert abs(float(np.asarray(mats.weight)[0]) - 0.75) < 1e-6
    assert int(np.asarray(mats.nested_idx)[0]) == 1
    assert int(np.asarray(mats.nested_idx2)[0]) == 2
    img = np.asarray(mi.render((scene, meta), spp=2))
    assert np.isfinite(img).all()
