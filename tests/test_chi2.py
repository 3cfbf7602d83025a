"""Chi^2 goodness-of-fit of BSDF sample() vs pdf() (the reference's
per-plugin chi2 tests, e.g. src/bsdfs/tests/test_rough_conductor.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.librender.bsdf import (
    BSDFContext, MaterialTable,
    BSDF_DIFFUSE, BSDF_ROUGH_CONDUCTOR, BSDF_ROUGH_DIELECTRIC, BSDF_PLASTIC,
    BSDF_ROUGH_PLASTIC,
)
from mitsuba3_plt_tpu.scene.loader import LoadedBSDF, build_material_table
from mitsuba3_plt_tpu.testing import ChiSquareTest, BSDFAdapter


def make_table(lb):
    return build_material_table([lb])


def run_chi2(lb, wi, sample_count=200000, res=17, ires=16):
    # ires=16: the Beckmann NDF (now the default, matching the reference's
    # rough plugins) has a sharper peak than GGX; ires=8 under-integrates
    # the peak cells and fails chi2 on a CORRECT sampler (verified against
    # the analytic visible-normal marginals at ires 16/32)
    tab = make_table(lb)
    sf, pf = BSDFAdapter(tab, 0, wi, BSDFContext(), RGB)
    test = ChiSquareTest(
        sample_func=sf, pdf_func=pf, sample_count=sample_count, res=res,
        ires=ires,
    )
    ok = test.run()
    assert ok, test.messages


@pytest.mark.parametrize("wi", [[0.0, 0.0, 1.0], [0.5, 0.2, 0.84]])
def test_chi2_diffuse(wi):
    wi = np.asarray(wi) / np.linalg.norm(wi)
    run_chi2(LoadedBSDF(BSDF_DIFFUSE, base_color=(0.5, 0.5, 0.5)), wi)


@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_chi2_rough_conductor(alpha):
    wi = np.asarray([0.4, -0.1, 0.91])
    wi = wi / np.linalg.norm(wi)
    run_chi2(
        LoadedBSDF(
            BSDF_ROUGH_CONDUCTOR, eta_re=(0.2,) * 3, eta_im=(3.9,) * 3,
            alpha=(alpha, alpha),
        ),
        wi,
    )


def test_chi2_rough_dielectric():
    wi = np.asarray([0.3, 0.1, 0.95])
    wi = wi / np.linalg.norm(wi)
    # the refraction jacobian concentrates the transmitted lobe sharply;
    # the per-cell trapezoid needs a fine subgrid to integrate it
    run_chi2(
        LoadedBSDF(BSDF_ROUGH_DIELECTRIC, eta_re=(1.5,) * 3, alpha=(0.3, 0.3)),
        wi, ires=64,
    )


def test_chi2_rough_dielectric_inside():
    # from inside the medium (TIR region exercises the transmission branch)
    wi = np.asarray([0.2, 0.0, -0.98])
    wi = wi / np.linalg.norm(wi)
    run_chi2(
        LoadedBSDF(BSDF_ROUGH_DIELECTRIC, eta_re=(1.5,) * 3, alpha=(0.35, 0.35)),
        wi, ires=64,
    )


def test_chi2_plastic():
    # delta lobe excluded: test only the diffuse continuum against its pdf
    wi = np.asarray([0.2, 0.4, 0.89])
    wi = wi / np.linalg.norm(wi)
    from mitsuba3_plt_tpu.testing.chi2 import ChiSquareTest, BSDFAdapter as BA
    tab = make_table(
        LoadedBSDF(BSDF_PLASTIC, base_color=(0.5, 0.5, 0.5), eta_re=(1.49,) * 3)
    )
    sf0, pf = BA(tab, 0, wi, BSDFContext(), RGB)

    def sf(n):
        d, ok = sf0(n)
        # drop the delta (mirror) lobe: it has measure zero in the pdf
        spec = jnp.abs(d[:, 2] - wi[2]) < 1e-5
        return d, ok & ~spec

    test = ChiSquareTest(sample_func=sf, pdf_func=pf, sample_count=200000,
                         res=17, ires=8)
    assert test.run(), test.messages


def test_chi2_rough_plastic():
    wi = np.asarray([0.1, -0.3, 0.95])
    wi = wi / np.linalg.norm(wi)
    run_chi2(
        LoadedBSDF(
            BSDF_ROUGH_PLASTIC, base_color=(0.4, 0.4, 0.4),
            eta_re=(1.49,) * 3, alpha=(0.3, 0.3),
        ),
        wi,
    )


@pytest.mark.parametrize("metallic,rough", [(0.0, 0.5), (1.0, 0.35), (0.4, 0.6)])
def test_chi2_principled(metallic, rough):
    from mitsuba3_plt_tpu.librender.bsdf import BSDF_PRINCIPLED

    wi = np.asarray([0.3, -0.15, 0.94])
    wi = wi / np.linalg.norm(wi)
    # ires=32: the Disney alpha = roughness^2 mapping gives sharp lobes
    # that need a fine per-cell integration subgrid (cf. roughdielectric)
    run_chi2(
        LoadedBSDF(
            BSDF_PRINCIPLED, base_color=(0.7, 0.5, 0.3), alpha=(rough, rough),
            pr_params=(metallic, 0.5, 0.0, 0.3, 0.5, 0.3, 0.5, 0.0),
        ),
        wi, ires=32,
    )


@pytest.mark.parametrize("spec_trans,diff_trans", [(0.0, 0.0), (0.7, 0.0),
                                                   (0.4, 1.0), (1.0, 0.0)])
def test_chi2_principledthin(spec_trans, diff_trans):
    from mitsuba3_plt_tpu.librender.bsdf import BSDF_PRINCIPLED_THIN

    wi = np.asarray([0.3, -0.2, 0.93])
    wi = wi / np.linalg.norm(wi)
    run_chi2(
        LoadedBSDF(
            BSDF_PRINCIPLED_THIN, base_color=(0.6, 0.5, 0.4),
            alpha=(0.5, 0.5), eta_re=(1.5,) * 3,
            pr_params=(spec_trans, diff_trans / 2.0, 0.0, 0.0, 0.5, 0.0,
                       0.0, 0.0),
        ),
        wi, ires=32,
    )


def test_chi2_principledthin_backside():
    """Thin BSDF is symmetric: sampling from below must also match its pdf."""
    from mitsuba3_plt_tpu.librender.bsdf import BSDF_PRINCIPLED_THIN

    wi = np.asarray([0.3, 0.1, -0.94])
    wi = wi / np.linalg.norm(wi)
    run_chi2(
        LoadedBSDF(
            BSDF_PRINCIPLED_THIN, base_color=(0.6, 0.5, 0.4),
            alpha=(0.4, 0.4), eta_re=(1.5,) * 3,
            pr_params=(0.5, 0.3, 0.2, 0.3, 0.5, 0.5, 0.0, 0.3),
        ),
        wi, ires=32,
    )
