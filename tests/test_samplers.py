"""Sampler quality: CMJ / Halton stratification and variance-reduction
oracles (reference src/samplers/ role)."""
import numpy as np
import jax.numpy as jnp

from mitsuba3_plt_tpu.core.rng import cmj_sample_2d, halton_2d, _cmj_permute


def test_cmj_permutation_bijective():
    for l in [16, 48, 64, 100, 257]:
        for p in [7, 1234, 99999]:
            perm = np.asarray(
                _cmj_permute(jnp.arange(l, dtype=jnp.uint32), jnp.uint32(l),
                             jnp.full(l, p, jnp.uint32))
            )
            assert len(set(perm.tolist())) == l, (l, p)


def test_cmj_stratified_both_axes():
    spp = 64
    pts = np.asarray(
        cmj_sample_2d(jnp.arange(spp, dtype=jnp.uint32), spp,
                      jnp.full(spp, 7, jnp.uint32))
    )
    hx, _ = np.histogram(pts[:, 0], bins=8, range=(0, 1))
    hy, _ = np.histogram(pts[:, 1], bins=8, range=(0, 1))
    assert (hx == 8).all() and (hy == 8).all(), (hx, hy)


def test_variance_reduction_ranking():
    f = lambda p: np.sin(6.28 * p[..., 0]) * np.cos(6.28 * p[..., 1]) \
        + p[..., 0] * p[..., 1]
    rng = np.random.default_rng(0)
    spp = 64
    idx = jnp.arange(spp, dtype=jnp.uint32)
    est = {}
    for name in ["independent", "cmj", "halton"]:
        vals = []
        for pat in range(120):
            if name == "independent":
                pts = rng.random((spp, 2))
            elif name == "cmj":
                pts = np.asarray(
                    cmj_sample_2d(idx, spp, jnp.full(spp, pat, jnp.uint32))
                )
            else:
                pts = np.asarray(
                    halton_2d(idx, jnp.full(spp, pat, jnp.uint32))
                )
            vals.append(f(pts).mean())
        est[name] = float(np.std(vals))
    assert est["cmj"] < 0.5 * est["independent"], est
    assert est["halton"] < 0.8 * est["independent"], est


def test_orthogonal_oa_properties():
    """Bose OA strength 2 (orthogonal.cpp:224-252): for square spp, every
    res x res stratum holds exactly one point and each 1D projection is
    N-rooks (all spp fine strata distinct)."""
    from mitsuba3_plt_tpu.core.rng import orthogonal_2d

    spp = 16
    res = 4
    for pat in [3, 77, 912]:
        pts = np.asarray(
            orthogonal_2d(jnp.arange(spp, dtype=jnp.uint32), spp,
                          jnp.full(spp, pat, jnp.uint32))
        )
        assert pts.min() >= 0.0 and pts.max() < 1.0
        cx = np.floor(pts[:, 0] * res).astype(int)
        cy = np.floor(pts[:, 1] * res).astype(int)
        cells = set(zip(cx.tolist(), cy.tolist()))
        assert len(cells) == spp, (pat, sorted(cells))
        fx = np.floor(pts[:, 0] * spp).astype(int)
        fy = np.floor(pts[:, 1] * spp).astype(int)
        assert len(set(fx.tolist())) == spp, pat
        assert len(set(fy.tolist())) == spp, pat


def test_orthogonal_variance_beats_independent():
    from mitsuba3_plt_tpu.core.rng import orthogonal_2d

    f = lambda p: np.sin(6.28 * p[..., 0]) * np.cos(6.28 * p[..., 1]) \
        + p[..., 0] * p[..., 1]
    rng = np.random.default_rng(1)
    spp = 64
    idx = jnp.arange(spp, dtype=jnp.uint32)
    vals_oa, vals_ind = [], []
    for pat in range(120):
        pts = np.asarray(orthogonal_2d(idx, spp, jnp.full(spp, pat, jnp.uint32)))
        vals_oa.append(f(pts).mean())
        vals_ind.append(f(rng.random((spp, 2))).mean())
    assert np.std(vals_oa) < 0.5 * np.std(vals_ind), \
        (np.std(vals_oa), np.std(vals_ind))


def test_orthogonal_render_smoke():
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(16, 16)
    img = np.asarray(mi.render(scene, spp=16, seed=0, sampler_type="orthogonal"))
    assert np.all(np.isfinite(img)) and img.mean() > 0


def test_ld_02_sequence_elementary_intervals():
    """The (0,2)-sequence property: any 2^a x 2^b elementary-interval grid
    with 2^(a+b) cells holds EXACTLY one of the first 2^(a+b) points
    (XOR scrambling preserves this; Halton base-2/3 does not have it in
    base-2 grids). Reference role: src/samplers/ldsampler.cpp."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba3_plt_tpu.core.rng import ld_2d

    for pat in (7, 1234567):
        for (a, b) in [(4, 0), (0, 4), (2, 2), (3, 1), (1, 3), (2, 4)]:
            n = 1 << (a + b)
            pts = np.asarray(
                ld_2d(jnp.arange(n, dtype=jnp.uint32),
                      jnp.full((n,), pat, jnp.uint32))
            )
            ix = np.floor(pts[:, 0] * (1 << a)).astype(int)
            iy = np.floor(pts[:, 1] * (1 << b)).astype(int)
            cells = set(zip(ix.tolist(), iy.tolist()))
            assert len(cells) == n, (a, b, pat, len(cells))


def test_ld_matches_scipy_sobol_unscrambled():
    """With zero scrambling the pair is exactly (van der Corput, Sobol dim
    2) — cross-checked against scipy's Sobol generator."""
    import numpy as np
    import jax.numpy as jnp
    import pytest

    scipy_qmc = pytest.importorskip("scipy.stats.qmc")
    from mitsuba3_plt_tpu.core.rng import _bit_reverse32, _sobol2

    n = 64
    idx = jnp.arange(n, dtype=jnp.uint32)
    x = np.asarray(_bit_reverse32(idx)).astype(np.float64) / 2**32
    y = np.asarray(_sobol2(idx, jnp.zeros((n,), jnp.uint32))).astype(
        np.float64) / 2**32
    ref = scipy_qmc.Sobol(d=2, scramble=False).random(n)
    # scipy emits the same net in Gray-code order: compare the POINT SETS
    # (any 2^m prefix of a (0,2)-sequence is the same digital net)
    got = set(zip(x.round(9).tolist(), y.round(9).tolist()))
    want = set(zip(ref[:, 0].round(9).tolist(), ref[:, 1].round(9).tolist()))
    assert got == want
