"""Adjoint particle tracer: forward/adjoint consistency (reference
AdjointIntegrator::render role, src/render/integrator.cpp:545-649)."""
import numpy as np

from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.common import render
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.integrators.ptracer import render_ptracer, ParticleTracer
from mitsuba3_plt_tpu.scene.presets import cornell_box


def test_ptracer_matches_path():
    scene, _ = cornell_box(16, 16)
    img_f = np.asarray(
        render(scene, PathIntegrator(max_depth=3, rr_depth=9).sample,
               seed=0, spp=32, cfg=RGB)
    )
    img_p = np.asarray(
        render_ptracer(scene, n_particles=1 << 17, seed=0, cfg=RGB,
                       integrator=ParticleTracer(max_depth=3, rr_depth=9))
    )
    assert not np.isnan(img_p).any()
    ratio = img_p.mean() / img_f.mean()
    assert 0.85 < ratio < 1.15, ratio  # splatting estimator is high-variance at 16x16
    m = img_f.sum(-1) > 0.01
    corr = np.corrcoef(img_f[m].ravel(), img_p[m].ravel())[0, 1]
    assert corr > 0.98, corr


def test_ptracer_polarized_s0():
    """Polarized adjoint transport (round 5): the particle carries its
    Stokes vector from the light, so the splat S0 is exact. On an
    all-diffuse scene it equals the scalar estimator bit-for-bit; with a
    conductor box it stays finite and close (the Mueller chain changes
    multi-bounce S0 only through genuine polarization)."""
    import dataclasses as _dc

    from mitsuba3_plt_tpu.config import RGB, RGB_POLARIZED
    from mitsuba3_plt_tpu.integrators.ptracer import render_ptracer
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    scene, _ = cornell_box(16, 16)
    a = np.asarray(render_ptracer(scene, n_particles=1 << 14, seed=1,
                                  cfg=RGB))
    b = np.asarray(render_ptracer(scene, n_particles=1 << 14, seed=1,
                                  cfg=RGB_POLARIZED))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=1e-6)

    scene_c, _ = cornell_box(16, 16, box_material="conductor")
    c = np.asarray(render_ptracer(scene_c, n_particles=1 << 14, seed=1,
                                  cfg=RGB_POLARIZED))
    c0 = np.asarray(render_ptracer(scene_c, n_particles=1 << 14, seed=1,
                                   cfg=RGB))
    assert np.isfinite(c).all()
    assert c.mean() > 0
    # polarization changes multi-bounce S0 by a bounded amount
    assert abs(c.mean() - c0.mean()) / c0.mean() < 0.2
