"""Gradient correctness: forward/backward AD vs finite differences (the
reference's test_ad_integrators.py pattern, SURVEY §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.ad import traverse, Adam, SGD
from mitsuba3_plt_tpu.ad.render import render_differentiable, render_loss_grad
from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def tiny_scene():
    scene, _ = cornell_box(12, 12)
    return scene


def test_traverse_roundtrip(tiny_scene):
    params = traverse(tiny_scene)
    assert "materials.base_color" in params
    bc = params["materials.base_color"]
    s2 = params.update({"materials.base_color": bc * 0.5})
    np.testing.assert_allclose(
        np.asarray(s2.materials.base_color), np.asarray(bc) * 0.5
    )
    # untouched leaves are the same objects
    assert s2.geo.tri_p0 is tiny_scene.geo.tri_p0


def test_albedo_grad_vs_fd(tiny_scene):
    integ = PathIntegrator(max_depth=3, rr_depth=8)
    key = "materials.base_color"
    loss_fn = lambda img: jnp.mean(img)

    loss, grads = render_loss_grad(
        tiny_scene, integ.sample, loss_fn, [key], seed=0, spp=16, cfg=RGB
    )
    g = np.asarray(grads[key])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0

    # FD on the white-wall albedo red channel (same seed -> same sampler ->
    # correlated estimates, FD of the *estimator* equals AD exactly up to
    # nonlinearity)
    params = traverse(tiny_scene)
    bc = params[key]
    eps = 1e-2

    def run(delta):
        p = bc.at[0, 0].add(delta)
        sc = params.update({key: p})
        img = render_differentiable(sc, integ.sample, seed=0, spp=16, cfg=RGB)
        return float(jnp.mean(img))

    fd = (run(eps) - run(-eps)) / (2 * eps)
    ad = float(g[0, 0])
    assert abs(fd - ad) < 0.05 * max(abs(fd), abs(ad), 1e-3), (fd, ad)


def test_emitter_grad(tiny_scene):
    integ = PathIntegrator(max_depth=2, rr_depth=8)
    loss, grads = render_loss_grad(
        tiny_scene, integ.sample, lambda img: jnp.mean(img),
        ["emitters.radiance"], seed=0, spp=8, cfg=RGB,
    )
    g = np.asarray(grads["emitters.radiance"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_adam_optimizes_albedo(tiny_scene):
    """Inverse rendering smoke: recover a darker wall albedo from a target."""
    integ = PathIntegrator(max_depth=2, rr_depth=8)
    params = traverse(tiny_scene)
    key = "materials.base_color"
    target_albedo = params[key].at[0].multiply(0.5)
    target_scene = params.update({key: target_albedo})
    target = render_differentiable(target_scene, integ.sample, seed=0, spp=16,
                                   cfg=RGB)

    opt = Adam(lr=0.1)
    p = {key: params[key]}
    state = opt.init(p)

    def loss_of(pdict):
        sc = params.update(pdict)
        img = render_differentiable(sc, integ.sample, seed=0, spp=16, cfg=RGB)
        return jnp.mean((img - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_of))
    l0 = None
    for it in range(8):
        loss, grads = grad_fn(p)
        if l0 is None:
            l0 = float(loss)
        p, state = opt.step(p, grads, state)
    assert float(loss) < 0.5 * l0, (l0, float(loss))


# ---------------------------------------------------------------------------
# PLT integrator gradients: the parameters a PLT researcher optimizes
# (roughgrating inv_period / height), FD-checked through the full two-phase
# sample-solve integrator (reference traverse params roughgrating.cpp:278-316)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def grating_tiny():
    from mitsuba3_plt_tpu.scene.presets import grating_scene

    # moderate coherence so the per-lobe Gaussian falloff is smooth enough
    # for finite differences to resolve
    scene, _ = grating_scene(16, 16, coherence=5e3)
    return scene


def _plt_loss(scene, key, delta, spp=8):
    from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator

    integ = PLTIntegrator(max_depth=3, rr_depth=8)
    params = traverse(scene)
    v = params[key]
    idx = (1, 0) if v.ndim == 2 else (1,)
    sc = params.update({key: v.at[idx].add(delta)})
    img = render_differentiable(sc, integ.sample, seed=0, spp=spp, cfg=RGB)
    return jnp.mean(img)


@pytest.mark.parametrize("key,eps", [
    ("materials.grt_inv_period", 1e-3),
    ("materials.grt_height", 1e-4),
])
def test_plt_grating_grad_vs_fd(grating_tiny, key, eps):
    """Detached-sampling gradients (the reference records its sample phase
    under suspended grad, plt.py:50-171, so sampled lobe directions carry no
    derivative there either). FD additionally sees the sampled-direction
    movement, so we check finiteness, non-zero and sign agreement — the
    estimator-level comparison the reference's own AD supports."""
    ad = float(jax.grad(lambda d: _plt_loss(grating_tiny, key, d))(0.0))
    assert np.isfinite(ad) and ad != 0.0
    f_p = float(_plt_loss(grating_tiny, key, eps))
    f_m = float(_plt_loss(grating_tiny, key, -eps))
    fd = (f_p - f_m) / (2 * eps)
    assert np.sign(fd) == np.sign(ad), (key, fd, ad)
    assert abs(ad) < 50 * abs(fd) + 1e-3, (key, fd, ad)


def test_render_forward_vs_fd(tiny_scene):
    """Forward-mode (jvp) derivative image vs central differences, for an
    albedo tangent and an emitter-radiance tangent (reference
    render_forward, common.py:112-186)."""
    from mitsuba3_plt_tpu.ad.render import render_forward

    integ = PathIntegrator(max_depth=3, rr_depth=8)
    params = traverse(tiny_scene)
    for key in ("materials.base_color", "emitters.radiance"):
        p0 = params[key]
        tangent = jnp.ones_like(p0)
        img, dimg = render_forward(
            tiny_scene, integ.sample, {key: tangent}, seed=3, spp=16,
            cfg=RGB,
        )
        eps = 0.02
        ip = render_differentiable(
            params.update({key: p0 + eps * tangent}), integ.sample,
            seed=3, spp=16, cfg=RGB,
        )
        im = render_differentiable(
            params.update({key: p0 - eps * tangent}), integ.sample,
            seed=3, spp=16, cfg=RGB,
        )
        fd = (np.asarray(ip) - np.asarray(im)) / (2 * eps)
        d = np.asarray(dimg)
        # same seed => matched paths; jvp of the same program ~= its FD
        denom = max(np.abs(fd).mean(), 1e-6)
        assert np.abs(d - fd).mean() / denom < 0.05, (
            key, np.abs(d - fd).mean(), denom
        )
        assert np.abs(d).mean() > 1e-4  # non-trivial derivative
