"""PRB integrator: primal equivalence with the detached path tracer and
path-replay gradients vs finite differences (reference
ad/integrators/prb.py:64-251; FD scheme per test_ad_integrators.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba3_plt_tpu.ad import traverse
from mitsuba3_plt_tpu.ad.render import render_differentiable, render_loss_grad
from mitsuba3_plt_tpu.config import RGB
from mitsuba3_plt_tpu.integrators.path import PathIntegrator
from mitsuba3_plt_tpu.integrators.prb import PRBIntegrator
from mitsuba3_plt_tpu.scene.presets import cornell_box


@pytest.fixture(scope="module")
def tiny_scene():
    scene, _ = cornell_box(12, 12)
    return scene


def test_prb_primal_matches_path(tiny_scene):
    """The PRB forward value is the detached estimator — it must agree with
    the plain path tracer at the same seed."""
    path = PathIntegrator(max_depth=3, rr_depth=8)
    prb = PRBIntegrator(max_depth=3, rr_depth=8)
    img_p = render_differentiable(tiny_scene, path.sample, seed=0, spp=8,
                                  cfg=RGB)
    img_r = render_differentiable(tiny_scene, prb.sample, seed=0, spp=8,
                                  cfg=RGB)
    np.testing.assert_allclose(
        np.asarray(img_r), np.asarray(img_p), rtol=2e-4, atol=2e-4
    )


def test_prb_albedo_grad_vs_fd(tiny_scene):
    """Indirect-illumination albedo gradient through the replay term."""
    prb = PRBIntegrator(max_depth=3, rr_depth=8)
    key = "materials.base_color"
    loss_fn = lambda img: jnp.mean(img)
    loss, grads = render_loss_grad(
        tiny_scene, prb.sample, loss_fn, [key], seed=0, spp=16, cfg=RGB
    )
    g = np.asarray(grads[key])
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    params = traverse(tiny_scene)
    bc = params[key]
    eps = 1e-2

    def run(delta):
        sc = params.update({key: bc.at[0, 0].add(delta)})
        img = render_differentiable(sc, prb.sample, seed=0, spp=16, cfg=RGB)
        return float(jnp.mean(img))

    fd = (run(eps) - run(-eps)) / (2 * eps)
    ad = float(g[0, 0])
    assert abs(fd - ad) < 0.05 * max(abs(fd), abs(ad), 1e-3), (fd, ad)


def test_prb_emitter_grad_vs_fd(tiny_scene):
    prb = PRBIntegrator(max_depth=2, rr_depth=8)
    key = "emitters.radiance"
    loss, grads = render_loss_grad(
        tiny_scene, prb.sample, lambda img: jnp.mean(img), [key], seed=0,
        spp=8, cfg=RGB,
    )
    g = np.asarray(grads[key])
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    params = traverse(tiny_scene)
    rad = params[key]
    eps = 1e-2

    def run(delta):
        sc = params.update({key: rad.at[0, 0].add(delta)})
        img = render_differentiable(sc, prb.sample, seed=0, spp=8, cfg=RGB)
        return float(jnp.mean(img))

    fd = (run(eps) - run(-eps)) / (2 * eps)
    ad = float(g[0, 0])
    assert abs(fd - ad) < 0.05 * max(abs(fd), abs(ad), 1e-3), (fd, ad)


def test_prb_grad_agrees_with_remat(tiny_scene):
    """PRB (detached sampling) and remat-AD estimate the same derivative;
    with a shared seed they should agree closely for albedo params."""
    path = PathIntegrator(max_depth=3, rr_depth=8)
    prb = PRBIntegrator(max_depth=3, rr_depth=8)
    key = "materials.base_color"
    loss_fn = lambda img: jnp.mean(img)
    _, g_remat = render_loss_grad(
        tiny_scene, path.sample, loss_fn, [key], seed=0, spp=32, cfg=RGB
    )
    _, g_prb = render_loss_grad(
        tiny_scene, prb.sample, loss_fn, [key], seed=0, spp=32, cfg=RGB
    )
    a = np.asarray(g_remat[key])
    b = np.asarray(g_prb[key])
    denom = max(np.abs(a).max(), np.abs(b).max())
    assert np.abs(a - b).max() < 0.1 * denom, (a, b)
