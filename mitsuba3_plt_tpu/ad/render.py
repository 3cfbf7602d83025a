"""Gradient rendering: reverse-mode AD through the render megakernel.

The reference needs a custom AD op + path-replay machinery
(src/python/python/util.py:333-508 _RenderOp, ad/integrators/prb.py) because
Dr.Jit's tape cannot differentiate through its recorded loops cheaply. In
JAX the renderer is a pure function of the scene pytree, so
`jax.grad(loss(render(scene)))` is the whole story; what we add:

  * `jax.checkpoint` over the per-pass render so the bounce-scan
    intermediates are rematerialized instead of stored (the memory role of
    path-replay backprop: O(1) activations in depth, recompute in backward —
    and the counter-based sampler replays identical random numbers by
    construction, core/rng.py);
  * detached-sampling semantics: sample DECISIONS (which lobe/direction) are
    non-differentiable by construction (integer/bool ops), matching prb.py's
    detached strategy.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..core.rng import Sampler
from ..integrators.common import sample_rays
from ..librender.film import ImageBlock, FILTER_BOX
from .params import SceneParameters, traverse


def _render_pass_fn(integrator_sample, width, height, spp_pass, cfg, rfilter):
    @partial(jax.checkpoint, static_argnums=())
    def render_pass(scene, seed, pass_idx):
        sampler = Sampler.create(0, width * height * spp_pass)
        sampler = dataclasses.replace(
            sampler, seed=jnp.asarray(seed, jnp.uint32)
        ).fork_traced(pass_idx)
        ray, uv, wavelengths, wl_weight = sample_rays(
            scene, sampler, width, height, spp_pass, cfg
        )
        values, valid = integrator_sample(scene, sampler, ray, wavelengths, cfg)
        if cfg.spectral:
            from ..core import spectrum as spec

            xyz = spec.spectrum_to_xyz(values, wavelengths, wl_weight)
            values = spec.xyz_to_srgb(xyz)
        block = ImageBlock.create(width, height, values.shape[-1], rfilter)
        return block.put(uv, values, valid).data

    return render_pass


def render_differentiable(scene, integrator_sample, seed=0, spp=4,
                          cfg: RenderConfig = RenderConfig(),
                          spp_per_pass=None, rfilter=FILTER_BOX):
    """Differentiable render (traced; call under jit/grad). Multi-pass spp
    accumulates inside the trace so gradients flow through every pass."""
    width, height = scene.sensor.resolution
    if spp_per_pass is None:
        spp_per_pass = max(1, min(spp, (1 << 19) // (width * height) or 1))
    n_pass = (spp + spp_per_pass - 1) // spp_per_pass
    rp = _render_pass_fn(integrator_sample, width, height, spp_per_pass, cfg,
                         rfilter)
    data = None
    for p in range(n_pass):
        d = rp(scene, seed, p)
        data = d if data is None else data + d
    block = ImageBlock(
        data=data, width=width, height=height,
        n_channels=data.shape[-1] - 1, rfilter=rfilter,
    )
    return block.develop()


def render_loss_grad(scene, integrator_sample, loss_fn: Callable,
                     param_keys, seed=0, spp=4,
                     cfg: RenderConfig = RenderConfig(),
                     geometry_boundary: bool = False,
                     boundary_samples: int = 1 << 14, **kw):
    """(loss, grads) for the dotted-key scene parameters in `param_keys`.

    loss_fn: image [H, W, C] -> scalar. Returns (loss, {key: grad}).

    geometry_boundary: add the silhouette boundary term (ad/projective.py)
    to any `geo.tri_p*` gradients — without it those gradients carry only
    the interior (shading) term and are silently wrong for translations
    (the gap the reference fills with PSIntegrator projective sampling).
    """
    params = traverse(scene)
    p0 = {k: params[k] for k in param_keys}

    def f(p):
        sc = params.update(p)
        img = render_differentiable(
            sc, integrator_sample, seed=seed, spp=spp, cfg=cfg, **kw
        )
        return loss_fn(img), img

    (loss, img), grads = jax.value_and_grad(f, has_aux=True)(p0)

    if geometry_boundary and any(k.startswith("geo.tri_p") for k in grads):
        from .projective import (
            area_nee_boundary_grad_guided as area_nee_boundary_grad,
            nee_boundary_grad, primary_boundary_grad,
        )

        grad_img = jax.grad(loss_fn)(img)
        cots = primary_boundary_grad(
            scene, integrator_sample, grad_img, key=seed + 0x9E37,
            n_samples=boundary_samples, cfg=cfg,
        )
        # shadow-silhouette term (point-like emitters; zero otherwise)
        cots_nee = nee_boundary_grad(
            scene, integrator_sample, grad_img, key=seed + 0x85EB,
            n_samples=boundary_samples, cfg=cfg,
        )
        # penumbra term (area emitters; zero otherwise)
        cots_area = area_nee_boundary_grad(
            scene, grad_img, key=seed + 0x27D4,
            n_samples=boundary_samples, cfg=cfg,
        )
        for k in grads:
            if k in cots:
                grads[k] = grads[k] + cots[k] + cots_nee[k] + cots_area[k]
    return loss, grads


def render_forward(scene, integrator_sample, param_tangents: Dict[str, Any],
                   seed=0, spp=4, cfg: RenderConfig = RenderConfig(), **kw):
    """FORWARD-mode derivative image (the reference's render_forward,
    src/python/python/ad/integrators/common.py:112-186): push parameter
    tangents through the render, returning (image, d_image) with
    d_image = sum_k dI/d(param_k) . tangent_k, shape [H, W, C].

    One jvp sweep costs ~one extra render regardless of the number of
    perturbed parameters — the tool for single-direction sensitivity maps
    and optimizer line searches, where reverse mode would need a full vjp
    per image pixel."""
    params = traverse(scene)
    p0 = {k: params[k] for k in param_tangents}
    tangents = {
        k: jnp.broadcast_to(
            jnp.asarray(v, jnp.float32), jnp.shape(params[k])
        ).astype(jnp.result_type(params[k]))
        for k, v in param_tangents.items()
    }

    def f(p):
        sc = params.update(p)
        return render_differentiable(
            sc, integrator_sample, seed=seed, spp=spp, cfg=cfg, **kw
        )

    return jax.jvp(f, (p0,), (tangents,))


def render_grad(scene, integrator_sample, param_keys, grad_image, seed=0,
                spp=4, cfg: RenderConfig = RenderConfig(), **kw):
    """Adjoint render (reference render_backward, common.py:623): pull the
    image-space gradient `grad_image` back to scene parameters."""
    params = traverse(scene)
    p0 = {k: params[k] for k in param_keys}

    def f(p):
        sc = params.update(p)
        return render_differentiable(
            sc, integrator_sample, seed=seed, spp=spp, cfg=cfg, **kw
        )

    _, vjp = jax.vjp(f, p0)
    (grads,) = vjp(grad_image)
    return grads
