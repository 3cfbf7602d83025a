"""Differentiable rendering: parameter traversal, optimizers, gradient ops.

The reference reaches gradients through Dr.Jit's tape + path-replay
integrators (src/python/python/ad/); here the whole renderer is a pure JAX
function of the scene pytree, so reverse-mode AD is native — `traverse`
exposes the differentiable-parameter view (mi.traverse twin) and
`render_grad` wires jax.grad with rematerialization over the bounce scan.
"""
from .params import SceneParameters, traverse
from .optimizers import SGD, Adam
from .render import render_forward, render_grad, render_loss_grad

__all__ = [
    "SceneParameters", "traverse", "SGD", "Adam", "render_forward",
    "render_grad", "render_loss_grad",
]
