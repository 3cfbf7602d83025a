"""On-device optimizers: SGD (+momentum) and Adam with per-parameter learning
rates and masked updates.

Functional twins of the reference Optimizer/SGD/Adam
(src/python/python/ad/optimizers.py:6-319) as pure (state, grads) -> (state,
params) steps over dicts of arrays — jit/psum friendly (grads arrive already
all-reduced in the sharded path).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SGD:
    lr: float = 0.1
    momentum: float = 0.0
    lr_per_param: Dict[str, float] = dataclasses.field(default_factory=dict)

    def init(self, params: Dict[str, Any]):
        if self.momentum == 0.0:
            return {}
        return {k: jnp.zeros_like(v) for k, v in params.items()}

    def step(self, params, grads, state, masks: Optional[dict] = None):
        new_params, new_state = {}, {}
        for k, p in params.items():
            g = grads.get(k)
            if g is None:
                new_params[k] = p
                if k in state:
                    new_state[k] = state[k]
                continue
            lr = self.lr_per_param.get(k, self.lr)
            if self.momentum != 0.0:
                v = self.momentum * state[k] + g
                new_state[k] = v
                upd = lr * v
            else:
                upd = lr * g
            if masks and k in masks:
                upd = jnp.where(masks[k], upd, 0.0)
            new_params[k] = p - upd
        return new_params, new_state


@dataclasses.dataclass
class Adam:
    lr: float = 0.02
    beta_1: float = 0.9
    beta_2: float = 0.999
    epsilon: float = 1e-8
    lr_per_param: Dict[str, float] = dataclasses.field(default_factory=dict)
    # reference's `uniform` flag: scalar second moment per parameter (UniformAdam)
    uniform: bool = False

    def init(self, params: Dict[str, Any]):
        return {
            "t": jnp.zeros((), jnp.int32),
            "m": {k: jnp.zeros_like(v) for k, v in params.items()},
            "v": {k: jnp.zeros_like(v) for k, v in params.items()},
        }

    def step(self, params, grads, state, masks: Optional[dict] = None):
        t = state["t"] + 1
        tf = t.astype(jnp.float32)
        new_m, new_v, new_params = {}, {}, {}
        for k, p in params.items():
            g = grads.get(k)
            if g is None:
                new_params[k] = p
                new_m[k] = state["m"][k]
                new_v[k] = state["v"][k]
                continue
            lr = self.lr_per_param.get(k, self.lr)
            m = self.beta_1 * state["m"][k] + (1 - self.beta_1) * g
            v = self.beta_2 * state["v"][k] + (1 - self.beta_2) * g * g
            if self.uniform:
                v = jnp.broadcast_to(jnp.max(v), v.shape)
            m_hat = m / (1 - self.beta_1 ** tf)
            v_hat = v / (1 - self.beta_2 ** tf)
            upd = lr * m_hat / (jnp.sqrt(v_hat) + self.epsilon)
            if masks and k in masks:
                upd = jnp.where(masks[k], upd, 0.0)
            new_params[k] = p - upd
            new_m[k] = m
            new_v[k] = v
        return new_params, {"t": t, "m": new_m, "v": new_v}
