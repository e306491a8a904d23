"""SGD optimizer matching the reference's training recipe.

Reference (unet.cpp:246-277, train.cpp:566,763): SGD, nesterov, momentum
0.99, two parameter groups — weight decay 3e-5 for parameters with
ndim > 1 and no bias in the name, 0 otherwise; poly learning-rate decay
``lr * (1 - epoch/total)^0.9``; global gradient-norm clip at 12 applied
after dividing accumulated gradients by batch size (train.cpp:759-763).

Implemented as a pure pytree transform (jit/pjit friendly): state is one
momentum buffer per parameter plus a step count.  Torch SGD semantics:

    g = g + wd * p            (decay group)
    buf = m * buf + g         (first step: buf = g)
    g = g + m * buf           (nesterov)
    p = p - lr * g
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SGDConfig:
    momentum: float = 0.99
    nesterov: bool = True
    weight_decay: float = 3e-5
    clip_norm: float = 12.0


def decay_mask(params: dict) -> dict:
    """True for the weight-decay group (ndim > 1, not a bias) —
    unet.cpp:252-259."""
    return {
        k: (v.ndim > 1 and not k.endswith(".b")) for k, v in params.items()
    }


def init_opt_state(params: dict) -> dict:
    return {
        "momentum": {k: jnp.zeros_like(v) for k, v in params.items()},
        "step": jnp.zeros((), jnp.int32),
    }


def clip_by_global_norm(grads: dict, max_norm: float) -> dict:
    """torch clip_grad_norm_ semantics (train.cpp:763)."""
    total = jnp.sqrt(
        sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in grads.values())
    )
    coef = max_norm / (total + 1e-6)
    coef = jnp.minimum(coef, 1.0)
    return {k: g * coef for k, g in grads.items()}


def sgd_step(
    params: dict,
    grads: dict,
    opt_state: dict,
    lr,
    config: SGDConfig = SGDConfig(),
) -> tuple[dict, dict]:
    """One optimizer step (gradients already averaged over the batch)."""
    grads = clip_by_global_norm(grads, config.clip_norm)
    mask = decay_mask(params)
    first = opt_state["step"] == 0
    new_momentum = {}
    new_params = {}
    m = config.momentum
    for k, p in params.items():
        g = grads[k].astype(jnp.float32)
        if mask[k] and config.weight_decay:
            g = g + config.weight_decay * p.astype(jnp.float32)
        buf = jnp.where(first, g, m * opt_state["momentum"][k] + g)
        step_g = g + m * buf if config.nesterov else buf
        new_momentum[k] = buf
        new_params[k] = (p.astype(jnp.float32) - lr * step_g).astype(p.dtype)
    return new_params, {"momentum": new_momentum, "step": opt_state["step"] + 1}


def poly_lr(base_lr: float, epoch, total_epochs: int, power: float = 0.9):
    """lr * (1 - e/E)^0.9 (train.cpp:566)."""
    frac = 1.0 - jnp.asarray(epoch, jnp.float32) / float(total_epochs)
    return base_lr * jnp.power(jnp.maximum(frac, 0.0), power)
