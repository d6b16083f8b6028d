"""Adam + ExponentialDecay optimizer, matching tcnn semantics.

Reference config (`example-model.json:2-15`): Adam(lr=5e-3, β1=.9, β2=.999,
ε=1e-15, l2_reg=1e-6) wrapped in ExponentialDecay(start=2000, interval=1000,
base=0.99). tcnn details mirrored here:

- ε is added to sqrt(v̂) in the denominator (not inside the sqrt)
- bias correction by (1−β1^t), (1−β2^t)
- l2_reg is additive weight decay applied to the MLP matrix weights only
  (tcnn applies m_l2_reg to matrix params, not the hash grid)
- the decay wrapper multiplies the nested lr by base^((step−start)/interval)
  once step > start (staircase).

Implemented directly (not optax) so the update is one fused jitted pytree map
with donated buffers — and so the Pallas fused-training kernel can reuse the
exact same math.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from instantvnr_tpu.config import OptimizerConfig


class AdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    mu: dict  # first moment, same pytree as params
    nu: dict  # second moment


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.copy, zeros))


def lr_at_step(cfg: OptimizerConfig, step: jnp.ndarray) -> jnp.ndarray:
    """ExponentialDecay schedule (tcnn ExponentialDecayOptimizer) — only
    when the config actually wraps one; a bare {"otype": "Adam"} runs at a
    constant learning rate like tcnn's plain Adam (the decay_* defaults in
    OptimizerConfig describe the wrapper, not Adam itself)."""
    if cfg.otype.lower() != "exponentialdecay":
        return jnp.float32(cfg.learning_rate)
    past = jnp.maximum(step - cfg.decay_start, 0)
    n_decays = (past // cfg.decay_interval).astype(jnp.float32)
    return cfg.learning_rate * jnp.power(jnp.float32(cfg.decay_base), n_decays)


def adam_update(cfg: OptimizerConfig, params, grads, state: AdamState,
                l2_mask=None):
    """One Adam step. `l2_mask`: pytree of bools — True where l2_reg applies
    (the MLP weights). Returns (new_params, new_state)."""
    step = state.step + 1
    lr = lr_at_step(cfg, step)
    t = step.astype(jnp.float32)
    c1 = 1.0 - jnp.power(jnp.float32(cfg.beta1), t)
    c2 = 1.0 - jnp.power(jnp.float32(cfg.beta2), t)

    if l2_mask is None:
        l2_mask = jax.tree.map(lambda _: False, params)

    def upd(p, g, m, v, use_l2):
        g = g.astype(jnp.float32)
        if use_l2 and cfg.l2_reg > 0:
            g = g + cfg.l2_reg * p.astype(jnp.float32)
        m = cfg.beta1 * m + (1.0 - cfg.beta1) * g
        v = cfg.beta2 * v + (1.0 - cfg.beta2) * g * g
        m_hat = m / c1
        v_hat = v / c2
        new_p = p.astype(jnp.float32) - lr * m_hat / (jnp.sqrt(v_hat) + cfg.epsilon)
        return new_p.astype(p.dtype), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_mask = treedef.flatten_up_to(l2_mask)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, msk in zip(flat_p, flat_g, flat_m, flat_v, flat_mask):
        np_, nm, nv = upd(p, g, m, v, msk)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    return (
        jax.tree.unflatten(treedef, new_p),
        AdamState(step=step, mu=jax.tree.unflatten(treedef, new_m),
                  nu=jax.tree.unflatten(treedef, new_v)),
    )


def mlp_l2_mask(params) -> dict:
    """l2_reg applies to MLP matrices, not the hash table."""
    return {
        "table": False,
        "mlp": [True for _ in params["mlp"]],
    }
