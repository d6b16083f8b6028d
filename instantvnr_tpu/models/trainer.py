"""Training loop: the TPU counterpart of `NeuralVolume::Impl::train`
(`core/network.cu:231-259`) + tcnn `Trainer::training_step`.

One jitted `train_step` fuses: RNG batch generation → ground-truth trilinear
gather → hash-encode fwd → MLP fwd → L1 loss → backward (MLP bwd + hash
scatter-add) → Adam. `train_steps` runs K steps inside one `lax.scan` so the
whole chunk (the reference trains in chunks of 10, `batch_trainer.cpp:97`)
is a single device program with zero host round-trips.

The macrocell online update from training batches (reference
`macrocell.cu:236-241`) lives in the facade (api.py `_update_macrocell_online`)
on its own deterministic sample stream.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instantvnr_tpu.config import DEFAULT_TRAIN_BATCH
from instantvnr_tpu.models.network import NeuralField, network_apply
from instantvnr_tpu.models.optimizer import (
    AdamState,
    adam_init,
    adam_update,
    mlp_l2_mask,
)


class TrainState(NamedTuple):
    params: dict
    opt: AdamState
    key: jax.Array
    loss: jnp.ndarray  # last step's loss (fp32 scalar)


def create_train_state(key: jax.Array, field: NeuralField) -> TrainState:
    k_init, k_train = jax.random.split(key)
    params = field.init(k_init)
    return TrainState(
        params=params,
        opt=adam_init(params),
        key=k_train,
        loss=jnp.float32(0.0),
    )


def loss_terms(kind: str, pred, targets):
    """Per-sample loss residuals — the ONE implementation of the tcnn loss
    zoo (tcnn create_loss), shared by every train path (single-device, DP,
    TP) so configs cannot silently optimize different objectives."""
    if kind == "l1":
        return jnp.abs(pred - targets)
    if kind == "l2":
        return (pred - targets) ** 2
    if kind == "relativel2":
        # tcnn treats the prediction-dependent denominator as a CONSTANT
        # in the backward (its gradient is 2(pred−target)/(pred²+ε)) —
        # differentiate only the numerator
        return ((pred - targets) ** 2
                / (jax.lax.stop_gradient(pred) ** 2 + 1e-2))
    raise ValueError(f"unsupported loss: {kind}")


def make_loss_fn(field: NeuralField):
    kind = field.cfg.loss.otype.lower()

    def loss_fn(params, coords, targets):
        pred = network_apply(params, coords, field)
        return jnp.mean(loss_terms(kind, pred, targets))

    return loss_fn


def _one_step(field: NeuralField, volume: jnp.ndarray, batch: int,
              state: TrainState):
    """A single fused sample→forward→backward→Adam step."""
    from instantvnr_tpu.data.sampler import sample_static

    key, k_batch = jax.random.split(state.key)
    # the ONE StaticSampler::sample implementation (data/sampler.py) —
    # inlined by jit, bit-identical to uniform + sample_volume_tex
    coords, targets = sample_static(volume, k_batch, batch,
                                    jnp.zeros((3,), jnp.float32),
                                    jnp.ones((3,), jnp.float32))

    loss_fn = make_loss_fn(field)
    loss, grads = jax.value_and_grad(loss_fn)(state.params, coords, targets)
    params, opt = adam_update(
        field.cfg.optimizer, state.params, grads, state.opt,
        l2_mask=mlp_l2_mask(state.params),
    )
    return TrainState(params=params, opt=opt, key=key, loss=loss)


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(2,))
def train_step(field: NeuralField, volume: jnp.ndarray, state: TrainState,
               batch: int = DEFAULT_TRAIN_BATCH) -> TrainState:
    return _one_step(field, volume, batch, state)


@partial(jax.jit, static_argnums=(0, 3, 4), donate_argnums=(2,))
def train_steps(field: NeuralField, volume: jnp.ndarray, state: TrainState,
                n_steps: int, batch: int = DEFAULT_TRAIN_BATCH) -> TrainState:
    """K steps fused into one lax.scan — the reference's chunk-of-10 loop
    (`batch_trainer.cpp:97-107`) as a single device program. The carried
    state already holds the last step's loss."""

    def body(st, _):
        return _one_step(field, volume, batch, st), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


def _one_step_source(field: NeuralField, sampler, batch: int,
                     state: TrainState):
    """`_one_step` with an ANALYTIC (no ground-truth texture) source: the
    batch values come from the sampler's field function instead of a
    volume gather — the reference's OpenVKL training modes
    (neural_sampler.cpp:714-958), with the CPU vklComputeSample replaced
    by in-jit evaluation (data/procedural.AnalyticSampler)."""
    key, k_batch = jax.random.split(state.key)
    coords, targets = sampler.sample(k_batch, batch)
    loss_fn = make_loss_fn(field)
    loss, grads = jax.value_and_grad(loss_fn)(state.params, coords, targets)
    params, opt = adam_update(
        field.cfg.optimizer, state.params, grads, state.opt,
        l2_mask=mlp_l2_mask(state.params),
    )
    return TrainState(params=params, opt=opt, key=key, loss=loss)


@partial(jax.jit, static_argnums=(0, 1, 3, 4), donate_argnums=(2,))
def train_steps_source(field: NeuralField, sampler, state: TrainState,
                       n_steps: int, batch: int = DEFAULT_TRAIN_BATCH
                       ) -> TrainState:
    """`train_steps` over a static/hashable analytic sampler — the entire
    chunk (RNG, field evaluation, fwd, bwd, Adam × K) is one device
    program; no volume exists anywhere."""

    def body(st, _):
        return _one_step_source(field, sampler, batch, st), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def train_step_hostbatch(field: NeuralField, state: TrainState,
                         coords: jnp.ndarray, targets: jnp.ndarray
                         ) -> TrainState:
    """One step on a HOST-provided batch — the out-of-core path (reference
    OutOfCoreSampler::sample → cudaMemcpyAsync → training_step,
    neural_sampler.cpp:1066-1120). RNG key still advances so online
    macrocell refreshes stay deterministic."""
    key, _ = jax.random.split(state.key)
    loss_fn = make_loss_fn(field)
    loss, grads = jax.value_and_grad(loss_fn)(state.params, coords, targets)
    params, opt = adam_update(
        field.cfg.optimizer, state.params, grads, state.opt,
        l2_mask=mlp_l2_mask(state.params),
    )
    return TrainState(params=params, opt=opt, key=key, loss=loss)


def train_out_of_core(field: NeuralField, sampler, state: TrainState,
                      n_steps: int, batch: int) -> TrainState:
    """Pipelined out-of-core training: the sampler (a host-side
    OutOfCoreSampler) produces batch k+1 while the device runs step k —
    jax's async dispatch gives the overlap for free (the analog of the
    reference's async H2D in the hot loop, SURVEY §3.1)."""
    next_batch = sampler.sample(batch)
    for i in range(n_steps):
        coords, targets = next_batch
        # dispatch the device step (async), then do host I/O for the next —
        # skipping the prefetch after the FINAL step (it would be discarded,
        # wasting one full disk read per call)
        state = train_step_hostbatch(
            field, state, jnp.asarray(coords), jnp.asarray(targets)
        )
        if i + 1 < n_steps:
            next_batch = sampler.sample(batch)
    return state


@partial(jax.jit, static_argnums=(0, 3))
def test_loss(field: NeuralField, volume: jnp.ndarray, state: TrainState,
              batch: int = DEFAULT_TRAIN_BATCH) -> jnp.ndarray:
    """Fresh-sample test loss (`NeuralVolume::Impl::test`, network.cu:261-288).

    Always L1, regardless of the training loss — the reference hardcodes
    `abs(groundtruth − inferred)` in its test kernel (network.cu:283), so
    reported test curves stay comparable across loss configs."""
    from instantvnr_tpu.ops.trilinear import sample_volume_tex

    key = jax.random.fold_in(state.key, 0x7357)
    coords = jax.random.uniform(key, (batch, 3), jnp.float32)
    targets = sample_volume_tex(volume, coords)[:, None]
    pred = network_apply(state.params, coords, field)
    return jnp.mean(jnp.abs(pred - targets))
