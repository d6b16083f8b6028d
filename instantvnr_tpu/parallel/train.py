"""Sharded training steps.

Data parallelism (the TPU replacement for the reference's intra-GPU batch,
SURVEY.md §2.9): each device draws its own slice of the 2^16-sample batch
with a per-device RNG stream (key folded with axis_index — the multi-device
generalization of the reference's seed-1337 determinism), computes local
grads, and psum-means them before a replicated Adam step. Params and the
ground-truth volume are replicated; XLA overlaps the gradient all-reduce with
the tail of the backward pass (small params → one fused psum).

Design note: gradients of the hash table are sparse (scatter-adds from each
batch) but are carried dense here so the psum is a single fused collective.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.models.optimizer import adam_update, mlp_l2_mask
from instantvnr_tpu.models.trainer import TrainState, make_loss_fn
from instantvnr_tpu.ops.trilinear import sample_volume_tex


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host TrainState replicated across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def fused_pmean(tree, axis_name: str):
    """pmean a whole pytree as ONE collective: flatten every leaf into a
    single f32 vector, one psum, unflatten.

    jax.lax.pmean over a pytree emits one psum EQUATION PER LEAF; XLA's
    all-reduce combiner usually merges small ones at compile time, but that
    is a heuristic (size thresholds), not a guarantee — this makes the
    single-collective property structural, so the multichip dryrun can
    assert it (parallel/inspect.py). The concatenate/split copies fuse
    into the surrounding elementwise work.
    """
    leaves, treedef = jax.tree.flatten(tree)
    flat = jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves])
    flat = jax.lax.pmean(flat, axis_name)
    out, off = [], 0
    for l in leaves:
        n = l.size
        out.append(flat[off:off + n].reshape(l.shape).astype(l.dtype))
        off += n
    return jax.tree.unflatten(treedef, out)


def make_dp_train_step(field: NeuralField, mesh: Mesh, batch: int,
                       n_steps: int = 1):
    """Build a jitted data-parallel train step (n_steps fused via scan).

    The returned fn maps (state, volume) → state with everything replicated;
    inside, the batch is implicitly sharded: each of the D data shards
    generates batch/D samples from its own RNG stream.
    """
    n_data = mesh.shape["data"]
    assert batch % n_data == 0, (batch, n_data)
    local_batch = batch // n_data
    loss_fn = make_loss_fn(field)

    def one_step(state: TrainState, volume: jnp.ndarray) -> TrainState:
        idx = jax.lax.axis_index("data")
        key, k_local = jax.random.split(state.key)
        k_batch = jax.random.fold_in(k_local, idx)
        coords = jax.random.uniform(k_batch, (local_batch, 3), jnp.float32)
        targets = sample_volume_tex(volume, coords)[:, None]

        loss, grads = jax.value_and_grad(loss_fn)(state.params, coords, targets)
        # gradient all-reduce: ONE fused mean-psum over the data axis
        grads, loss = fused_pmean((grads, loss), "data")
        params, opt = adam_update(
            field.cfg.optimizer, state.params, grads, state.opt,
            l2_mask=mlp_l2_mask(state.params),
        )
        return TrainState(params=params, opt=opt, key=key, loss=loss)

    spec_rep = P()  # everything replicated; sharding is over the RNG streams

    @partial(shard_map, mesh=mesh, in_specs=(spec_rep, spec_rep),
             out_specs=spec_rep, check_vma=False)
    def sharded_steps(state, volume):
        def body(st, _):
            st = one_step(st, volume)
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state

    return jax.jit(sharded_steps, donate_argnums=(0,))


def make_dp_hostbatch_step(field: NeuralField, mesh: Mesh):
    """Data-parallel step on HOST-provided batches — the multi-host
    out-of-core path: every host streams its own blocks (OutOfCoreSampler),
    contributes its local shard of the global batch, and gradients meet in
    one psum (SURVEY §2.9 per-host brick streaming; reference
    neural_sampler.cpp:1066-1120 feeds the same way on one GPU)."""
    loss_fn = make_loss_fn(field)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P("data"), P("data")),
             out_specs=P(), check_vma=False)
    def step(state: TrainState, coords, targets):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, coords,
                                                  targets)
        grads, loss = fused_pmean((grads, loss), "data")
        key, _ = jax.random.split(state.key)  # keep RNG streams advancing
        params, opt = adam_update(
            field.cfg.optimizer, state.params, grads, state.opt,
            l2_mask=mlp_l2_mask(state.params),
        )
        return TrainState(params=params, opt=opt, key=key, loss=loss)

    return jax.jit(step, donate_argnums=(0,))


def shard_host_batch(mesh: Mesh, coords, targets):
    """Assemble the global [B] batch from THIS process's local arrays
    (jax.make_array_from_process_local_data): on a multi-host mesh each host
    contributes its slice; single-host meshes just shard over local devices."""
    sh = NamedSharding(mesh, P("data"))
    c = jax.make_array_from_process_local_data(sh, coords)
    t = jax.make_array_from_process_local_data(sh, targets)
    return c, t
