"""Tensor parallelism over hash-grid levels (new design; no reference
counterpart — the CUDA code replicates everything on one GPU).

Motivation: the hash table dominates parameter memory (2^19×8 entries ×
levels ≈ tens of MB and growing with log2_hashmap_size); the MLP is tiny.
The natural TP axis is the LEVEL dimension:

  - each "model" shard owns a contiguous slice of levels (its sub-table,
    padded to a common entry count so the stacked [n_model, E, F] array
    shards evenly over the axis)
  - encode is fully local: a shard gathers only from its own levels
  - the first MLP layer is row-parallel: W1 is split by input-feature rows
    ([n_model, (L/n)·F, width]); each shard contracts its local features
    and ONE psum over "model" reconstructs the full first-layer activation
  - remaining layers are replicated (identical on every model shard)

Communication per step: one [B, width] psum in forward, and its transpose
(a broadcast — free) in backward. Table and W1 gradients stay local; the
hash-table gradient never crosses the model axis at all.

Combined with the data axis this gives a (data × model) mesh where sample
batches ride "data" and the table rides "model".
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.models.optimizer import AdamState, adam_update
from instantvnr_tpu.models.trainer import TrainState
from instantvnr_tpu.ops.hash_encoding import (
    hash_encode_traced,
    hash_encode_traced_splitgrad,
    level_param_arrays,
)
from instantvnr_tpu.ops.mlp import _activation
from instantvnr_tpu.ops.trilinear import sample_volume_tex


def tp_layout(field: NeuralField, n_model: int):
    """Static layout: levels per shard, padded entries per shard."""
    spec = field.spec
    assert spec.n_levels % n_model == 0, (spec.n_levels, n_model)
    lps = spec.n_levels // n_model
    shard_entries = [
        sum(spec.level_sizes[s * lps : (s + 1) * lps]) for s in range(n_model)
    ]
    return lps, max(shard_entries)


def split_params_tp(field: NeuralField, params: dict, n_model: int) -> dict:
    """Convert single-device params → TP params pytree.

    Returns {"table": [n_model, E_max, F], "w1": [n_model, lps·F, W],
             "mlp_rest": [...replicated...]}.
    """
    spec = field.spec
    lps, e_max = tp_layout(field, n_model)
    f = spec.n_features
    tables, w1s = [], []
    w1_full = params["mlp"][0]  # [L·F, W]
    for s in range(n_model):
        lo = spec.level_offsets[s * lps]
        hi = spec.level_offsets[(s + 1) * lps]
        t = params["table"][lo:hi]
        pad = e_max - (hi - lo)
        if pad:
            t = jnp.concatenate([t, jnp.zeros((pad, f), t.dtype)], 0)
        tables.append(t)
        w1s.append(w1_full[s * lps * f : (s + 1) * lps * f])
    return {
        "table": jnp.stack(tables),
        "w1": jnp.stack(w1s),
        "mlp_rest": [jnp.asarray(w) for w in params["mlp"][1:]],
    }


def merge_params_tp(field: NeuralField, tp_params: dict, n_model: int) -> dict:
    """Inverse of split_params_tp (drops padding)."""
    spec = field.spec
    lps, _ = tp_layout(field, n_model)
    tables = []
    for s in range(n_model):
        lo = spec.level_offsets[s * lps]
        hi = spec.level_offsets[(s + 1) * lps]
        tables.append(tp_params["table"][s, : hi - lo])
    w1 = jnp.concatenate(list(tp_params["w1"]), axis=0)
    return {
        "table": jnp.concatenate(tables, 0),
        "mlp": [w1] + list(tp_params["mlp_rest"]),
    }


def shard_level_params(field: NeuralField, n_model: int) -> dict:
    """Per-shard level parameter arrays, stacked [n_model, lps], with offsets
    rebased into each shard's padded local table."""
    spec = field.spec
    lps, _ = tp_layout(field, n_model)
    lp = level_param_arrays(spec)
    out = {k: np.array(lp[k]).reshape(n_model, lps) for k in lp}
    # rebase offsets to local tables
    offs = out["offset"]
    for s in range(n_model):
        offs[s] -= spec.level_offsets[s * lps]
    out["offset"] = offs
    return {k: jnp.asarray(v) for k, v in out.items()}


def tp_apply(field: NeuralField, tp_local: dict, level_params_local: dict,
             coords: jnp.ndarray, axis_name: str = "model",
             level_caps: tuple | None = None) -> jnp.ndarray:
    """Forward pass INSIDE shard_map: local encode → row-parallel W1 →
    psum(axis) → replicated MLP tail. coords [B,3] → [B,1].

    level_caps (static per-local-level size bounds) routes the table
    gradient through the per-level-scatter backward
    (hash_encode_traced_splitgrad); None keeps plain autodiff — fine for
    inference-only uses."""
    cfg = field.cfg
    lps = field.spec.n_levels // jax.lax.axis_size(axis_name)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    precision = (None if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    if level_caps is not None:
        feats = hash_encode_traced_splitgrad(
            tp_local["table"], coords, level_params_local, level_caps,
            field.spec.n_features, compute_dtype=compute_dtype)
    else:
        feats = hash_encode_traced(
            tp_local["table"], coords, level_params_local, lps,
            field.spec.n_features, compute_dtype=compute_dtype,
        )  # [B, lps·F]
    partial_h = jnp.dot(feats, tp_local["w1"].astype(compute_dtype),
                        preferred_element_type=jnp.float32,
                        precision=precision)
    h = jax.lax.psum(partial_h, axis_name)  # the one TP collective
    act = _activation(cfg.network.activation)
    out_act = _activation(cfg.network.output_activation)
    h = act(h).astype(compute_dtype)
    for w in tp_local["mlp_rest"][:-1]:
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=precision)
        h = act(h).astype(compute_dtype)
    y = jnp.dot(h, tp_local["mlp_rest"][-1].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=precision)
    return out_act(y)


def make_tp_train_step(field: NeuralField, mesh: Mesh, batch: int,
                       n_steps: int = 1):
    """(data × model)-sharded train step.

    state.params must be the TP pytree (split_params_tp), with "table"/"w1"
    sharded over "model" and everything else replicated. Gradients: table/W1
    stay shard-local; MLP-tail grads are identical across model shards (the
    forward is replicated after the psum); all grads are pmean'd over "data".
    """
    from instantvnr_tpu.models.trainer import loss_terms

    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]
    assert batch % n_data == 0
    local_batch = batch // n_data
    level_params = shard_level_params(field, n_model)  # [n_model, lps] each
    kind = field.cfg.loss.otype.lower()
    spec = field.spec
    lps, _ = tp_layout(field, n_model)
    # static per-local-level scatter bounds (max across shards) for the
    # per-level-scatter backward
    level_caps = tuple(
        max(spec.level_sizes[s * lps + l] for s in range(n_model))
        for l in range(lps))

    def local_loss(tp_local, lp_local, coords, targets):
        pred = tp_apply(field, tp_local, lp_local, coords,
                        level_caps=level_caps)
        # same loss zoo as every other train path (raises on unknown kinds
        # instead of silently training L2)
        return jnp.mean(loss_terms(kind, pred, targets))

    def one_step(state: TrainState, volume, lp_local):
        d_idx = jax.lax.axis_index("data")
        key, k_local = jax.random.split(state.key)
        # batch must be identical across the MODEL axis (they cooperate on
        # the same samples) but distinct across the DATA axis
        k_batch = jax.random.fold_in(k_local, d_idx)
        coords = jax.random.uniform(k_batch, (local_batch, 3), jnp.float32)
        targets = sample_volume_tex(volume, coords)[:, None]

        loss, grads = jax.value_and_grad(local_loss)(
            state.params, lp_local, coords, targets
        )
        from instantvnr_tpu.parallel.train import fused_pmean

        grads, loss = fused_pmean((grads, loss), "data")
        l2_mask = {"table": False, "w1": True,
                   "mlp_rest": [True] * len(state.params["mlp_rest"])}
        params, opt = adam_update(field.cfg.optimizer, state.params, grads,
                                  state.opt, l2_mask=l2_mask)
        return TrainState(params=params, opt=opt, key=key, loss=loss)

    tp_tree_spec = {"table": P("model"), "w1": P("model"),
                    "mlp_rest": [P()] * (field.cfg.network.n_hidden_layers)}
    lp_spec = {k: P("model") for k in level_params}

    def state_spec(s: TrainState) -> TrainState:
        return TrainState(
            params=tp_tree_spec,
            opt=AdamState(step=P(), mu=tp_tree_spec, nu=tp_tree_spec),
            key=P(), loss=P(),
        )

    in_specs = (state_spec(None), P(), lp_spec)
    out_specs = state_spec(None)

    # Only the model-sharded leaves carry a leading singleton shard axis
    # inside shard_map; replicated leaves (mlp_rest, scalars) do not.
    def unstack_params(p):
        return {"table": p["table"][0], "w1": p["w1"][0],
                "mlp_rest": p["mlp_rest"]}

    def restack_params(p):
        return {"table": p["table"][None], "w1": p["w1"][None],
                "mlp_rest": p["mlp_rest"]}

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def sharded_steps(state, volume, lp_local):
        local = TrainState(
            params=unstack_params(state.params),
            opt=AdamState(step=state.opt.step,
                          mu=unstack_params(state.opt.mu),
                          nu=unstack_params(state.opt.nu)),
            key=state.key, loss=state.loss,
        )
        lp = jax.tree.map(lambda x: x[0], lp_local)

        def body(st, _):
            return one_step(st, volume, lp), None

        local, _ = jax.lax.scan(body, local, None, length=n_steps)

        return TrainState(
            params=restack_params(local.params),
            opt=AdamState(step=local.opt.step,
                          mu=restack_params(local.opt.mu),
                          nu=restack_params(local.opt.nu)),
            key=local.key, loss=local.loss,
        )

    jitted = jax.jit(sharded_steps, donate_argnums=(0,))

    def step_fn(state: TrainState, volume: jnp.ndarray) -> TrainState:
        return jitted(state, volume, level_params)

    return step_fn


def create_tp_train_state(key: jax.Array, field: NeuralField, mesh: Mesh
                          ) -> TrainState:
    """Init single-device params, split for TP, and shard onto the mesh."""
    from instantvnr_tpu.models.trainer import create_train_state

    n_model = mesh.shape["model"]
    base = create_train_state(key, field)
    tp_params = split_params_tp(field, base.params, n_model)
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), tp_params)
    state = TrainState(
        params=tp_params,
        opt=AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                      nu=jax.tree.map(jnp.copy, zeros)),
        key=base.key,
        loss=jnp.float32(0.0),
    )
    tp_sharding = {
        "table": NamedSharding(mesh, P("model")),
        "w1": NamedSharding(mesh, P("model")),
        "mlp_rest": [NamedSharding(mesh, P())] * len(tp_params["mlp_rest"]),
    }

    def place(tree):
        return jax.tree.map(
            jax.device_put, tree, tp_sharding,
            is_leaf=lambda x: isinstance(x, jnp.ndarray),
        )

    rep = NamedSharding(mesh, P())
    return TrainState(
        params=place(state.params),
        opt=AdamState(
            step=jax.device_put(state.opt.step, rep),
            mu=place(state.opt.mu),
            nu=place(state.opt.nu),
        ),
        key=jax.device_put(state.key, rep),
        loss=jax.device_put(state.loss, rep),
    )
