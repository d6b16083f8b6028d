"""Expert parallelism: per-subdomain expert fields.

The reference carries a commented-out sketch of exactly this — multiple
networks each owning a spatial block (core/network.cu:584-603). On a TPU
mesh it becomes the cleanest parallelism in the framework: the volume is
partitioned into z-slabs, each "expert" device owns a COMPLETE small field
(hash table + MLP) for its slab, and

  - training: each expert samples ONLY its slab (plus a ghost margin for
    seam continuity) and updates only its own parameters — zero
    communication per step (gradients never leave the device);
  - inference/decode: queries route by position; the decode path is
    naturally block-structured, so each expert decodes its own slab and
    the full volume is just the sharded concatenation;
  - capacity scales linearly with devices (n_experts × table size) — the
    terascale answer when even a hash table per host is too small.

Composes with the data axis: mesh ("data", "expert") runs DP within each
expert's slab. Here the 1-D ("expert",) form is implemented (the DP layer
already exists independently).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instantvnr_tpu.models.network import NeuralField, network_apply
from instantvnr_tpu.models.optimizer import adam_update, mlp_l2_mask
from instantvnr_tpu.models.trainer import TrainState, make_loss_fn
from instantvnr_tpu.ops.trilinear import sample_volume_tex


def make_expert_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), ("expert",))


def create_ep_train_state(key: jax.Array, field: NeuralField, mesh: Mesh
                          ) -> TrainState:
    """Stacked per-expert states: every leaf gains a leading [n_experts]
    axis sharded over "expert" (each expert starts from a different init)."""
    n_exp = mesh.shape["expert"]
    keys = jax.random.split(key, n_exp)

    def init_one(k):
        from instantvnr_tpu.models.trainer import create_train_state

        return create_train_state(k, field)

    states = [init_one(k) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    shard = NamedSharding(mesh, P("expert"))
    return jax.tree.map(lambda x: jax.device_put(x, shard), stacked)


def make_ep_train_step(field: NeuralField, mesh: Mesh, batch: int,
                       n_steps: int = 1, ghost: float = 0.02):
    """Per-expert training step: expert e samples z ∈ [e/n − g, (e+1)/n + g]
    of the GLOBAL volume, maps to its local [0,1]³ frame, and trains its own
    field. No collectives at all.

    The local frame spans the slab PLUS the ghost margin
    (z' = (z − (e/n − g)) / (1/n + 2g)), so ghost samples keep distinct
    local coordinates. Clipping them onto the slab boundary plane instead
    would hand the same coordinate conflicting targets from a 2g-thick band
    and bias each expert's seam value toward its neighbor's side."""
    n_exp = mesh.shape["expert"]
    loss_fn = make_loss_fn(field)
    span = 1.0 / n_exp + 2.0 * ghost  # local frame's global extent

    def one_step(state: TrainState, volume):
        e = jax.lax.axis_index("expert")
        key, k_batch = jax.random.split(state.key)
        u = jax.random.uniform(k_batch, (batch, 3), jnp.float32)
        # global z SAMPLING range: slab + ghost, clamped to the volume
        z_lo = jnp.maximum(e / n_exp - ghost, 0.0)
        z_hi = jnp.minimum((e + 1) / n_exp + ghost, 1.0)
        coords_g = u.at[:, 2].set(z_lo + u[:, 2] * (z_hi - z_lo))
        targets = sample_volume_tex(volume, coords_g)[:, None]
        # local frame: UNCLAMPED affine over slab+ghost (expert-uniform)
        coords_l = coords_g.at[:, 2].set(
            (coords_g[:, 2] - (e / n_exp - ghost)) / span
        )
        loss, grads = jax.value_and_grad(loss_fn)(state.params, coords_l,
                                                  targets)
        params, opt = adam_update(field.cfg.optimizer, state.params, grads,
                                  state.opt, l2_mask=mlp_l2_mask(state.params))
        return TrainState(params=params, opt=opt, key=key, loss=loss)

    @partial(shard_map, mesh=mesh, in_specs=(P("expert"), P()),
             out_specs=P("expert"), check_vma=False)
    def sharded(state, volume):
        local = jax.tree.map(lambda x: x[0], state)

        def body(st, _):
            return one_step(st, volume), None

        local, _ = jax.lax.scan(body, local, None, length=n_steps)
        return jax.tree.map(lambda x: x[None], local)

    return jax.jit(sharded, donate_argnums=(0,))


def make_ep_decode(field: NeuralField, mesh: Mesh, dims,
                   ghost: float = 0.02, slab: int = 16):
    """Decode the full [dz, dy, dx] volume: each expert decodes its z-slab
    with its own parameters; the output is sharded over "expert" along z
    (one all_gather materializes it replicated if needed).

    ghost must match the train step's margin — the local frame spans
    slab+ghost, so the slab interior zi ∈ (0,1) sits at
    z' = (zi + g·n) / (1 + 2g·n). Decoded in z-chunks via lax.map (the
    decode_volume pattern) — one flat network_apply over dz_loc·dy·dx
    samples would allocate the padded-gather temp that chunking exists to
    bound (network_apply_chunked docstring)."""
    dx, dy, dz = (int(d) for d in dims)
    n_exp = mesh.shape["expert"]
    if dz % n_exp != 0:
        raise ValueError(
            f"EP decode needs dz divisible by the expert count: dz={dz}, "
            f"experts={n_exp}. Pad the volume in z or change the mesh.")
    dz_loc = dz // n_exp
    gn = ghost * n_exp
    slab = min(slab, dz_loc)
    n_slabs = (dz_loc + slab - 1) // slab

    @partial(shard_map, mesh=mesh, in_specs=(P("expert"),),
             out_specs=P("expert"), check_vma=False)
    def decode(state):
        params = jax.tree.map(lambda x: x[0], state).params

        def one_blob(i):
            zi = ((i * slab + jnp.arange(slab, dtype=jnp.float32) + 0.5)
                  / dz_loc)
            z, y, x = jnp.meshgrid(
                (zi + gn) / (1.0 + 2.0 * gn),
                (jnp.arange(dy, dtype=jnp.float32) + 0.5) / dy,
                (jnp.arange(dx, dtype=jnp.float32) + 0.5) / dx,
                indexing="ij",
            )
            coords = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
            return network_apply(params, coords, field).reshape(slab, dy, dx)

        slabs = jax.lax.map(one_blob, jnp.arange(n_slabs))
        return slabs.reshape(n_slabs * slab, dy, dx)[:dz_loc]

    return jax.jit(decode)
