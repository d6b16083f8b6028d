"""Pallas fused MLP — the whole decoder as ONE kernel.

The tcnn "fully fused MLP" insight transposed to TPU (SURVEY.md §7 hard
parts): the 64-wide weight matrices are tiny (~40 KB total in bf16), so the
entire n_hidden+1 matmul chain runs with ALL weights resident in VMEM while
the batch streams through in tiles — activations never touch HBM between
layers. Per grid step: load one [TB, 64] feature tile, run the unrolled
matmul+ReLU chain on the MXU with fp32 accumulation, store [TB, n_out].

This is the hash-free half of the reference's fused pipeline (the encode
half is gather-bound and not expressible on v5e — NOTES_ROUND1.md); it
slots in behind the same interface as ops.mlp.mlp_apply and is verified
allclose against it. The encode→MLP seam still fuses at the XLA level
(the gather output feeds the kernel without a round trip to host).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantvnr_tpu.config import NetworkConfig


def _kernel(x_ref, *refs, n_layers: int, act: str):
    w_refs = refs[:-1]
    o_ref = refs[-1]
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            if act == "relu":
                h = jnp.maximum(h, 0.0)
            elif act == "sine":
                h = jnp.sin(h)
            h = h.astype(jnp.bfloat16)
    o_ref[...] = h.astype(o_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_mlp_apply(params: list, x: jnp.ndarray, cfg: NetworkConfig,
                    tile: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """Apply the MLP as one Pallas kernel. x [B, n_in] → [B, n_out_padded→
    sliced to n_out] float32. B must be a multiple of `tile` (pad first).

    The output layer is computed at lane width 128 (n_out zero-padded like
    tcnn pads to 16) and sliced back — sub-128 lane writes waste the store
    either way, and padding keeps the layout tiled.

    Differentiable: the forward runs the Pallas kernel; the backward is the
    plain XLA matmul chain (custom_vjp below), so training with
    mlp_impl="pallas" works — only inference takes the fused path's win.
    """
    b, n_in = x.shape
    n_out = params[-1].shape[1]
    assert b % tile == 0, (b, tile)
    act = cfg.activation.lower()
    n_layers = len(params)

    # pad the output matrix to 128 lanes for tiled stores
    w_pad = list(params[:-1])
    w_last = params[-1]
    pad_to = 128
    if n_out < pad_to:
        w_last = jnp.concatenate(
            [w_last, jnp.zeros((w_last.shape[0], pad_to - n_out),
                               w_last.dtype)], axis=1)
    w_pad.append(w_last)

    grid = (b // tile,)
    in_specs = [
        pl.BlockSpec((tile, n_in), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in w_pad
    ]
    out = pl.pallas_call(
        partial(_kernel, n_layers=n_layers, act=act),
        out_shape=jax.ShapeDtypeStruct((b, pad_to), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, pad_to), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, *w_pad)
    return out[:, :n_out]


def _fwd(params, x, cfg, tile, interpret):
    return fused_mlp_apply(params, x, cfg, tile, interpret), (params, x)


def _bwd(cfg, tile, interpret, res, g):
    from instantvnr_tpu.ops.mlp import mlp_apply

    params, x = res
    _, vjp = jax.vjp(lambda p, xx: mlp_apply(p, xx, cfg), params, x)
    return vjp(g)


fused_mlp_apply.defvjp(_fwd, _bwd)
