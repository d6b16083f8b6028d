"""Pallas fused MLP — the whole decoder as ONE kernel.

The tcnn "fully fused MLP" insight transposed to TPU (SURVEY.md §7 hard
parts; reference `core/networks/tcnn_network.h:223-271` is the parity bar):
the 64-wide weight matrices are tiny (~40 KB total in bf16), so the entire
n_hidden+1 matmul chain runs with ALL weights resident in VMEM while the
batch streams through in tiles — activations never touch HBM between
layers. Per grid step: load one [TB, 64] feature tile, run the unrolled
matmul+activation chain on the MXU with fp32 accumulation, store the
[TB, n_out] result (and, under differentiation, the per-layer
pre-activations for a recompute-free backward).

This is the hash-free half of the reference's fused pipeline (the encode
half is gather-bound and not expressible on v5e — NOTES_ROUND1.md); it
slots in behind the same interface as ops.mlp.mlp_apply and is verified
allclose against it (tests/test_pallas_mlp.py).

Training path: `custom_vjp` whose forward runs the kernel once with
residual outputs (the pre-activations z_k per layer), and whose backward
is a pure matmul chain over those residuals — NO forward recompute
(tcnn's Trainer reuses forward activations the same way).

Arbitrary batch sizes: inputs are zero-padded up to the tile multiple and
the output sliced back, so callers never fall back off the kernel for
alignment reasons.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantvnr_tpu.config import NetworkConfig

_LANES = 128  # output lane padding (tcnn pads n_out to 16; TPU wants 128)


def _apply_act(h, act: str):
    if act == "relu":
        return jnp.maximum(h, 0.0)
    if act == "sine":
        return jnp.sin(h)
    if act == "squareplus":
        return 0.5 * (h + jnp.sqrt(h * h + 4.0))
    if act in ("none", "linear", "identity"):
        return h
    raise ValueError(f"unsupported activation: {act}")


def _act_grad(z, act: str):
    """d act(z) / dz from the saved pre-activation z."""
    if act == "relu":
        return (z > 0).astype(z.dtype)
    if act == "sine":
        return jnp.cos(z)
    if act == "squareplus":
        return 0.5 * (1.0 + z * jax.lax.rsqrt(z * z + 4.0))
    if act in ("none", "linear", "identity"):
        return jnp.ones_like(z)
    raise ValueError(f"unsupported activation: {act}")


def _kernel(x_ref, *refs, n_layers: int, act: str, out_act: str,
            save_residuals: bool):
    if save_residuals:
        w_refs = refs[:-2]
        o_ref, z_ref = refs[-2], refs[-1]
    else:
        w_refs = refs[:-1]
        o_ref = refs[-1]
    h = x_ref[...].astype(jnp.bfloat16)
    for i in range(n_layers):
        h = jnp.dot(h, w_refs[i][...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            if save_residuals:
                z_ref[i, :, :] = h.astype(z_ref.dtype)
            h = _apply_act(h, act).astype(jnp.bfloat16)
    if not save_residuals:
        # inference path applies the output activation in-kernel; the
        # training forward keeps the pre-activation (the backward needs it)
        h = _apply_act(h, out_act)
    o_ref[...] = h.astype(o_ref.dtype)


def _pallas_forward(params, x, cfg: NetworkConfig, tile: int,
                    interpret: bool, save_residuals: bool):
    """Run the fused kernel on an ALIGNED batch (b % tile == 0).

    Returns (z_out [B, n_out] pre-output-activation if save_residuals else
    activated output, zs [n_layers-1, B, W] pre-activations or None).
    """
    b, n_in = x.shape
    n_out = params[-1].shape[1]
    assert b % tile == 0, (b, tile)
    act = cfg.activation.lower()
    out_act = cfg.output_activation.lower()
    n_layers = len(params)
    width = params[0].shape[1]

    # pad the output matrix to 128 lanes for tiled stores
    w_pad = list(params[:-1])
    w_last = params[-1]
    if n_out < _LANES:
        w_last = jnp.concatenate(
            [w_last, jnp.zeros((w_last.shape[0], _LANES - n_out),
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
    out_shape = [jax.ShapeDtypeStruct((b, max(n_out, _LANES)), jnp.float32)]
    out_specs = [pl.BlockSpec((tile, max(n_out, _LANES)), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if save_residuals:
        # f32 residuals: the backward keeps the cotangent chain in f32
        # (quantizing z or g to bf16 costs ~5 dB converged PSNR vs the XLA
        # autodiff baseline — measured on v5e, 250 steps @2^14: 46.2 vs
        # 53.8 dB). The [n_layers-1, tile, W] f32 block is ~1 MB at the
        # default tile=1024 — far under the VMEM budget.
        out_shape.append(
            jax.ShapeDtypeStruct((n_layers - 1, b, width), jnp.float32))
        out_specs.append(
            pl.BlockSpec((n_layers - 1, tile, width), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        partial(_kernel, n_layers=n_layers, act=act, out_act=out_act,
                save_residuals=save_residuals),
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(x, *w_pad)
    y = outs[0][:, :n_out]
    return (y, outs[1]) if save_residuals else (y, None)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_mlp(params, x, cfg: NetworkConfig, tile: int, interpret: bool):
    y, _ = _pallas_forward(params, x, cfg, tile, interpret,
                           save_residuals=False)
    return y


def _residual_safe_tile(tile: int, n_layers: int, width: int, n_in: int,
                        budget_bytes: int = 12 << 20) -> int:
    """Largest divisor of `tile` (multiple of 8, or tile itself) whose
    save_residuals working set fits the scoped-VMEM budget.

    The differentiation path adds an [n_layers-1, tile, W] f32 residual
    block; at tile ≳ 3000 (5-layer, W=64) the double-buffered working set
    overflows the ~16 MB VMEM scope that the bf16-residual version fit.
    The forward-only path is unaffected (callers may pass large tiles)."""

    def fits(t: int) -> bool:
        # double-buffered f32 blocks: input tile, padded output tile,
        # residual stack (weights are small and grid-invariant)
        per_step = t * n_in + t * _LANES + max(n_layers - 1, 0) * t * width
        return 4 * 2 * per_step <= budget_bytes

    t = tile
    while t > 8 and (not fits(t) or tile % t):
        t -= 8
    return max(t, 8)


def _fwd(params, x, cfg, tile, interpret):
    if len(params) == 1:
        # single matmul: nothing to save; plain XLA backward is optimal
        out_act = cfg.output_activation.lower()
        if out_act in ("none", "linear", "identity"):
            y, _ = _pallas_forward(params, x, cfg, tile, interpret, False)
            return y, (params, x, None, y)
        # nontrivial out_act: the backward needs the pre-activation z_out,
        # which the no-residual kernel doesn't emit — one XLA matmul
        # provides both z_out and (via _apply_act) the output, so skip the
        # kernel entirely rather than discarding its result
        z_out = jnp.dot(x.astype(jnp.bfloat16),
                        params[0].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        y = _apply_act(z_out, out_act)
        return y, (params, x, None, z_out)
    tile = _residual_safe_tile(tile, len(params), params[0].shape[1],
                               x.shape[1])
    z_out, zs = _pallas_forward(params, x, cfg, tile, interpret, True)
    y = _apply_act(z_out, cfg.output_activation.lower())
    return y, (params, x, zs, z_out)


def _bwd(cfg, tile, interpret, res, g):
    """Matmul-only backward from the saved pre-activations (no forward
    recompute). Numerics mirror XLA's autodiff of the bf16 forward:
    the FORWARD operands (h, w) stay at their bf16-rounded values, but the
    cotangent chain is never quantized below f32 — quantizing g to bf16
    per layer costs ~5 dB converged PSNR (measured, v5e 250 steps)."""
    params, x, zs, z_out = res
    act = cfg.activation.lower()
    out_act = cfg.output_activation.lower()
    n_layers = len(params)

    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    g_z = g.astype(f32)
    if out_act not in ("none", "linear", "identity"):
        g_z = g_z * _act_grad(z_out, out_act)

    # hidden activations recovered elementwise from the pre-activations,
    # rounded through bf16 exactly as the forward fed them to the MXU
    hs = [x.astype(jnp.bfloat16).astype(f32)]
    for k in range(n_layers - 1):
        hs.append(_apply_act(zs[k], act).astype(jnp.bfloat16).astype(f32))

    d_params = [None] * n_layers
    for k in range(n_layers - 1, -1, -1):
        d_params[k] = jnp.dot(hs[k].T, g_z,
                              preferred_element_type=f32, precision=hp
                              ).astype(params[k].dtype)
        g_h = jnp.dot(g_z, params[k].T.astype(jnp.bfloat16).astype(f32),
                      preferred_element_type=f32, precision=hp)
        if k > 0:
            g_z = g_h * _act_grad(zs[k - 1], act)
    return d_params, g_h.astype(x.dtype)


_fused_mlp.defvjp(_fwd, _bwd)


def fused_mlp_apply(params: list, x: jnp.ndarray, cfg: NetworkConfig,
                    tile: int = 1024, interpret: bool = False) -> jnp.ndarray:
    """Apply the MLP as one Pallas kernel. x [B, n_in] → [B, n_out] float32.

    Any batch size: B is zero-padded to the next multiple of `tile` and the
    result sliced back (the pad/slice differentiates transparently). The
    backward reuses the forward's saved pre-activations (see _bwd).
    """
    b = x.shape[0]
    tile = min(tile, _next_multiple(b, 8))
    rem = b % tile
    if rem:
        x = jnp.concatenate(
            [x, jnp.zeros((tile - rem, x.shape[1]), x.dtype)], axis=0)
    y = _fused_mlp(params, x, cfg, tile, interpret)
    return y[:b] if rem else y


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
