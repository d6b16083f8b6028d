"""Pallas fused slab compositor — the whole front-to-back slab scan as ONE
kernel.

The XLA sequential compositor (render/slabmarch.py `body`) dispatches ~D
tiny programs per frame and round-trips the [hi, wi] color/transmittance
carry through HBM between slabs; measured 17.8 ms @512²×128 on v5e while
the underlying compute is ~0.05 ms of MXU matmuls + ~0.3 ms of VPU
classification and the streamed inputs are ~0.15 ms of HBM traffic. This
kernel keeps the carry RESIDENT IN VMEM across the whole slab loop:

  grid = (frame row-tiles, D slabs), slab axis innermost; the output block
  (premultiplied rgb + transmittance, [4, TH, wi]) maps only to the tile
  index, so Pallas keeps it in VMEM while k sweeps 0..D-1 (the standard
  revisited-accumulator pattern). Per step it streams one volume slab and
  that slab's two interpolation matrices from HBM (~0.5 MB), runs the two
  resampling matmuls on the MXU, classifies via the gather-free
  control-point telescoping form (utils/tfn.classify_controls — control
  scalars live in SMEM, per-channel FMA accumulators), applies opacity
  correction + coverage/clip masks, and blends.

Semantics are exactly slabmarch's unshaded/unshadowed scan body (reference
formulas: opacity correction raytracing.h:166-170, front-to-back blend
writePixelColor raytracing.h:196-207, early termination via the
transmittance mask); parity is tested against the XLA path in
tests/test_slab_pallas.py (interpret mode on CPU, real kernel on TPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instantvnr_tpu.config import NEARLY_ONE


def _kernel(kc: int,
            vol_ref,      # (1, ay, ax)  VMEM
            my_ref,       # (1, TH, ay)  VMEM
            mx_ref,       # (1, wi, ax)  VMEM
            covy_ref,     # (1, TH)      VMEM  f32 0/1
            covx_ref,     # (1, wi)      VMEM  f32 0/1 (slab keep folded in)
            corr_ref,     # (TH, wi)     VMEM
            ctrl_ref,     # (kc, 8)      SMEM  rows: [x, r, g, b, a, lo, hi, 0]
            out_ref):     # (4, TH, wi)  VMEM  premult rgb + transmittance
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        zero = jnp.zeros(out_ref.shape[1:], jnp.float32)
        out_ref[0] = zero
        out_ref[1] = zero
        out_ref[2] = zero
        out_ref[3] = zero + 1.0

    slab = vol_ref[0]
    tmp = jnp.dot(my_ref[0], slab, preferred_element_type=jnp.float32)
    vals = jax.lax.dot_general(
        tmp, mx_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TH, wi]

    # gather-free classification (classify_controls telescoping form),
    # channels kept as four separate [TH, wi] planes
    lo = ctrl_ref[0, 5]
    hi = ctrl_ref[0, 6]
    v = (jnp.clip(vals, lo, hi) - lo) / jnp.maximum(hi - lo, 1e-20)
    acc_r = jnp.full(v.shape, ctrl_ref[0, 1], jnp.float32)
    acc_g = jnp.full(v.shape, ctrl_ref[0, 2], jnp.float32)
    acc_b = jnp.full(v.shape, ctrl_ref[0, 3], jnp.float32)
    acc_a = jnp.full(v.shape, ctrl_ref[0, 4], jnp.float32)
    for i in range(kc - 1):
        denom = jnp.maximum(ctrl_ref[i + 1, 0] - ctrl_ref[i, 0], 1e-12)
        t = jnp.clip((v - ctrl_ref[i, 0]) / denom, 0.0, 1.0)
        acc_r += t * (ctrl_ref[i + 1, 1] - ctrl_ref[i, 1])
        acc_g += t * (ctrl_ref[i + 1, 2] - ctrl_ref[i, 2])
        acc_b += t * (ctrl_ref[i + 1, 3] - ctrl_ref[i, 3])
        acc_a += t * (ctrl_ref[i + 1, 4] - ctrl_ref[i, 4])

    # opacity correction + coverage/clip/occupancy + early-termination mask
    trans = out_ref[3]
    alpha = 1.0 - jnp.power(jnp.maximum(1.0 - acc_a, 0.0), corr_ref[:])
    mask = (covy_ref[0][:, None] * covx_ref[0][None, :]
            * (trans > 1.0 - NEARLY_ONE).astype(jnp.float32))
    alpha = alpha * mask

    w = trans * alpha
    out_ref[0] += w * acc_r
    out_ref[1] += w * acc_g
    out_ref[2] += w * acc_b
    out_ref[3] = trans * (1.0 - alpha)


def pick_tile_h(hi: int, wi: int, max_tile: int = 256) -> int | None:
    """Largest divisor of hi that is ≤ max_tile (VMEM sizing); None when no
    tiling keeps the working set sane (caller falls back to the XLA scan)."""
    for th in range(min(hi, max_tile), 0, -1):
        if hi % th == 0:
            return th
    return None


@partial(jax.jit, static_argnums=(7, 8))
def composite_slabs(vol, my_all, mx_all, covy, covx, corr_exp, ctrl,
                    tile_h: int, interpret: bool = False):
    """Fused compositor over precomputed per-slab resampling state.

    vol      [D, ay, ax]   permuted volume
    my_all   [D, hi, ay]   per-slab row interpolation matrices
    mx_all   [D, wi, ax]   per-slab column interpolation matrices
    covy     [D, hi]  f32  row coverage & clip (0/1)
    covx     [D, wi]  f32  column coverage & clip & per-slab keep (0/1)
    corr_exp [hi, wi]      opacity-correction exponent (per-pixel Δt)
    ctrl     [Kc, 8]  f32  rows [x, r, g, b, a, range_lo, range_hi, 0]
    returns  (color [hi, wi, 3] premultiplied, alpha [hi, wi])
    """
    d, ay, ax = vol.shape
    hi = my_all.shape[1]
    wi = mx_all.shape[1]
    kc = ctrl.shape[0]
    n_tiles = hi // tile_h

    out = pl.pallas_call(
        partial(_kernel, kc),
        grid=(n_tiles, d),
        in_specs=[
            pl.BlockSpec((1, ay, ax), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((1, tile_h, ay), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, wi, ax), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((1, tile_h), lambda i, k: (k, i)),
            pl.BlockSpec((1, wi), lambda i, k: (k, 0)),
            pl.BlockSpec((tile_h, wi), lambda i, k: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_h, wi), lambda i, k: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, hi, wi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(vol, my_all, mx_all, covy, covx, corr_exp, ctrl)

    return jnp.moveaxis(out[:3], 0, -1), 1.0 - out[3]


def pack_controls(tf) -> jnp.ndarray:
    """TransferFunction control points → the [Kc, 8] SMEM layout."""
    kc = tf.ctrl_x.shape[0]
    rng = jnp.stack([jnp.broadcast_to(tf.range_lo, (kc,)),
                     jnp.broadcast_to(tf.range_hi, (kc,))], axis=-1)
    return jnp.concatenate(
        [tf.ctrl_x[:, None], tf.ctrl_rgba, rng,
         jnp.zeros((kc, 1), jnp.float32)], axis=-1)
