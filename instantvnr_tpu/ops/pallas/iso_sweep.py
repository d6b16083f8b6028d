"""Pallas fused first-hit isosurface sweep — the whole slab scan as ONE
kernel (the isosurface analog of ops/pallas/slab_composite.py).

The XLA sweep (render/isosurf.py slab_iso_render `body`) carries ten
[hi, wi] planes (previous slab values/coverage/gradients + first-hit
state) through HBM between slabs. This kernel keeps all of them RESIDENT
IN VMEM across the slab loop: grid = (row tiles, D slabs), slab axis
innermost, the [10, TH, wi] state block mapped only to the tile index.
Per step it streams one [4, ay, ax] field block (value + 3 gradient
components), resamples with the banded interpolation matmuls (MXU),
detects each pixel-ray's FIRST isovalue crossing between consecutive
slabs, and lerps crossing depth + gradient (VPU).

Crossing semantics are exactly slab_iso_render's scan body; the shading
that consumes (found, hit_z, hit_g) stays outside (once per frame).
Parity: tests/test_slab_pallas.py (interpret on CPU, real kernel on TPU).

State plane layout (out_ref):
  0 found    1 hit_z    2:5 hit_g    5 prev_v    6 prev_ok    7:10 prev_g
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(fields_ref,  # (1, 4, ay, ax) VMEM — value + 3 grad components
            my_ref,      # (1, TH, ay)
            mx_ref,      # (1, wi, ax)
            covy_ref,    # (1, TH, 1)  f32 0/1
            covx_ref,    # (1, 1, wi)  f32 0/1 (slab keep/in_front/z-clip
                         #             folded)
            iso_ref,     # (1,) SMEM
            out_ref):    # (10, TH, wi) — layout above
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        zero = jnp.zeros(out_ref.shape[1:], jnp.float32)
        for c in range(10):
            out_ref[c] = zero

    my = my_ref[0]
    mx = mx_ref[0]
    rs = []
    for c in range(4):
        tmp = jnp.dot(my, fields_ref[0, c],
                      preferred_element_type=jnp.float32)
        rs.append(jax.lax.dot_general(
            tmp, mx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))  # [TH, wi]
    vals = rs[0]

    iso = iso_ref[0]
    cov = covy_ref[0] * covx_ref[0]  # (TH,1)×(1,wi) → [TH, wi] f32 0/1
    found = out_ref[0]
    prev_v = out_ref[5]
    prev_ok = out_ref[6]

    denom = vals - prev_v
    frac = jnp.where(jnp.abs(denom) > 1e-12, (iso - prev_v) / denom, 0.5)
    frac = jnp.clip(frac, 0.0, 1.0)
    sign = jnp.where((prev_v - iso) * (vals - iso) <= 0.0, 1.0, 0.0)
    newly = prev_ok * cov * sign * (1.0 - found)
    z_cross = (k.astype(jnp.float32) - 0.5) + frac  # z_{k-1} = k − 0.5
    out_ref[1] = out_ref[1] + newly * (z_cross - out_ref[1])
    for c in range(3):
        g_cross = out_ref[7 + c] + frac * (rs[1 + c] - out_ref[7 + c])
        out_ref[2 + c] = out_ref[2 + c] + newly * (g_cross - out_ref[2 + c])
    out_ref[0] = jnp.maximum(found, newly)
    out_ref[5] = vals
    out_ref[6] = cov
    for c in range(3):
        out_ref[7 + c] = rs[1 + c]


@partial(jax.jit, static_argnums=(6, 7))
def iso_sweep(fields, my_all, mx_all, covy, covx, iso,
              tile_h: int, interpret: bool = False):
    """Fused first-hit sweep over precomputed per-slab resampling state.

    fields [D, 4, ay, ax]  permuted value + world-gradient slabs
    my_all [D, hi, ay] / mx_all [D, wi, ax]  interpolation matrices
    covy   [D, hi] f32 0/1  row coverage & clip
    covx   [D, wi] f32 0/1  column coverage & clip & slab keep
    iso    [] traced isovalue
    Returns (found [hi,wi] f32 0/1, hit_z [hi,wi], hit_g [hi,wi,3]).
    """
    d = fields.shape[0]
    ay, ax = fields.shape[2], fields.shape[3]
    hi = my_all.shape[1]
    wi = mx_all.shape[1]
    n_tiles = hi // tile_h

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles, d),
        in_specs=[
            pl.BlockSpec((1, 4, ay, ax), lambda i, k: (k, 0, 0, 0)),
            pl.BlockSpec((1, tile_h, ay), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, wi, ax), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((1, tile_h, 1), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, 1, wi), lambda i, k: (k, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((10, tile_h, wi), lambda i, k: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((10, hi, wi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(fields, my_all, mx_all, covy[:, :, None], covx[:, None, :],
      iso.reshape(1))

    return out[0], out[1], jnp.moveaxis(out[2:5], 0, -1)
