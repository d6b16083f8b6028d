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
            covy_ref,     # (1, TH, 1)   VMEM  f32 0/1
            covx_ref,     # (1, 1, wi)   VMEM  f32 0/1 (slab keep folded in)
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

    acc = _classify(ctrl_ref, kc, vals)
    _blend(out_ref, covy_ref, covx_ref, corr_ref, acc[:3], acc[3])


def _classify(ctrl_ref, kc: int, vals):
    """Gather-free TF classification (classify_controls telescoping form) →
    four [TH, wi] planes (r, g, b, a)."""
    lo = ctrl_ref[0, 5]
    hi = ctrl_ref[0, 6]
    v = (jnp.clip(vals, lo, hi) - lo) / jnp.maximum(hi - lo, 1e-20)
    acc = [jnp.full(v.shape, ctrl_ref[0, 1 + c], jnp.float32)
           for c in range(4)]
    for i in range(kc - 1):
        denom = jnp.maximum(ctrl_ref[i + 1, 0] - ctrl_ref[i, 0], 1e-12)
        t = jnp.clip((v - ctrl_ref[i, 0]) / denom, 0.0, 1.0)
        for c in range(4):
            acc[c] += t * (ctrl_ref[i + 1, 1 + c] - ctrl_ref[i, 1 + c])
    return acc


def _blend(out_ref, covy_ref, covx_ref, corr_ref, rgb, acc_a):
    """Opacity correction + coverage/early-termination masking +
    front-to-back blend into the VMEM-resident carry."""
    trans = out_ref[3]
    alpha = 1.0 - jnp.power(jnp.maximum(1.0 - acc_a, 0.0), corr_ref[:])
    mask = (covy_ref[0] * covx_ref[0]
            * (trans > 1.0 - NEARLY_ONE).astype(jnp.float32))
    alpha = alpha * mask
    w = trans * alpha
    for c in range(3):
        out_ref[c] += w * rgb[c]
    out_ref[3] = trans * (1.0 - alpha)


# misc scalar layout for the shaded/shadowed kernel (SMEM [11] f32):
#   [0] shadow_ambient   [1] shading_scale   [2:5] light dir (normalized,
#   flipped against view) [5:8] eye (voxel space, world axis order)
#   [8:11] voxel→world scale
def _kernel_ext(kc: int, perm: tuple, shade: bool, shadow: bool,
                fields_ref,   # (1, C, ay, ax) VMEM; C=4 shaded else 1
                sh_ref,       # (1, ay, ax)    VMEM (dummy (1,1,1) if !shadow)
                my_ref,       # (1, TH, ay)
                mx_ref,       # (1, wi, ax)
                covy_ref,     # (1, TH, 1)
                covx_ref,     # (1, 1, wi)  (slab keep folded in)
                corr_ref,     # (TH, wi)
                xsrc_ref,     # (1, 1, wi)  permuted-voxel x of each column
                ysrc_ref,     # (1, TH, 1)  permuted-voxel y of each row
                zw_ref,       # (D,) SMEM — slab z in UNFLIPPED voxel coords
                ctrl_ref,     # (kc, 8) SMEM
                misc_ref,     # (11,) SMEM — layout above
                out_ref):     # (4, TH, wi)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        zero = jnp.zeros(out_ref.shape[1:], jnp.float32)
        out_ref[0] = zero
        out_ref[1] = zero
        out_ref[2] = zero
        out_ref[3] = zero + 1.0

    my = my_ref[0]
    mx = mx_ref[0]
    n_fields = 4 if shade else 1
    rs = []
    for c in range(n_fields):
        tmp = jnp.dot(my, fields_ref[0, c],
                      preferred_element_type=jnp.float32)
        rs.append(jax.lax.dot_general(
            tmp, mx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))  # [TH, wi]

    acc = _classify(ctrl_ref, kc, rs[0])
    rgb, acc_a = acc[:3], acc[3]

    if shade:
        # scivis + simple headlight blend (_shade_scivis semantics,
        # raytracing.h:215-246), on the resampled gradient planes
        scale = [misc_ref[8 + c] for c in range(3)]
        eye = [misc_ref[5 + c] for c in range(3)]
        light = [misc_ref[2 + c] for c in range(3)]
        # per-pixel world position of this slab's samples: permuted source
        # coords (x per column, y per row, z per slab) → world components
        th, wi = rs[0].shape
        p_perm = [jnp.broadcast_to(xsrc_ref[0], (th, wi)),
                  jnp.broadcast_to(ysrc_ref[0], (th, wi)),
                  jnp.full((th, wi), zw_ref[k])]
        p_world = [None, None, None]
        for i_ax in range(3):
            p_world[perm[i_ax]] = p_perm[i_ax]
        view = [(p_world[c] - eye[c]) * scale[c] for c in range(3)]
        vn = jnp.sqrt(view[0] ** 2 + view[1] ** 2 + view[2] ** 2)
        view = [v / jnp.maximum(vn, 1e-9) for v in view]
        # world-space normal: diagonal xfmNormal = divide by scale
        normal = [-rs[1 + c] / scale[c] for c in range(3)]
        nn = normal[0] ** 2 + normal[1] ** 2 + normal[2] ** 2
        has_n = nn > 1e-6
        n = [x / jnp.sqrt(jnp.maximum(nn, 1e-20)) for x in normal]
        cos_nl = jnp.maximum(
            n[0] * light[0] + n[1] * light[1] + n[2] * light[2], 0.0)
        h = [light[c] - view[c] for c in range(3)]
        hn = jnp.sqrt(h[0] ** 2 + h[1] ** 2 + h[2] ** 2)
        h = [x / jnp.maximum(hn, 1e-20) for x in h]
        cos_nh = jnp.maximum(n[0] * h[0] + n[1] * h[1] + n[2] * h[2], 0.0)
        spec = 0.4 * jnp.power(cos_nh, 40.0)
        lit = jnp.where(cos_nl > 0.0, 1.0, 0.0)
        cos_vn = jnp.abs(view[0] * n[0] + view[1] * n[1] + view[2] * n[2])
        simple_w = jnp.where(has_n, 0.2 + 0.8 * cos_vn, 0.0)
        s_ = misc_ref[1]
        shaded_rgb = []
        for c in range(3):
            scivis = jnp.where(
                has_n, 0.6 * rgb[c] + lit * (0.9 * cos_nl * rgb[c] + spec),
                0.0)
            sh_c = 0.5 * rgb[c] * simple_w + 0.5 * scivis
            shaded_rgb.append(s_ * sh_c + (1.0 - s_) * rgb[c])
        rgb = shaded_rgb

    if shadow:
        tmp = jnp.dot(my, sh_ref[0], preferred_element_type=jnp.float32)
        sh = jax.lax.dot_general(tmp, mx, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        amb = misc_ref[0]
        f = amb + (1.0 - amb) * jnp.clip(sh, 0.0, 1.0)
        rgb = [r * f for r in rgb]

    _blend(out_ref, covy_ref, covx_ref, corr_ref, rgb, acc_a)


def pick_tile_h(hi: int, wi: int, ay: int = 0, ax: int = 0,
                n_fields: int = 1, out_planes: int = 4,
                max_tile: int = 256,
                budget_bytes: int = 12 << 20) -> int | None:
    """Largest divisor of hi ≤ max_tile whose kernel working set fits VMEM;
    None when no tile height fits (caller falls back to the XLA scan).

    Only sublane-aligned tiles (multiple of 8, or the full hi) are legal:
    Mosaic requires every block's second-to-last dim to be 8-divisible or
    equal to the array dim, and tile_h appears as that dim in the carry /
    correction / interpolation blocks.

    Working-set estimate per grid step (f32): double-buffered input blocks
    (n_fields slab planes [ay, ax], interpolation matrices [th, ay] /
    [wi, ax], coverage rows, the [th, wi] correction block) + the
    [out_planes, th, wi] VMEM-resident carry."""

    def fits(th: int) -> bool:
        inputs = n_fields * ay * ax + th * ay + wi * ax + th + 2 * wi \
            + th * wi
        return 4 * (2 * inputs + out_planes * th * wi) <= budget_bytes

    for th in range(min(hi, max_tile), 0, -1):
        if hi % th == 0 and (th % 8 == 0 or th == hi) and fits(th):
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
            pl.BlockSpec((1, tile_h, 1), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, 1, wi), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((tile_h, wi), lambda i, k: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_h, wi), lambda i, k: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, hi, wi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(vol, my_all, mx_all, covy[:, :, None], covx[:, None, :],
      corr_exp, ctrl)

    return jnp.moveaxis(out[:3], 0, -1), 1.0 - out[3]


@partial(jax.jit, static_argnums=(12, 13, 14, 15, 16))
def composite_slabs_ext(fields, shadow_vol, my_all, mx_all, covy, covx,
                        corr_exp, x_src, y_src, zw, ctrl, misc,
                        tile_h: int, perm: tuple, shade: bool,
                        use_shadow: bool, interpret: bool = False):
    """Fused compositor with gradient shading and/or shadow-volume modulation.

    fields     [D, C, ay, ax]  permuted value (+3 gradient) slabs; C=4|1
    shadow_vol [D, ay, ax] | None  permuted shadow transmittance
    x_src      [D, wi]  per-slab permuted-voxel x of each column
    y_src      [D, hi]  per-slab permuted-voxel y of each row
    zw         [D]      slab z in UNFLIPPED permuted voxel coords
    misc       [11]     see _kernel_ext layout comment
    perm       static   permuted-axis → world-component map (slabmarch)
    Other args as composite_slabs. Returns (color premult, alpha).
    """
    d, c_f, ay, ax = fields.shape
    hi = my_all.shape[1]
    wi = mx_all.shape[1]
    kc = ctrl.shape[0]
    n_tiles = hi // tile_h
    if shadow_vol is None:
        shadow_vol = jnp.zeros((1, 1, 1), jnp.float32)
        sh_spec = pl.BlockSpec((1, 1, 1), lambda i, k: (0, 0, 0))
    else:
        sh_spec = pl.BlockSpec((1, ay, ax), lambda i, k: (k, 0, 0))

    out = pl.pallas_call(
        partial(_kernel_ext, kc, perm, shade, use_shadow),
        grid=(n_tiles, d),
        in_specs=[
            pl.BlockSpec((1, c_f, ay, ax), lambda i, k: (k, 0, 0, 0)),
            sh_spec,
            pl.BlockSpec((1, tile_h, ay), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, wi, ax), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((1, tile_h, 1), lambda i, k: (k, i, 0)),
            pl.BlockSpec((1, 1, wi), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((tile_h, wi), lambda i, k: (i, 0)),
            pl.BlockSpec((1, 1, wi), lambda i, k: (k, 0, 0)),
            pl.BlockSpec((1, tile_h, 1), lambda i, k: (k, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_h, wi), lambda i, k: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, hi, wi), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(fields, shadow_vol, my_all, mx_all, covy[:, :, None],
      covx[:, None, :], corr_exp, x_src[:, None, :], y_src[:, :, None],
      zw, ctrl, misc)

    return jnp.moveaxis(out[:3], 0, -1), 1.0 - out[3]


def pack_misc(shadow_ambient, shading_scale, light, eye_w, scale):
    """Assemble the [11] SMEM scalar vector for composite_slabs_ext."""
    return jnp.concatenate([
        jnp.asarray([shadow_ambient, shading_scale], jnp.float32),
        jnp.asarray(light, jnp.float32).reshape(3),
        jnp.asarray(eye_w, jnp.float32).reshape(3),
        jnp.asarray(scale, jnp.float32).reshape(3),
    ])


def pack_controls(tf) -> jnp.ndarray:
    """TransferFunction control points → the [Kc, 8] SMEM layout."""
    kc = tf.ctrl_x.shape[0]
    rng = jnp.stack([jnp.broadcast_to(tf.range_lo, (kc,)),
                     jnp.broadcast_to(tf.range_hi, (kc,))], axis=-1)
    return jnp.concatenate(
        [tf.ctrl_x[:, None], tf.ctrl_rgba, rng,
         jnp.zeros((kc, 1), jnp.float32)], axis=-1)
