"""Shadow volume precomputation — directional-light transmittance.

Capability counterpart of the reference's `generate_shadow_map` app
(apps/shadowmap.cu:322-358: brute-force per-voxel transmittance ray marching
toward the light) and the 2-pass MethodShadowMap renderer
(core/renderer/method_shadowmap.*). TPU redesign, gather-free:

  1. permute the volume so the light's dominant axis is the layer axis;
  2. SHEAR each layer by the light's constant per-layer offset (two banded
     interpolation matmuls per layer, like slabmarch) so light rays become
     vertical columns in sheared space;
  3. transmittance = exclusive cumulative product of (1 − α·correction)
     down the columns — one lax.associative_scan;
  4. un-shear each layer back.

The result S [dz, dy, dx] ∈ [0,1] is "how much directional light reaches
this voxel"; the slab renderer resamples it per slab (one extra matmul pair)
and modulates the sample color: rgb × (ambient + (1−ambient)·S).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.render.slabmarch import _interp_matrix, _permute_volume
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls


def light_principal_axis(light_dir) -> tuple[int, bool]:
    d = np.asarray(light_dir, np.float32)
    d = d / (np.linalg.norm(d) + 1e-20)
    axis = int(np.argmax(np.abs(d)))
    # light travels along −light_dir toward the scene; layers accumulate in
    # the direction light PROPAGATES. With dir pointing toward the light,
    # propagation is −dir.
    return axis, bool(d[axis] > 0)


@partial(jax.jit, static_argnums=(3, 4, 6))
def compute_shadow_volume(volume: jnp.ndarray, tf: TransferFunction,
                          light_dir: jnp.ndarray, axis: int, flipped: bool,
                          sampling_rate: float = 1.0,
                          pads: tuple = (0, 0, 0, 0)) -> jnp.ndarray:
    """→ S [dz, dy, dx] float32 transmittance toward the directional light.

    light_dir points TOWARD the light (world components); axis/flipped from
    light_principal_axis (static). Layers march in the propagation
    direction, so layer 0 is fully lit.

    pads = (x_lo, x_hi, y_lo, y_hi): static lateral enlargement of the
    sheared buffer. Oblique lights shift deep layers by up to d·|s| voxels;
    without padding, every voxel whose light ray enters through a SIDE face
    falls outside the sheared columns and would read back as fully lit —
    unshadowed wedges growing with depth. shadow_volume_for computes the
    needed pads (quantized to limit retraces)."""
    vol, perm = _permute_volume(volume, axis, flipped)
    d, ny, nx = vol.shape
    pxl, pxh, pyl, pyh = pads
    nxb, nyb = nx + pxl + pxh, ny + pyl + pyh

    # light components in permuted space; flip z like the volume
    lp = jnp.stack([light_dir[perm[0]], light_dir[perm[1]],
                    light_dir[perm[2]]])
    lp = jnp.where(flipped, lp * jnp.array([1.0, 1.0, -1.0]), lp)
    # propagation = −light_dir; per unit layer the ray shifts by s = l_xy/l_z
    sx = lp[0] / lp[2]
    sy = lp[1] / lp[2]
    # per-layer step length along the light ray
    step_len = jnp.sqrt(sx * sx + sy * sy + 1.0)

    ks = jnp.arange(d, dtype=jnp.float32)

    def shear_layer(k, layer):
        # sheared buffer coord ib reads volume x = (ib − pxl) + k·sx
        mx = _interp_matrix(nxb, nx, 1.0, 0.5 + k * sx - pxl)
        my = _interp_matrix(nyb, ny, 1.0, 0.5 + k * sy - pyl)
        cov = (my.sum(1) > 0)[:, None] & (mx.sum(1) > 0)[None, :]
        return my @ layer @ mx.T, cov

    sheared, covs = jax.vmap(shear_layer)(ks, vol)  # [d, nyb, nxb]
    _, alpha = classify_controls(tf, sheared)
    alpha = 1.0 - jnp.power(jnp.maximum(1.0 - alpha, 0.0),
                            sampling_rate * step_len)
    alpha = jnp.where(covs, alpha, 0.0)  # outside the volume = transparent
    # exclusive cumulative transmittance down the layer axis
    trans = jnp.cumprod(1.0 - alpha, axis=0)
    trans = jnp.concatenate([jnp.ones((1, nyb, nxb)), trans[:-1]], axis=0)

    def unshear_layer(k, layer):
        mx = _interp_matrix(nx, nxb, 1.0, 0.5 - k * sx + pxl)
        my = _interp_matrix(ny, nyb, 1.0, 0.5 - k * sy + pyl)
        cov = (my.sum(1) > 0)[:, None] & (mx.sum(1) > 0)[None, :]
        # with the pads sized to d·|s| every in-volume position is covered;
        # the fallback only catches under-quantized extremes (≈ fully lit)
        return jnp.where(cov, my @ layer @ mx.T, 1.0)

    out = jax.vmap(unshear_layer)(ks, trans)  # permuted space

    # un-permute back to [dz, dy, dx]
    if flipped:
        out = out[::-1]
    if axis == 2:
        return out
    if axis == 1:
        return jnp.transpose(out, (1, 0, 2))
    return jnp.transpose(out, (1, 2, 0))


def _quantized_pad(need: int, d: int) -> int:
    """Smallest of {0, 8, 16, 32, ...} ≥ need, capped at d — quantized so a
    smoothly moving light only retraces at a handful of pad sizes."""
    if need <= 0:
        return 0
    p = 8
    while p < need and p < d:
        p *= 2
    return min(p, d)


def shadow_volume_for(volume, tf, light_dir, sampling_rate: float = 1.0):
    """Host-side wrapper choosing the static axis and buffer pads."""
    axis, flipped = light_principal_axis(light_dir)
    # lateral shift bound: deep layers shear by up to d·|s| voxels (|s| ≤ 1
    # since the layer axis is the light's dominant component)
    l = np.asarray(light_dir, np.float32)
    perm = {2: (0, 1, 2), 1: (0, 2, 1), 0: (1, 2, 0)}[axis]
    lp = np.array([l[perm[0]], l[perm[1]], l[perm[2]]], np.float32)
    if flipped:  # mirror of the traced lp * [1, 1, -1]
        lp[2] = -lp[2]
    sx = float(lp[0] / lp[2])
    sy = float(lp[1] / lp[2])
    d = volume.shape[0 if axis == 2 else (1 if axis == 1 else 2)]
    # buffer coord = volume coord − k·s: positive s shifts LOW, negative HIGH
    px = _quantized_pad(int(np.ceil(d * abs(sx))), d)
    py = _quantized_pad(int(np.ceil(d * abs(sy))), d)
    pads = (px if sx > 0 else 0, px if sx < 0 else 0,
            py if sy > 0 else 0, py if sy < 0 else 0)
    return compute_shadow_volume(
        volume, tf, jnp.asarray(light_dir, jnp.float32), axis, flipped,
        sampling_rate, pads,
    )
