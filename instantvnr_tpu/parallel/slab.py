"""Slab-sharded rendering: the flagship compositor over a device mesh.

The slab compositor (render/slabmarch.py) is a front-to-back `over` fold of
per-slab premultiplied RGBA layers — and `over` is ASSOCIATIVE, so the fold
splits exactly across devices: shard the volume over its (permuted) slab
axis, let every device resample + classify + composite ITS contiguous slab
chunk into one premultiplied [4, hi, wi] partial, then combine the n
partials front-to-back with one `all_gather` (the frame's only collective:
n·4·hi·wi floats over ICI). Because the volume itself is sharded, this also
scales volume MEMORY — a 2048³ grid (32 GB f32) fits an 8-chip v5e slice at
4 GB/chip, which is how the reference's "terascale decoded rendering" role
maps onto a pod slice.

Equivalence: the per-chunk compositor is `_composite_batched` (the batched
variant of the slab scan, parity-tested against the sequential path), with
the chunk's z-offset threaded through. The chunked combine reproduces the
batched compositor's numbers exactly up to float reassociation — verified
against the single-device renderer in tests/test_parallel.py
(TestSlabSharded) and across a 2-process boundary in tests/test_multihost.py.

Scope: value rendering (no gradient-shading/shadow variants — those follow
the same pattern but stream 4× the fields; use the single-device paths).
The reference has no multi-GPU analog of any of this (SURVEY.md §2.9).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instantvnr_tpu.render.slabmarch import (
    SlabSettings,
    _composite_batched,
    _final_warp,
    _permute_volume,
    frame_geometry,
)


def _permute_host(volume: np.ndarray, axis: int, flipped: bool):
    """Host-memory mirror of slabmarch._permute_volume (same perm map) —
    numpy transpose/flip are views, so nothing is copied here."""
    if axis == 2:
        vol, perm = volume, (0, 1, 2)
    elif axis == 1:
        vol, perm = np.transpose(volume, (1, 0, 2)), (0, 2, 1)
    else:
        vol, perm = np.transpose(volume, (2, 0, 1)), (1, 2, 0)
    if flipped:
        vol = vol[::-1]
    return vol, perm


def shard_volume_slabs(volume, mesh: Mesh, axis: int, flipped: bool):
    """Place a [dz, dy, dx] volume sharded over its PERMUTED slab axis.

    Returns the permuted, device-sharded [D, ay, ax] array (leading axis
    split over "data") plus the perm map — the layout
    `sharded_slab_render` consumes. Use once per principal-axis change.

    Pass a HOST (numpy) array for volumes that don't fit one device: each
    device then materializes only its own slab chunk straight from host
    memory (this is the memory-scaling path — a 2048³ f32 grid never
    exists on any single chip). A jax-array input takes the on-device
    transpose path, which requires the full volume to fit one device.
    """
    spec = NamedSharding(mesh, P("data", None, None))
    if isinstance(volume, np.ndarray):
        vol, perm = _permute_host(volume, axis, flipped)
        arr = jax.make_array_from_callback(
            vol.shape, spec, lambda idx: np.ascontiguousarray(vol[idx]))
        return arr, perm
    vol, perm = _permute_volume(volume, axis, flipped)
    if jax.process_count() > 1:
        # multihost: every process holds the full (or at least its own
        # slabs of the) volume; assemble the global array shard by shard
        vol = jax.make_array_from_callback(vol.shape, spec,
                                           lambda idx: vol[idx])
    else:
        vol = jax.device_put(vol, spec)
    return vol, perm


def make_sharded_slab_render(mesh: Mesh, width: int, height: int,
                             settings: SlabSettings, axis: int,
                             flipped: bool, d_slab: int):
    """Build the jitted slab-sharded frame function for one principal axis.

    Returned fn(vol_perm [D, ay, ax] sharded over "data", tf, cam_arrays,
    slab_occupancy [D] bool, xform, shadow_perm=None) → rgba [H·W, 4]
    (replicated). shadow_perm is a shadow-transmittance volume sharded
    exactly like vol_perm (shard_volume_slabs). The data-axis size must
    divide d_slab.
    """
    n = mesh.shape["data"]
    if d_slab % n != 0:
        raise ValueError(
            f"data axis size {n} must divide d_slab {d_slab}")

    def frame(vol_perm, tf, cam_arrays, slab_occupancy, xform,
              shadow_perm=None):
        d, ay_n, ax_n = vol_perm.shape
        # chunk offsets come from the ACTUAL slab count (static under jit),
        # not the constructor's d_slab — a volume rebound with a different
        # slab count must fail loudly, not composite with shifted geometry
        if d % n != 0:
            raise ValueError(f"slab count {d} not divisible by data axis {n}")
        chunk = d // n
        # permuted dims → world dims (perm maps world → permuted axes)
        if axis == 2:
            dims_w = jnp.array([ax_n, ay_n, d], jnp.float32)
        elif axis == 1:
            dims_w = jnp.array([ax_n, d, ay_n], jnp.float32)
        else:
            dims_w = jnp.array([d, ax_n, ay_n], jnp.float32)
        perm = {2: (0, 1, 2), 1: (0, 2, 1), 0: (1, 2, 0)}[axis]

        geo = frame_geometry(dims_w, d, ax_n, ay_n, cam_arrays, xform,
                             perm, flipped, settings, width, height)
        e, _, clo, chi, z_ref, in_front = geo[:6]
        (x_lo, x_hi, y_lo, y_hi), xs, ys, corr_exp = geo[6:]
        occ = slab_occupancy & in_front

        with_shadow = shadow_perm is not None

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P("data"), P("data"),
                      P("data") if with_shadow else P(),
                      P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        def composite(vol_c, occ_c, sh_c, tf_, e_, z_ref_, xs_, ys_, corr_,
                      clo_, chi_):
            z0 = (jax.lax.axis_index("data") * chunk).astype(jnp.float32)
            part = _composite_batched(
                vol_c, tf_, e_, z_ref_, xs_, ys_, corr_, occ_c,
                sh_c if with_shadow else None,
                settings.shadow_ambient, clo_, chi_, blend_mode="seq",
                z0=z0, return_premult=True)  # [4, hi, wi] premultiplied
            g = jax.lax.all_gather(part, "data")  # [n, 4, hi, wi]
            out = g[0]
            for i in range(1, n):  # front-to-back `over` of the n chunks
                out = out + (1.0 - out[3:4]) * g[i]
            return out

        out = composite(vol_perm, occ,
                        shadow_perm if with_shadow else jnp.zeros((), jnp.float32),
                        tf, e, z_ref, xs, ys, corr_exp, clo, chi)
        color = jnp.moveaxis(out[:3], 0, -1)
        wi = xs.shape[0]
        hi = ys.shape[0]
        return _final_warp(color, out[3], cam_arrays, width, height, perm,
                           flipped, e, z_ref, x_lo, x_hi, y_lo, y_hi,
                           wi, hi, xform.scale)

    return jax.jit(frame)
