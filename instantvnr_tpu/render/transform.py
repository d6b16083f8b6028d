"""Volume clipping box + anisotropic scaling (reference `api.h:146-147`).

The reference stores a per-volume data transform (`affine3f`, diagonal for
`vnrVolumeSetScaling`, api.cpp:340-351) and an object-space clipping box
(`vnrVolumeSetClippingBox`, api.cpp:322-338 → DeviceVolume::bbox,
instantvnr_types.h:113); every renderer transforms camera rays world→object
with the UNNORMALIZED direction (so `t` stays world-metric,
method_raymarching.cu:520-521) and intersects them against the clip box
instead of the full volume box (intersectVolume, :1004).

The TPU marchers work in voxel space `[0, dims]`; the world box is the
scaled, centered volume `[-dims·scale/2, +dims·scale/2]`. This module holds
the (diagonal) transform as a small traced pytree and the world↔voxel ray
mapping shared by the wavefront marcher, the path tracer, and the slab
compositor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class VolumeTransform(NamedTuple):
    """Diagonal data transform + clip box, all traced arrays.

    world = (voxel − dims/2) · scale;  clip bounds are VOXEL coordinates in
    [0, dims] (the reference's user-facing convention: api.cpp:332-333
    subtracts dims/2 from the user's `[0, dims]` input before storing).
    """

    scale: jnp.ndarray  # [3] anisotropic voxel→world scaling
    clip_lower: jnp.ndarray  # [3] voxel coords
    clip_upper: jnp.ndarray  # [3] voxel coords


def default_transform(dims) -> VolumeTransform:
    d = jnp.asarray(dims, jnp.float32)
    return VolumeTransform(
        scale=jnp.ones(3, jnp.float32),
        clip_lower=jnp.zeros(3, jnp.float32),
        clip_upper=d,
    )


def rays_to_voxel(xform: VolumeTransform, dims, org_w, dir_w):
    """World rays → voxel-space rays.

    dir_w must be normalized; the returned direction is NOT renormalized
    (|dir_v| = |S⁻¹·dir_w|), so `t` along the voxel-space ray measures WORLD
    distance — sampling-rate and density semantics stay world-metric exactly
    like the reference (method_raymarching.cu:520-521 marches the
    transformed, unnormalized direction).
    """
    d = jnp.asarray(dims, jnp.float32)
    org_v = org_w / xform.scale + 0.5 * d
    dir_v = dir_w / xform.scale
    return org_v, dir_v


def clip_bounds(xform: VolumeTransform, dims):
    """Clip box intersected with the volume box, in voxel coords."""
    d = jnp.asarray(dims, jnp.float32)
    lo = jnp.clip(xform.clip_lower, 0.0, d)
    hi = jnp.clip(xform.clip_upper, 0.0, d)
    return lo, jnp.maximum(hi, lo)
