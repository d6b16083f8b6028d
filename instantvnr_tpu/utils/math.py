"""Math substrate: camera ray generation and ray/box intersection.

Replaces the OVR `gdt` math layer the reference leans on (SURVEY.md §L0).
Everything is batched, jit-friendly, and shaped [..., 3] — no scalar types.

Camera convention mirrors the reference renderer (`renderer.cpp:87-96`):
a look-at camera with vertical fov in degrees; pixel (0,0) is the lower-left
corner, rays go through pixel centers.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-20) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def camera_frame(eye, center, up):
    """Right-handed camera basis (dir, right, up'), as in the reference
    `Camera` → `LaunchParams.camera` derivation (renderer.cpp:87-96)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    direction = normalize(center - eye)
    right = normalize(jnp.cross(direction, up))
    true_up = jnp.cross(right, direction)
    return direction, right, true_up


def look_at_rays(eye, center, up, fovy_deg, width: int, height: int,
                 jitter: jnp.ndarray | None = None):
    """Generate per-pixel primary rays.

    Returns (origins [H*W,3], directions [H*W,3] normalized).
    `jitter` is an optional [H*W,2] array in [0,1) for subpixel AA (the
    reference jitters via per-frame RNG in the raygen kernels,
    method_raymarching.cu:845-852).
    """
    direction, right, true_up = camera_frame(eye, center, up)
    fovy = jnp.float32(fovy_deg) * jnp.pi / 180.0
    tan_half = jnp.tan(0.5 * fovy)
    aspect = width / float(height)

    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    px = xx.reshape(-1)
    py = yy.reshape(-1)
    if jitter is None:
        px = px + 0.5
        py = py + 0.5
    else:
        px = px + jitter[:, 0]
        py = py + jitter[:, 1]
    # NDC in [-1, 1]
    u = (px / width * 2.0 - 1.0) * tan_half * aspect
    v = (py / height * 2.0 - 1.0) * tan_half
    dirs = normalize(
        direction[None, :] + u[:, None] * right[None, :] + v[:, None] * true_up[None, :]
    )
    origins = jnp.broadcast_to(jnp.asarray(eye, jnp.float32)[None, :], dirs.shape)
    return origins, dirs


def ray_box_intersect(org, dir, box_lo, box_hi, t_min=0.0, t_max=np.inf):
    """Slab-method ray/AABB intersection (reference raytracing.h:60-103).

    org, dir: [..., 3]. Returns (t0, t1, hit) with t0 <= t1 where hit.
    Handles axis-parallel rays via the IEEE inf semantics of 1/0.
    """
    inv = 1.0 / dir  # inf where dir==0 — fine for slab method
    lo = (jnp.asarray(box_lo, jnp.float32) - org) * inv
    hi = (jnp.asarray(box_hi, jnp.float32) - org) * inv
    near = jnp.minimum(lo, hi)
    far = jnp.maximum(lo, hi)
    # 0·inf → NaN when the origin sits exactly ON a slab plane of a
    # parallel axis (min/max propagate it and the grazing ray would be
    # dropped as a miss); the graze counts as inside: (-inf, +inf)
    nan = jnp.isnan(near) | jnp.isnan(far)
    near = jnp.where(nan, -jnp.inf, near)
    far = jnp.where(nan, jnp.inf, far)
    t0 = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t1 = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t0, t1, t0 < t1


def world_to_object(p_world, dims):
    """World box is [-dims/2, dims/2] (reference `network.cu:569`:
    transform = translate(-dims/2)·scale(dims)); object space is [0,1]³."""
    dims = jnp.asarray(dims, jnp.float32)
    return p_world / dims + 0.5


def object_to_world(p_obj, dims):
    dims = jnp.asarray(dims, jnp.float32)
    return (p_obj - 0.5) * dims
