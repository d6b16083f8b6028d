"""Trilinear volume sampling — the TPU replacement for CUDA `tex3D`.

The reference gets hardware trilinear filtering for free from CUDA textures
(`raytracing.h:105-110`):

    p' = p * (1 - 1/dims) + 0.5/dims      # cell-centered remap
    return tex3D(data, p'), with voxel centers at (i + 0.5)/N

On TPU this is 8 gathers + lerp on the VPU. We implement exactly the same
convention so decoded volumes / PSNR / gradient shading match the reference
allclose. Coordinates are in [0,1]³ object space; the volume array is
[dz, dy, dx] float32; out-of-range coordinates clamp (CUDA address mode clamp).
"""
from __future__ import annotations

import jax.numpy as jnp


def _gather3d(vol: jnp.ndarray, ix, iy, iz):
    """vol: [dz,dy,dx]; ix/iy/iz: integer arrays of identical shape."""
    dz, dy, dx = vol.shape
    if dz * dy * dx < (1 << 31):
        flat = vol.reshape(-1)
        idx = (iz * dy + iy) * dx + ix
        return flat[idx]
    # > 2^31 voxels (e.g. 1300³ f32 still fits a 16 GB chip): the fused
    # flat index overflows int32 (x64 is off), and XLA's clamp would then
    # silently gather wrong voxels — split into a [dz, dy·dx] gather whose
    # per-axis indices stay below 2^31 (shape is static; zero cost below)
    plane = vol.reshape(dz, dy * dx)
    return plane[iz, iy * dx + ix]


def sample_volume_voxel(vol: jnp.ndarray, xyz_voxel: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample at continuous VOXEL coordinates (texel space).

    xyz_voxel: [..., 3] in units of voxels, where voxel i's center is at
    coordinate i + 0.5 (CUDA texture convention). Clamp addressing.
    """
    dz, dy, dx = vol.shape
    dims = jnp.array([dx, dy, dz], jnp.float32)
    x = xyz_voxel - 0.5
    x = jnp.clip(x, 0.0, dims - 1.0)
    i0 = jnp.floor(x)
    frac = x - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, (dims - 1.0).astype(jnp.int32))

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    c000 = _gather3d(vol, x0, y0, z0)
    c100 = _gather3d(vol, x1, y0, z0)
    c010 = _gather3d(vol, x0, y1, z0)
    c110 = _gather3d(vol, x1, y1, z0)
    c001 = _gather3d(vol, x0, y0, z1)
    c101 = _gather3d(vol, x1, y0, z1)
    c011 = _gather3d(vol, x0, y1, z1)
    c111 = _gather3d(vol, x1, y1, z1)

    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sample_volume(vol: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sample at normalized [0,1]³ coordinates with the reference's
    cell-centered remap (`raytracing.h:105-110`): p' = p(1-1/N) + 0.5/N,
    then texel coordinate = p' * N."""
    dz, dy, dx = vol.shape
    dims = jnp.array([dx, dy, dz], jnp.float32)
    rdims = 1.0 / dims
    p_remap = p * (1.0 - rdims) + 0.5 * rdims
    return sample_volume_voxel(vol, p_remap * dims)


def sample_volume_tex(vol: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Sample at DIRECT normalized texture coordinates (texel i's center at
    (i+0.5)/N), with no cell-centered remap. This is what the reference's
    training sampler does (`neural_sampler.cu:151-155`: raw `tex3D(p)`), so
    the network learns f(p) = tex3D(p)."""
    dz, dy, dx = vol.shape
    dims = jnp.array([dx, dy, dz], jnp.float32)
    return sample_volume_voxel(vol, p * dims)


def sample_gradient(vol: jnp.ndarray, p: jnp.ndarray, v: jnp.ndarray,
                    step: jnp.ndarray | float) -> jnp.ndarray:
    """Forward-difference gradient with boundary flip (`raytracing.h:112-130`):
    if p+step exits [0,1] on an axis, the step is negated on that axis.
    v is the (already computed) central value. Returns [..., 3]."""
    eps = 1.19209e-07
    stp = jnp.broadcast_to(jnp.asarray(step, jnp.float32), p.shape)
    ext = p + stp
    stp = jnp.where(ext > 1.0 - eps, -stp, stp)
    gx = sample_volume(vol, p + jnp.stack(
        [stp[..., 0], jnp.zeros_like(stp[..., 0]), jnp.zeros_like(stp[..., 0])], -1)) - v
    gy = sample_volume(vol, p + jnp.stack(
        [jnp.zeros_like(stp[..., 1]), stp[..., 1], jnp.zeros_like(stp[..., 1])], -1)) - v
    gz = sample_volume(vol, p + jnp.stack(
        [jnp.zeros_like(stp[..., 2]), jnp.zeros_like(stp[..., 2]), stp[..., 2]], -1)) - v
    return jnp.stack([gx, gy, gz], axis=-1) / stp
