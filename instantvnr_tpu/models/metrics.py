"""Quality metrics + volume decoding.

PSNR/SSIM are the reference's de-facto integration tests (SURVEY.md §4):
- PSNR: blockwise squared error vs ground truth, psnr = 10·log10(range²/mse)
  with range = (max−min) of the GT over the grid (`network.cu:410-472`).
- MSSIM: 7³ uniform window, sample covariance (cov_norm = N/(N−1)), K1=0.01,
  K2=0.03, data_range=1, mean over crop-valid voxels (`network.cu:474-549`).
- decode_volume: evaluate the network on the full voxel grid, z-slab blocks
  of 16 slices (the reference's progressive "blob" granularity,
  `network.cu:171,290-326`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from instantvnr_tpu.models.network import NeuralField, network_apply


def _grid_coords_slab(dims, z0: jnp.ndarray, slab: int) -> jnp.ndarray:
    """Direct-tex-convention coords ((i+0.5)/N) for a z-slab of the grid."""
    dx, dy, dz = dims
    z, y, x = jnp.meshgrid(
        (z0 + jnp.arange(slab, dtype=jnp.float32) + 0.5) / dz,
        (jnp.arange(dy, dtype=jnp.float32) + 0.5) / dy,
        (jnp.arange(dx, dtype=jnp.float32) + 0.5) / dx,
        indexing="ij",
    )
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


@partial(jax.jit, static_argnums=(0, 2, 3))
def decode_volume(field: NeuralField, params, dims: tuple[int, int, int],
                  slab: int = 16) -> jnp.ndarray:
    """Evaluate the network over the full grid → [dz, dy, dx] float32.

    Processed in z-slabs of `slab` slices via lax.map to bound peak memory
    (the reference's m_num_slices_per_blob=16 decode blobs).
    """
    dx, dy, dz = dims
    # non-multiple dz: the last blob decodes past the grid (coords > 1 are
    # harmless — XLA gathers clamp) and the overhang is trimmed below
    slab = min(slab, dz)
    n_slabs = (dz + slab - 1) // slab

    def _one_blob(i):  # (module-level decode_slab is the progressive API)
        coords = _grid_coords_slab(dims, (i * slab).astype(jnp.float32), slab)
        vals = network_apply(params, coords, field)
        return vals.reshape(slab, dy, dx)

    slabs = jax.lax.map(_one_blob, jnp.arange(n_slabs))
    return slabs.reshape(n_slabs * slab, dy, dx)[:dz]


@partial(jax.jit, static_argnums=(0, 3, 4))
def decode_slab(field: NeuralField, params, z0: jnp.ndarray,
                dims: tuple[int, int, int], slab: int = 16) -> jnp.ndarray:
    """One blob for progressive decoding (`infer_progressively_decode_volume`,
    network.cu:290-326): returns [slab, dy, dx] starting at z-slice z0."""
    dx, dy, dz = dims
    coords = _grid_coords_slab(dims, z0.astype(jnp.float32), slab)
    return network_apply(params, coords, field).reshape(slab, dy, dx)


@partial(jax.jit, static_argnums=(0,))
def psnr_vs(field: NeuralField, params, gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR of the decoded network vs a ground-truth [dz,dy,dx] volume."""
    dims = (gt.shape[2], gt.shape[1], gt.shape[0])
    pred = decode_volume(field, params, dims)
    return psnr_arrays(pred, gt)


def psnr_arrays(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    err = (pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2
    mse = jnp.mean(err)
    rng = jnp.max(gt) - jnp.min(gt)
    return 10.0 * jnp.log10(rng * rng / jnp.maximum(mse, 1e-20))


def psnr(field: NeuralField, params, gt: jnp.ndarray) -> float:
    return float(psnr_vs(field, params, gt))


def _uniform_filter3(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """3-D uniform filter via three separable 1-D convolutions (valid mode)."""
    k = jnp.ones((win,), x.dtype) / win
    for axis in range(3):
        x = jnp.moveaxis(x, axis, -1)
        shape = x.shape
        flat = x.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            flat, k.reshape(1, 1, win), (1,), "VALID",
            dimension_numbers=("NCH", "IOH", "NCH"),
        )
        x = out.reshape(shape[:-1] + (shape[-1] - win + 1,))
        x = jnp.moveaxis(x, -1, axis)
    return x


@partial(jax.jit, static_argnums=(2, 3))
def ssim_arrays(pred: jnp.ndarray, gt: jnp.ndarray, win: int = 7,
                data_range: float = 1.0) -> jnp.ndarray:
    """Mean SSIM matching the reference kernel (`network.cu:70-129`):
    uniform 7³ window, sample covariance normalization."""
    x = gt.astype(jnp.float32)
    y = pred.astype(jnp.float32)
    np_ = win**3
    cov_norm = np_ / (np_ - 1.0)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = _uniform_filter3(x, win)
    uy = _uniform_filter3(y, win)
    uxx = _uniform_filter3(x * x, win)
    uyy = _uniform_filter3(y * y, win)
    uxy = _uniform_filter3(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


def mssim(field: NeuralField, params, gt: jnp.ndarray) -> float:
    dims = (gt.shape[2], gt.shape[1], gt.shape[0])
    pred = decode_volume(field, params, dims)
    return float(ssim_arrays(pred, gt))
