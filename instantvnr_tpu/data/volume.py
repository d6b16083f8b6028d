"""Volume loading and normalization.

Mirrors the semantics of the reference's StaticSampler load path
(`core/samplers/neural_sampler.cpp:176-288`): read a raw scalar file of one of
8 dtypes, optionally byteswap, compute the global (min, max), and normalize to
float32 in [0, 1]. The reference parallelizes this with TBB and uploads a CUDA
3-D texture; here the normalized array is just a [D, H, W] float32 jax array
(axis order z, y, x — index [z, y, x] ≡ the reference's linear layout
x + y*dims.x + z*dims.x*dims.y).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import VolumeDesc


@dataclass(frozen=True)
class Volume:
    """A normalized in-core volume. `data` is [dz, dy, dx] float32 in [0,1]."""

    data: jnp.ndarray
    dims: tuple[int, int, int]  # (x, y, z) — reference order
    original_range: tuple[float, float]  # (min, max) in data units

    @property
    def shape_zyx(self) -> tuple[int, int, int]:
        return (self.dims[2], self.dims[1], self.dims[0])


def normalize_array(raw: np.ndarray,
                    value_range: tuple[float, float] | None = None
                    ) -> tuple[np.ndarray, tuple[float, float]]:
    """Normalize to [0,1] float32 (neural_sampler.cpp:244-288).

    `value_range=None` uses the data's global min/max (StaticSampler's
    fallback when the scene has no range); an explicit range saturates to
    [0,1] like the reference's convert_volume clamp.
    Constant volumes map to all-zeros (reference divides by (max-min); we guard).
    """
    raw = np.asarray(raw)
    if value_range is None:
        vmin = float(raw.min())
        vmax = float(raw.max())
    else:
        vmin, vmax = float(value_range[0]), float(value_range[1])
    scale = 1.0 / (vmax - vmin) if vmax > vmin else 0.0
    out = ((raw.astype(np.float32) - vmin) * scale).astype(np.float32)
    if value_range is not None:
        out = np.clip(out, 0.0, 1.0)
    return out, (vmin, vmax)


def load_volume(desc: VolumeDesc) -> Volume:
    """Load a raw volume file per its descriptor and normalize (by the
    scene-provided `desc.value_range` when present, else the data's own
    min/max — StaticSampler::load semantics)."""
    dx, dy, dz = desc.dims
    raw = np.fromfile(desc.filename, dtype=desc.np_dtype, count=desc.n_voxels,
                      offset=desc.offset)
    if raw.size != desc.n_voxels:
        raise ValueError(
            f"{desc.filename}: expected {desc.n_voxels} voxels, got {raw.size}"
        )
    raw = raw.reshape(dz, dy, dx)  # z-major, matching the raw file layout
    data, rng = normalize_array(raw, getattr(desc, "value_range", None))
    return Volume(data=jnp.asarray(data), dims=desc.dims, original_range=rng)


def synthetic_volume(dims=(64, 64, 64), kind: str = "vorts", seed: int = 0) -> Volume:
    """Procedural test volumes (stand-ins for the paper's datasets).

    'vorts' approximates a vortex-like structure: superposed rotating Gaussian
    tubes, giving both empty space (for macrocell skipping) and sharp features
    (for PSNR to be meaningful). 'sphere' is a simple radial falloff, and
    'noise' is smoothed random noise.
    """
    dx, dy, dz = dims
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, dz), np.linspace(-1, 1, dy), np.linspace(-1, 1, dx),
        indexing="ij",
    )
    if kind == "sphere":
        r = np.sqrt(x * x + y * y + z * z)
        data = np.clip(1.0 - r, 0.0, 1.0) ** 2
    elif kind == "noise":
        rng = np.random.default_rng(seed)
        data = rng.random((dz, dy, dx)).astype(np.float32)
        for axis in range(3):  # cheap smoothing
            data = 0.5 * data + 0.25 * (
                np.roll(data, 1, axis) + np.roll(data, -1, axis)
            )
    elif kind == "vorts":
        data = np.zeros_like(x)
        rng = np.random.default_rng(seed + 7)
        for _ in range(6):
            cx, cy, cz = rng.uniform(-0.5, 0.5, 3)
            ax, ay, az = rng.normal(size=3)
            n = np.sqrt(ax * ax + ay * ay + az * az) + 1e-9
            ax, ay, az = ax / n, ay / n, az / n
            # distance to a line through (cx,cy,cz) with direction (ax,ay,az)
            px, py, pz = x - cx, y - cy, z - cz
            dot = px * ax + py * ay + pz * az
            qx, qy, qz = px - dot * ax, py - dot * ay, pz - dot * az
            d2 = qx * qx + qy * qy + qz * qz
            sigma = rng.uniform(0.05, 0.15)
            data += np.exp(-d2 / (2 * sigma * sigma)) * (
                0.75 + 0.25 * np.cos(8.0 * dot)
            )
        data = np.clip(data, 0, None)
    else:
        # analytic field registry (data/procedural.py) rasterized at the
        # decode lattice — makes every analytic source also usable as a
        # grid volume (render apps, viewer, golden tests)
        from instantvnr_tpu.data.procedural import FIELDS, AnalyticSampler

        if kind not in FIELDS:
            raise ValueError(f"unknown synthetic volume kind: {kind}")
        data = np.asarray(
            AnalyticSampler.create(kind, seed).lattice_grid(dims))
        # fields are already [0,1] by contract — keep them UNstretched so
        # the grid equals the analytic field exactly (shared PSNR oracles)
        return Volume(data=jnp.asarray(data, jnp.float32), dims=dims,
                      original_range=(0.0, 1.0))
    data, rng_ = normalize_array(data.astype(np.float32))
    return Volume(data=jnp.asarray(data), dims=dims, original_range=rng_)


def save_raw(volume_data: jax.Array | np.ndarray, path: str) -> None:
    """Dump a [dz,dy,dx] float32 volume to a raw file (the reference's
    save_inference_volume / save_reference_volume, network.cu:328-408)."""
    np.asarray(volume_data, dtype=np.float32).tofile(path)
