"""Training-data samplers (reference L2: `core/sampler.h`, `core/samplers/*`).

`StaticSampler` is the in-core GPU sampler: a batch is B uniform-random
coordinates in [0,1]³ (optionally restricted to a sub-box) paired with
ground-truth values fetched by direct trilinear texture lookup
(`StaticSampler::sample`, neural_sampler.cu:130-164). On TPU the whole batch
is one fused RNG + gather computation inside the jitted train step — no
host↔device traffic in the hot loop.

Determinism: the reference seeds its GPU RNG with 1337 (neural_sampler.cu:36)
so runs are reproducible; we thread an explicit `jax.random` key with the same
spirit (key folding per step, per host).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from instantvnr_tpu.data.volume import Volume
from instantvnr_tpu.ops.trilinear import sample_volume_tex

DEFAULT_SEED = 1337  # reference neural_sampler.cu:36


@dataclass(frozen=True)
class StaticSampler:
    """In-core sampler over a normalized volume (pytree leaf: the volume)."""

    volume: Volume

    def sample(self, key: jax.Array, batch: int,
               lower=(0.0, 0.0, 0.0), upper=(1.0, 1.0, 1.0)):
        """Returns (coords [B,3] in [0,1]³, values [B,1])."""
        return sample_static(self.volume.data, key, batch,
                             jnp.asarray(lower, jnp.float32),
                             jnp.asarray(upper, jnp.float32))

    def sample_grid(self, origin, grid_dims, spacing):
        """Grid-decode helper (StaticSampler::sample_grid,
        neural_sampler.cu:167-172): coords of a regular grid + their values."""
        coords = grid_coords(origin, grid_dims, spacing)
        values = sample_volume_tex(self.volume.data, coords)
        return coords, values[..., None]


@partial(jax.jit, static_argnums=(2,))
def sample_static(vol: jnp.ndarray, key: jax.Array, batch: int,
                  lower: jnp.ndarray, upper: jnp.ndarray):
    u = jax.random.uniform(key, (batch, 3), jnp.float32)
    coords = lower + u * (upper - lower)
    values = sample_volume_tex(vol, coords)
    return coords, values[:, None]


def grid_coords(origin, grid_dims, spacing) -> jnp.ndarray:
    """Normalized coords of a regular sub-grid, cell-centered like the
    reference's generate_grid_coords (voxel center (i+0.5)·spacing)."""
    gx, gy, gz = (int(d) for d in grid_dims)
    origin = jnp.asarray(origin, jnp.float32)
    spacing = jnp.asarray(spacing, jnp.float32)
    z, y, x = jnp.meshgrid(
        jnp.arange(gz, dtype=jnp.float32),
        jnp.arange(gy, dtype=jnp.float32),
        jnp.arange(gx, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return (origin + (grid + 0.5)) * spacing
