"""Procedural / analytic training sources — the OpenVKL capability class.

The reference's OpenVKLSampler trains "no ground-truth texture" modes from
procedural test volumes (XYZ / sphere / wavelet), downsampled grids, and
VDB files (`core/samplers/neural_sampler.cpp:714-958`). OpenVKL does not
exist on TPU hosts; this module replaces the CAPABILITY with analytic
fields evaluated INSIDE the jitted train step — no volume is ever
materialized, in-core or out — plus a downsampled-grid wrapper for the
grid-backed variant.

Fields are pure f: [0,1]³ → [0,1] jnp functions. `AnalyticSampler` is a
frozen, hashable dataclass (all parameters are static tuples), so it rides
jit as a static argument and the whole batch —  RNG, analytic evaluation,
forward, backward, Adam — fuses into one device program
(models.trainer.train_steps_source).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# analytic fields (each takes p [..., 3] in [0,1]³ and optional static
# params, returns values in [0,1])


def _field_sphere(p, params):
    # radial falloff about the center, like the 'sphere' grid synthetic
    q = p * 2.0 - 1.0
    r = jnp.sqrt(jnp.sum(q * q, axis=-1))
    return jnp.clip(1.0 - r, 0.0, 1.0) ** 2


def _field_xyz(p, params):
    # openvkl XYZProceduralVolume analog: separable coordinate product
    return p[..., 0] * p[..., 1] * p[..., 2]


def _field_wavelet(p, params):
    # openvkl WaveletProceduralVolume analog: sum of axis sines, remapped
    # to [0,1] (the reference instantiates WaveletVdbVolumeFloat,
    # neural_sampler.cpp:732)
    q = p * 2.0 - 1.0
    xf, yf, zf = 12.0, 10.0, 8.0
    s = (jnp.sin(xf * q[..., 0]) * 0.4 + jnp.sin(yf * q[..., 1]) * 0.35
         + jnp.cos(zf * q[..., 2]) * 0.25)
    return 0.5 + 0.5 * s


def _field_marschner_lobb(p, params):
    # Marschner & Lobb '94 resampling test signal, domain [-1,1]³,
    # fM = 6, alpha = 0.25 — the classic high-frequency fidelity oracle
    q = p * 2.0 - 1.0
    alpha, fm = 0.25, 6.0
    r = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2)
    rho_r = jnp.cos(2.0 * jnp.pi * fm * jnp.cos(jnp.pi * r / 2.0))
    v = (1.0 - jnp.sin(jnp.pi * q[..., 2] / 2.0) + alpha * (1.0 + rho_r))
    return v / (2.0 * (1.0 + alpha))


def _field_tubes(p, params):
    # analytic counterpart of the 'vorts' grid synthetic: superposed
    # rotating Gaussian tubes; params = ((cx,cy,cz, ax,ay,az, sigma), ...)
    q = p * 2.0 - 1.0
    acc = jnp.zeros(q.shape[:-1], jnp.float32)
    for (cx, cy, cz, ax, ay, az, sigma) in params:
        c = jnp.asarray([cx, cy, cz], jnp.float32)
        a = jnp.asarray([ax, ay, az], jnp.float32)
        d = q - c
        dot = jnp.sum(d * a, axis=-1)
        perp = d - dot[..., None] * a
        d2 = jnp.sum(perp * perp, axis=-1)
        acc = acc + jnp.exp(-d2 / (2.0 * sigma * sigma)) * (
            0.75 + 0.25 * jnp.cos(8.0 * dot))
    return jnp.clip(acc, 0.0, 1.0)


def _tube_params(seed: int = 0, n: int = 6) -> tuple:
    rng = np.random.default_rng(seed + 7)
    out = []
    for _ in range(n):
        cx, cy, cz = rng.uniform(-0.5, 0.5, 3)
        a = rng.normal(size=3)
        a = a / (np.linalg.norm(a) + 1e-9)
        sigma = rng.uniform(0.05, 0.15)
        out.append((float(cx), float(cy), float(cz),
                    float(a[0]), float(a[1]), float(a[2]), float(sigma)))
    return tuple(out)


FIELDS = {
    "sphere": _field_sphere,
    "xyz": _field_xyz,
    "wavelet": _field_wavelet,
    "marschner-lobb": _field_marschner_lobb,
    "tubes": _field_tubes,
}


def field_names() -> tuple:
    return tuple(sorted(FIELDS))


@dataclass(frozen=True)
class AnalyticSampler:
    """SamplerAPI drop-in over an analytic field — hashable/static, so
    train steps treat it like a config, not data.

    Mirrors StaticSampler's surface: `sample(key, batch, lower, upper)` and
    `sample_grid(origin, grid_dims, spacing)`; values come from the field
    function instead of a texture gather."""

    kind: str = "wavelet"
    params: tuple = ()  # static field parameters (e.g. tube list)

    @classmethod
    def create(cls, kind: str, seed: int = 0) -> "AnalyticSampler":
        if kind == "tubes":
            return cls(kind=kind, params=_tube_params(seed))
        if kind not in FIELDS:
            raise ValueError(
                f"unknown analytic field {kind!r}; have {field_names()}")
        return cls(kind=kind)

    def evaluate(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Field values at [..., 3] coords in [0,1]³ (traced)."""
        return FIELDS[self.kind](coords, self.params).astype(jnp.float32)

    def sample(self, key: jax.Array, batch: int,
               lower=(0.0, 0.0, 0.0), upper=(1.0, 1.0, 1.0)):
        lower = jnp.asarray(lower, jnp.float32)
        upper = jnp.asarray(upper, jnp.float32)
        u = jax.random.uniform(key, (batch, 3), jnp.float32)
        coords = lower + u * (upper - lower)
        return coords, self.evaluate(coords)[:, None]

    def sample_grid(self, origin, grid_dims, spacing):
        from instantvnr_tpu.data.sampler import grid_coords

        coords = grid_coords(origin, grid_dims, spacing)
        return coords, self.evaluate(coords)[:, None]

    def lattice_grid(self, dims) -> jnp.ndarray:
        """[dz,dy,dx] field values at the decode lattice ((i+0.5)/N) — the
        PSNR/SSIM ground truth for no-GT training (the reference compares
        against vklComputeSample on the same grid coords)."""
        dx, dy, dz = (int(d) for d in dims)
        z, y, x = jnp.meshgrid(
            (jnp.arange(dz, dtype=jnp.float32) + 0.5) / dz,
            (jnp.arange(dy, dtype=jnp.float32) + 0.5) / dy,
            (jnp.arange(dx, dtype=jnp.float32) + 0.5) / dx,
            indexing="ij")
        return self.evaluate(jnp.stack([x, y, z], axis=-1))


def downsample_volume(vol, factor: int):
    """Mean-pooled downsampled grid — the reference's downsampled-grid
    OpenVKL source (`neural_sampler.cpp` OpenVKLSampler(filename, dims,
    downsample)) as a plain Volume transform; train on the result with the
    normal in-core StaticSampler path."""
    from instantvnr_tpu.data.volume import Volume

    data = np.asarray(vol.data if hasattr(vol, "data") else vol)
    f = int(factor)
    dz, dy, dx = data.shape
    cz, cy, cx = dz // f * f, dy // f * f, dx // f * f
    pooled = data[:cz, :cy, :cx].reshape(
        cz // f, f, cy // f, f, cx // f, f).mean(axis=(1, 3, 5))
    return Volume(data=jnp.asarray(pooled, jnp.float32),
                  dims=(cx // f, cy // f, cz // f),
                  original_range=getattr(vol, "original_range", (0.0, 1.0)))
