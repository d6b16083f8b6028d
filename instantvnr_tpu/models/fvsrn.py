"""fV-SRN scene-representation network — the second model family.

TPU-native counterpart of the reference's `FvsrnNetwork`
(`core/networks/fvsrn_network.cu:1-162`, `fvsrn_network.h:20-57`): a volume
field built from a dense LATENT GRID (trilinearly interpolated feature
volume) + FOURIER position features + an MLP with the SnakeAlt periodic
activation — the architecture of Weiss et al.'s fV-SRN, which the reference
wraps as an inference adapter behind its AbstractNetwork interface
(`tcnn_network.h:70-95`).

Differences by design: the reference only *loads* externally-trained volnet
binaries and evaluates them with tensor-core kernels; there is no volnet
trainer on TPU hosts, so this module implements the architecture natively —
trainable with the shared trainer (same Adam/loss/params-pytree protocol as
the hash-grid field) and renderable through the same `make_neural_sample_fn`
wavefront path. That realizes the AbstractNetwork swap the reference's
class hierarchy promises: every consumer sees only (field, params).

TPU mapping: the latent-grid gather is 8 rows/sample from a small dense
table (issue-bound like the hash gather but 8× fewer rows than 8 hash
levels); the fourier features are pure VPU; the wide MLP (64–256 neurons)
is MXU-dominant — fV-SRN shifts work from memory (gathers) to FLOPs
(matmuls), which suits the MXU/HBM balance of TPUs even better than GPUs.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import LossConfig, NetworkConfig, OptimizerConfig
from instantvnr_tpu.ops.mlp import init_mlp_params, mlp_apply


@dataclass(frozen=True)
class FvsrnConfig:
    """Architecture knobs (fvsrn Defines: grid resolution/channels, fourier
    count, hidden width — fvsrn_network.cu:85-130 consumes the same set)."""

    latent_res: tuple[int, int, int] = (32, 32, 32)  # (x, y, z)
    latent_features: int = 16
    fourier_bands: int = 14  # per-axis sin/cos pairs, log-linear frequencies
    network: NetworkConfig = dfield(default_factory=lambda: NetworkConfig(
        n_neurons=64, n_hidden_layers=4, activation="SnakeAlt"))
    optimizer: OptimizerConfig = dfield(default_factory=OptimizerConfig)
    loss: LossConfig = dfield(default_factory=LossConfig)
    compute_dtype: str = "bfloat16"

    def __post_init__(self):
        # trilinear cells need 2 nodes per axis: _latent_interp clamps the
        # cell index to res-2, which would wrap to -1 (garbage gathers,
        # misrouted gradients) for a res-1 axis
        if min(self.latent_res) < 2:
            raise ValueError(
                f"latent_res must be >= 2 per axis, got {self.latent_res}")


@dataclass(frozen=True)
class FvsrnField:
    """Static field description; hashable (safe as a jit static arg)."""

    cfg: FvsrnConfig

    @classmethod
    def from_config(cls, cfg: FvsrnConfig | None = None) -> "FvsrnField":
        return cls(cfg=cfg or FvsrnConfig())

    @property
    def n_input_dims(self) -> int:
        return 3

    @property
    def n_output_dims(self) -> int:
        return 1

    @property
    def n_latent(self) -> int:
        rx, ry, rz = self.cfg.latent_res
        return rx * ry * rz

    @property
    def mlp_input_dims(self) -> int:
        return self.cfg.latent_features + 6 * self.cfg.fourier_bands

    def init(self, key: jax.Array) -> dict:
        k_grid, k_mlp = jax.random.split(key)
        # small-normal latent init (SRN latent grids start near zero)
        table = 1e-2 * jax.random.normal(
            k_grid, (self.n_latent, self.cfg.latent_features), jnp.float32)
        mlp = init_mlp_params(k_mlp, n_input=self.mlp_input_dims,
                              cfg=self.cfg.network, n_output=1)
        return {"table": table, "mlp": mlp}

    # duck-typed hook consumed by models.network.network_apply — the
    # AbstractNetwork dispatch point
    def apply_params(self, params: dict, coords: jnp.ndarray) -> jnp.ndarray:
        """coords [B,3] in [0,1]³ → values [B,1] float32.

        Imported checkpoints (models/fvsrn_import.py) may carry two extra
        pytree entries the natively-trained params don't have:
          "fourier": [M, 3] frequency matrix → features
                     [sin(2π·F·p), cos(2π·F·p)] replace the default
                     log-linear bands;
          "bias":    per-layer bias vectors (torch nn.Linear has biases;
                     the native/tcnn-convention MLP does not).
        """
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        lat = _latent_interp(params["table"], coords, self.cfg.latent_res,
                             self.cfg.latent_features)
        if "fourier" in params:
            four = _fourier_matrix_features(coords, params["fourier"])
        else:
            four = _fourier_features(coords, self.cfg.fourier_bands)
        x = jnp.concatenate([lat, four], axis=-1)
        if "bias" in params:
            return _mlp_apply_bias(params["mlp"], params["bias"], x,
                                   self.cfg.network, compute_dtype)
        return mlp_apply(params["mlp"], x, self.cfg.network,
                         compute_dtype=compute_dtype)

    def apply(self, params: dict, coords: jnp.ndarray) -> jnp.ndarray:
        return self.apply_params(params, coords)

    @property
    def n_params(self) -> int:
        from instantvnr_tpu.ops.mlp import mlp_n_params

        return (self.n_latent * self.cfg.latent_features
                + mlp_n_params(self.cfg.network, self.mlp_input_dims, 1))


def _latent_interp(table: jnp.ndarray, coords: jnp.ndarray,
                   res: tuple[int, int, int], f: int) -> jnp.ndarray:
    """Trilinear interpolation of the dense latent grid.

    Grid nodes span [0,1] inclusive (SRN object-space convention:
    interpolationInObjectSpace=false ⇒ normalized coords,
    fvsrn_network.cu:22-27). ONE fused 8-corner gather like the hash path.
    """
    rx, ry, rz = res
    rf = jnp.array([rx - 1, ry - 1, rz - 1], jnp.float32)
    x = jnp.clip(coords, 0.0, 1.0) * rf
    cell = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                    jnp.array([rx - 2, ry - 2, rz - 2], jnp.int32))
    frac = x - cell.astype(jnp.float32)
    corners = jnp.asarray(
        np.array([[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1]
                  for c in range(8)], np.int32))
    pos = cell[:, None, :] + corners[None, :, :]  # [B,8,3]
    idx = (pos[..., 2] * ry + pos[..., 1]) * rx + pos[..., 0]
    cw = jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :],
                   frac[:, None, :])
    w = cw[..., 0] * cw[..., 1] * cw[..., 2]  # [B,8]
    feats = table[idx] * w[..., None]  # [B,8,F]
    return feats.sum(axis=1)


def _fourier_matrix_features(coords: jnp.ndarray,
                             fmat: jnp.ndarray) -> jnp.ndarray:
    """Fourier features from an explicit frequency matrix F [M, 3]
    (imported fV-SRN checkpoints carry the trained/constructed matrix):
    [sin(2π·F·p), cos(2π·F·p)] over raw [0,1] coords → [B, 2M]."""
    ang = 2.0 * math.pi * (coords @ fmat.T)  # [B, M]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _mlp_apply_bias(weights: list, biases: list, x: jnp.ndarray,
                    cfg: NetworkConfig, compute_dtype) -> jnp.ndarray:
    """mlp_apply with per-layer biases (torch nn.Linear convention, for
    imported fV-SRN checkpoints; the native path is bias-free like tcnn).
    weights: [in, out] per layer; biases: [out] per layer."""
    from instantvnr_tpu.ops.mlp import _activation

    act = _activation(cfg.activation)
    out_act = _activation(cfg.output_activation)
    precision = (None if compute_dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    h = x.astype(compute_dtype)
    for w, b in zip(weights[:-1], biases[:-1]):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                    precision=precision) + b.astype(jnp.float32)
        h = act(h).astype(compute_dtype)
    y = jnp.dot(h, weights[-1].astype(compute_dtype),
                preferred_element_type=jnp.float32,
                precision=precision) + biases[-1].astype(jnp.float32)
    return out_act(y)


def _fourier_features(coords: jnp.ndarray, bands: int) -> jnp.ndarray:
    """NeRF-style log-linear fourier features over [-1,1]-mapped positions:
    sin/cos(2^i·π·p) per axis — fV-SRN's default fourier matrix."""
    p = 2.0 * coords - 1.0  # [B,3]
    freqs = jnp.asarray([2.0 ** i * math.pi for i in range(bands)],
                        jnp.float32)
    ang = p[:, :, None] * freqs[None, None, :]  # [B,3,bands]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return out.reshape(coords.shape[0], 6 * bands)
