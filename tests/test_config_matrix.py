"""Model-configuration matrix — the TPU analog of the reference's template
instantiation matrix (in-shader volumes instantiated for WIDTH∈{16,32,64} ×
N_FEATURES_PER_LEVEL∈{1,2,4,8}, `tcnn_impl.cu:505-516`, dispatch
`method_raymarching.cu:1181-1247`).

Here the matrix is config-driven rather than template-instantiated: one traced
program per (width, features) pair. Every cell of the matrix must train,
infer, and produce finite, loss-decreasing results through the same code path
the defaults use.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
)
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps


def _field(width: int, feats: int) -> NeuralField:
    cfg = ModelConfig(
        encoding=EncodingConfig(n_levels=4, n_features_per_level=feats,
                                log2_hashmap_size=8, base_resolution=4),
        network=NetworkConfig(n_neurons=width, n_hidden_layers=2),
    )
    return NeuralField.from_config(cfg)


VOL = synthetic_volume((16, 16, 16), kind="vorts")


@pytest.mark.parametrize("width", [16, 32, 64])
@pytest.mark.parametrize("feats", [1, 2, 4, 8])
def test_matrix_trains_and_infers(width, feats):
    field = _field(width, feats)
    assert field.spec.n_output_dims == 4 * feats

    state = create_train_state(jax.random.PRNGKey(0), field)
    state0 = train_steps(field, VOL.data, state, 2, 512)
    loss0 = float(state0.loss)
    state1 = train_steps(field, VOL.data, state0, 30, 512)
    loss1 = float(state1.loss)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # tiny model on a tiny volume learns immediately

    coords = jax.random.uniform(jax.random.PRNGKey(1), (257, 3), jnp.float32)
    out = field.apply(state1.params, coords)
    assert out.shape == (257, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wide_mlp_128():
    """Widths beyond the reference's template set (128) also just work —
    config-driven dispatch has no instantiation ceiling."""
    field = _field(128, 2)
    state = create_train_state(jax.random.PRNGKey(0), field)
    state = train_steps(field, VOL.data, state, 5, 256)
    assert np.isfinite(float(state.loss))
