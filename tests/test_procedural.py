"""Analytic/procedural no-GT training sources (data/procedural.py) — the
OpenVKL capability class (reference neural_sampler.cpp:714-958): training
and PSNR oracles with no in-core volume anywhere."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import EncodingConfig, ModelConfig, NetworkConfig, OptimizerConfig
from instantvnr_tpu.data.procedural import (
    FIELDS,
    AnalyticSampler,
    downsample_volume,
    field_names,
)


class TestFields:
    @pytest.mark.parametrize("kind", field_names())
    def test_range_and_determinism(self, kind):
        s = AnalyticSampler.create(kind, seed=3)
        key = jax.random.PRNGKey(0)
        c1, v1 = s.sample(key, 2048)
        c2, v2 = s.sample(key, 2048)
        assert c1.shape == (2048, 3) and v1.shape == (2048, 1)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        v = np.asarray(v1)
        assert np.isfinite(v).all()
        assert v.min() >= 0.0 and v.max() <= 1.0 + 1e-6
        assert v.std() > 1e-3  # not a constant field

    def test_sampler_is_static_hashable(self):
        a = AnalyticSampler.create("tubes", seed=1)
        b = AnalyticSampler.create("tubes", seed=1)
        assert a == b and hash(a) == hash(b)  # jit cache key stability

    def test_lattice_grid_matches_pointwise_eval(self):
        s = AnalyticSampler.create("marschner-lobb")
        g = s.lattice_grid((8, 8, 8))
        assert g.shape == (8, 8, 8)
        p = jnp.asarray([[(3 + 0.5) / 8, (1 + 0.5) / 8, (6 + 0.5) / 8]])
        np.testing.assert_allclose(float(g[6, 1, 3]),
                                   float(s.evaluate(p)[0]), rtol=1e-6)

    def test_sample_grid_matches_lattice(self):
        s = AnalyticSampler.create("wavelet")
        dims = (4, 4, 4)
        coords, vals = s.sample_grid((0, 0, 0), dims, (0.25, 0.25, 0.25))
        np.testing.assert_allclose(
            np.asarray(vals[:, 0]).reshape(4, 4, 4),
            np.asarray(s.lattice_grid(dims)), rtol=1e-6)


class TestAnalyticTraining:
    def test_trains_with_no_volume(self):
        """The done-criterion: training converges against the analytic
        sampler alone, PSNR measured against the field's lattice values."""
        from instantvnr_tpu.models import NeuralField, create_train_state
        from instantvnr_tpu.models.metrics import psnr_vs
        from instantvnr_tpu.models.trainer import train_steps_source

        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
            optimizer=OptimizerConfig(learning_rate=1e-2,
                                      decay_start=10_000))
        field = NeuralField.from_config(cfg)
        sampler = AnalyticSampler.create("wavelet")
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps_source(field, sampler, state, 300, 4096)
        assert float(state.loss) < 0.05
        psnr = float(psnr_vs(field, state.params,
                             sampler.lattice_grid((32, 32, 32))))
        assert psnr > 25.0, psnr


class TestDownsample:
    def test_mean_pooling(self):
        from instantvnr_tpu.data.volume import synthetic_volume

        vol = synthetic_volume((16, 16, 16), kind="sphere")
        ds = downsample_volume(vol, 2)
        assert ds.dims == (8, 8, 8)
        want = np.asarray(vol.data).reshape(8, 2, 8, 2, 8, 2).mean((1, 3, 5))
        np.testing.assert_allclose(np.asarray(ds.data), want, atol=1e-6)

    def test_usable_as_training_source(self):
        from instantvnr_tpu.data.volume import synthetic_volume
        from instantvnr_tpu.models import (NeuralField, create_train_state,
                                           train_steps)

        vol = downsample_volume(synthetic_volume((32, 32, 32), "sphere"), 2)
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=3, n_features_per_level=4,
                                    log2_hashmap_size=10, base_resolution=4),
            network=NetworkConfig(n_neurons=16, n_hidden_layers=2))
        field = NeuralField.from_config(cfg)
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps(field, vol.data, state, 60, 2048)
        assert float(state.loss) < 0.2


class TestGridSynthetics:
    @pytest.mark.parametrize("kind", ["wavelet", "xyz", "marschner-lobb",
                                      "tubes"])
    def test_synthetic_volume_accepts_analytic_kinds(self, kind):
        from instantvnr_tpu.data.volume import synthetic_volume

        vol = synthetic_volume((12, 12, 12), kind=kind)
        d = np.asarray(vol.data)
        assert d.shape == (12, 12, 12) and np.isfinite(d).all()
        s = AnalyticSampler.create(kind, seed=0)
        np.testing.assert_allclose(d, np.asarray(s.lattice_grid(
            (12, 12, 12))), atol=1e-6)
