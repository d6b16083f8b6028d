"""Pallas fused-MLP kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import NetworkConfig
from instantvnr_tpu.ops.mlp import init_mlp_params, mlp_apply
from instantvnr_tpu.ops.pallas.fused_mlp import fused_mlp_apply


class TestFusedMLP:
    @pytest.mark.parametrize("n_out", [1, 4])
    def test_matches_reference(self, n_out):
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=4)
        params = init_mlp_params(jax.random.PRNGKey(0), 64, cfg, n_out)
        x = jax.random.normal(jax.random.PRNGKey(1), (2048, 64))
        ref = mlp_apply(params, x, cfg)  # bf16 compute like the kernel
        got = fused_mlp_apply(params, x, cfg, tile=512, interpret=True)
        assert got.shape == (2048, n_out)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)

    def test_sine_activation(self):
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=2,
                            activation="Sine")
        params = init_mlp_params(jax.random.PRNGKey(2), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(3), (512, 64))
        ref = mlp_apply(params, x, cfg)
        got = fused_mlp_apply(params, x, cfg, tile=512, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)

    def test_differentiable(self):
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=2)
        params = init_mlp_params(jax.random.PRNGKey(4), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(5), (1024, 64))

        def loss(p):
            return jnp.sum(fused_mlp_apply(p, x, cfg, 512, True) ** 2)

        g = jax.grad(loss)(params)
        ref_g = jax.grad(
            lambda p: jnp.sum(mlp_apply(p, x, cfg) ** 2))(params)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.5, rtol=0.1)
