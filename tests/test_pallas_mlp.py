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

    def test_output_activation_honored(self):
        """Regression: the kernel must apply cfg.output_activation (round 1
        silently ignored it)."""
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=2,
                            output_activation="Squareplus")
        params = init_mlp_params(jax.random.PRNGKey(6), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(7), (512, 64))
        ref = mlp_apply(params, x, cfg)
        got = fused_mlp_apply(params, x, cfg, tile=512, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)
        assert (np.asarray(got) > 0).all()  # squareplus is positive

    @pytest.mark.parametrize("b", [100, 1000, 1025])
    def test_unaligned_batch_padded(self, b):
        """Off-tile batches run through the kernel via padding, never a
        silent XLA fallback."""
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=2)
        params = init_mlp_params(jax.random.PRNGKey(8), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(9), (b, 64))
        ref = mlp_apply(params, x, cfg)
        got = fused_mlp_apply(params, x, cfg, tile=512, interpret=True)
        assert got.shape == (b, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-2, rtol=3e-2)

    def test_backward_matches_reference_grads(self):
        """The residual-reusing backward equals XLA autodiff of the same
        bf16 forward (both for params and for the input — the input grad
        feeds the hash-encoding scatter)."""
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=3)
        params = init_mlp_params(jax.random.PRNGKey(10), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(11), (1024, 64))

        def loss_fused(p, xx):
            return jnp.sum(fused_mlp_apply(p, xx, cfg, 512, True) ** 2)

        def loss_ref(p, xx):
            return jnp.sum(mlp_apply(p, xx, cfg) ** 2)

        gp, gx = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        for a, b_ in zip(gp, rp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=0.35, rtol=0.05)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   atol=0.35, rtol=0.05)

    def test_sine_backward(self):
        """Sine needs the PRE-activation in the backward — exercises the
        saved-z path specifically."""
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=2,
                            activation="Sine")
        params = init_mlp_params(jax.random.PRNGKey(12), 64, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(13), (512, 64))
        g = jax.grad(lambda p: jnp.sum(
            fused_mlp_apply(p, x, cfg, 512, True) ** 2))(params)
        r = jax.grad(lambda p: jnp.sum(mlp_apply(p, x, cfg) ** 2))(params)
        for a, b_ in zip(g, r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=0.35, rtol=0.05)
