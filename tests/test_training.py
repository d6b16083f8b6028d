import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
    OptimizerConfig,
)
from instantvnr_tpu.data.volume import synthetic_volume
from instantvnr_tpu.models.metrics import (
    decode_volume,
    psnr_arrays,
    psnr_vs,
    ssim_arrays,
)
from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.models.optimizer import lr_at_step
from instantvnr_tpu.models.trainer import (
    create_train_state,
    test_loss as eval_test_loss,
    train_step,
    train_steps,
)


def small_field(**enc_kw):
    enc = dict(n_levels=4, n_features_per_level=4, log2_hashmap_size=14,
               base_resolution=4)
    enc.update(enc_kw)
    cfg = ModelConfig(
        encoding=EncodingConfig(**enc),
        network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
        optimizer=OptimizerConfig(learning_rate=1e-2, decay_start=10_000),
    )
    return NeuralField.from_config(cfg)


class TestLrSchedule:
    def test_exponential_decay(self):
        cfg = OptimizerConfig(learning_rate=1.0, decay_start=2000,
                              decay_interval=1000, decay_base=0.5)
        assert float(lr_at_step(cfg, jnp.int32(100))) == 1.0
        assert float(lr_at_step(cfg, jnp.int32(2000))) == 1.0
        assert float(lr_at_step(cfg, jnp.int32(3000))) == pytest.approx(0.5)
        assert float(lr_at_step(cfg, jnp.int32(5000))) == pytest.approx(0.125)


class TestTraining:
    def test_loss_decreases(self):
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        field = small_field()
        state = create_train_state(jax.random.PRNGKey(0), field)
        l0 = float(eval_test_loss(field, vol.data, state, 4096))
        state = train_steps(field, vol.data, state, 150, 4096)
        l1 = float(eval_test_loss(field, vol.data, state, 4096))
        assert np.isfinite(l1)
        assert l1 < l0 * 0.5, f"loss did not improve: {l0} -> {l1}"

    def test_train_step_equals_train_steps(self):
        """One scan iteration == one explicit step (same RNG stream)."""
        vol = synthetic_volume((16, 16, 16), kind="sphere")
        field = small_field()
        s_a = create_train_state(jax.random.PRNGKey(1), field)
        s_b = create_train_state(jax.random.PRNGKey(1), field)
        s_a = train_step(field, vol.data, s_a, 512)
        s_b = train_steps(field, vol.data, s_b, 1, 512)
        assert np.allclose(s_a.loss, s_b.loss, atol=1e-6)
        for a, b in zip(
            jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)
        ):
            assert np.allclose(a, b, atol=1e-6)

    def test_psnr_after_training(self):
        """Mini end-to-end: 64³ config trains to a sane PSNR on CPU."""
        vol = synthetic_volume((32, 32, 32), kind="vorts")
        field = small_field(n_levels=6, base_resolution=4)
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps(field, vol.data, state, 400, 8192)
        p = float(psnr_vs(field, state.params, vol.data))
        assert p > 22.0, f"PSNR too low: {p}"


class TestMetrics:
    def test_psnr_identical_is_inf_like(self):
        gt = jnp.asarray(np.random.default_rng(0).random((8, 8, 8), np.float32))
        assert float(psnr_arrays(gt, gt)) > 90.0

    def test_psnr_known_value(self):
        gt = jnp.zeros((8, 8, 8)).at[0, 0, 0].set(1.0)
        pred = gt + 0.1
        # range=1, mse=0.01 → psnr = 20
        assert float(psnr_arrays(pred, gt)) == pytest.approx(20.0, abs=1e-3)

    def test_ssim_identical_is_one(self):
        gt = jnp.asarray(np.random.default_rng(0).random((12, 12, 12), np.float32))
        assert float(ssim_arrays(gt, gt)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_matches_numpy_oracle(self):
        # Independent brute-force NumPy SSIM oracle with the reference
        # kernel's semantics (network.cu:474-549: uniform 7³ window, sample
        # covariance N/(N−1), K1=0.01/K2=0.03, mean over crop-valid voxels).
        # skimage.structural_similarity(win_size=7, data_range=1.0) computes
        # the identical quantity; this oracle removes the environment
        # dependency (and its skip) while staying independent of the JAX
        # implementation's separable-convolution evaluation.
        def ssim_oracle(pred, gt, win=7, data_range=1.0):
            c1 = (0.01 * data_range) ** 2
            c2 = (0.03 * data_range) ** 2
            n = win**3
            dz, dy, dx = gt.shape
            vals = []
            for z in range(dz - win + 1):
                for y in range(dy - win + 1):
                    for x in range(dx - win + 1):
                        a = gt[z:z + win, y:y + win, x:x + win].astype(np.float64)
                        b = pred[z:z + win, y:y + win, x:x + win].astype(np.float64)
                        ua, ub = a.mean(), b.mean()
                        va = ((a - ua) ** 2).sum() / (n - 1)
                        vb = ((b - ub) ** 2).sum() / (n - 1)
                        vab = ((a - ua) * (b - ub)).sum() / (n - 1)
                        vals.append(
                            ((2 * ua * ub + c1) * (2 * vab + c2))
                            / ((ua * ua + ub * ub + c1) * (va + vb + c2)))
            return float(np.mean(vals))

        rng = np.random.default_rng(3)
        gt = rng.random((12, 12, 12)).astype(np.float32)
        pred = np.clip(gt + rng.normal(0, 0.1, gt.shape).astype(np.float32), 0, 1)
        ref = ssim_oracle(pred, gt)
        ours = float(ssim_arrays(jnp.asarray(pred), jnp.asarray(gt)))
        assert ours == pytest.approx(ref, abs=2e-3)
        # if skimage happens to be present, cross-check it too
        try:
            from skimage.metrics import structural_similarity
        except ImportError:
            return
        sk = structural_similarity(gt, pred, win_size=7, data_range=1.0)
        assert ours == pytest.approx(sk, abs=2e-3)

    def test_decode_volume_shape(self):
        field = small_field()
        state = create_train_state(jax.random.PRNGKey(0), field)
        out = decode_volume(field, state.params, (16, 8, 32))
        assert out.shape == (32, 8, 16)


class TestFvsrnFamily:
    """The second model family (reference FvsrnNetwork,
    fvsrn_network.cu:1-162) behind the same AbstractNetwork interface:
    trains with the shared trainer, renders through the shared wavefront."""

    def _field(self):
        from instantvnr_tpu.config import NetworkConfig, OptimizerConfig
        from instantvnr_tpu.models.fvsrn import FvsrnConfig, FvsrnField

        return FvsrnField.from_config(FvsrnConfig(
            latent_res=(16, 16, 16), latent_features=8, fourier_bands=6,
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2,
                                  activation="SnakeAlt"),
            optimizer=OptimizerConfig(learning_rate=3e-3, decay_start=10_000),
        ))

    def test_trains_on_shared_trainer(self):
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.models import create_train_state, train_steps
        from instantvnr_tpu.models.metrics import psnr_vs

        field = self._field()
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps(field, vol.data, state, 300, 8192)
        assert float(state.loss) < 0.05
        assert float(psnr_vs(field, state.params, vol.data)) > 25.0

    def test_renders_through_wavefront(self):
        from instantvnr_tpu.accel import macrocell as mcmod
        from instantvnr_tpu.config import TransferFunctionConfig
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.models import create_train_state, train_steps
        from instantvnr_tpu.models.network import render_params
        from instantvnr_tpu.render import (
            RaymarchSettings,
            Renderer,
            make_neural_sample_fn,
        )
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.utils.tfn import bake_transfer_function

        field = self._field()
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps(field, vol.data, state, 100, 4096)
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        r = Renderer(16, 16, mc, tf, make_neural_sample_fn(field),
                     sample_ctx=render_params(state.params, field),
                     settings=RaymarchSettings(n_iters=4, max_supersteps=48))
        r.set_camera(Camera(eye=(5, 3, -60), center=(0, 0, 0), up=(0, 1, 0),
                            fovy=45))
        img = np.asarray(r.render())
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.05  # something rendered
