"""API facade surface tests (the reference C API mapping, api.py)."""
import numpy as np
import pytest

from instantvnr_tpu.api import (
    NeuralVolume,
    RenderMode,
    SimpleVolume,
    VNRenderer,
    memory_query,
)
from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
)


@pytest.fixture(scope="module")
def small_model():
    return ModelConfig(
        encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                log2_hashmap_size=12, base_resolution=4),
        network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
    )


@pytest.fixture(scope="module")
def trained(small_model):
    simple = SimpleVolume.synthetic(dims=(32, 32, 32), kind="sphere")
    nv = NeuralVolume(small_model, simple=simple, train_batch=4096)
    nv.train(120)
    return simple, nv


class TestNeuralVolumeApi:
    def test_train_and_metrics(self, trained):
        simple, nv = trained
        stats = nv.statistics()
        assert stats.step == 120
        assert np.isfinite(stats.loss)
        assert nv.get_psnr() > 20
        assert 0.5 < nv.get_mssim() <= 1.0
        assert np.isfinite(nv.get_testing_loss())

    def test_blob_api(self, trained):
        _, nv = trained
        assert nv.n_blobs == 2
        nv.decode_progressive(1)

    def test_checkpoint_roundtrip(self, trained, tmp_path):
        simple, nv = trained
        p = tmp_path / "m.bson"
        nv.save_params(str(p))
        nv2 = NeuralVolume.from_checkpoint(str(p))
        assert nv2.step == nv.step
        assert nv2.dims == nv.dims

    @pytest.mark.parametrize("mode", [
        RenderMode.DECODED_SLAB,
        RenderMode.NEURAL_WAVEFRONT,
        RenderMode.REFERENCE_RAYMARCH,
        RenderMode.REFERENCE_GRADIENT,
        RenderMode.REFERENCE_SSH,
        RenderMode.PATHTRACE_REFERENCE,
    ])
    def test_render_modes(self, trained, mode):
        simple, nv = trained
        subject = nv if "NEURAL" in mode.name or mode.name.startswith(
            "DECODED") else simple
        r = VNRenderer(subject, width=12, height=12, mode=mode)
        r.render()
        img = r.mapframe()
        assert img.shape == (12, 12, 4)
        assert np.isfinite(img).all()

    def test_memory_query(self):
        stats = memory_query()
        assert len(stats) >= 1
