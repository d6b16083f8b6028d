import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
)
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.serializer import (
    load_checkpoint,
    pack_params,
    save_checkpoint,
    unpack_params,
)
from instantvnr_tpu.utils import bson


class TestBson:
    def test_roundtrip_scalars(self):
        doc = {
            "i": 42,
            "big": 2**40,
            "f": 3.25,
            "s": "hello",
            "b": True,
            "n": None,
        }
        assert bson.decode(bson.encode(doc)) == doc

    def test_roundtrip_nested(self):
        doc = {
            "vol": {"dims": {"x": 64, "y": 32, "z": 16}},
            "arr": [1, 2.5, "three", {"k": False}],
            "bin": bson.Binary(b"\x00\x01\x02\xff" * 10),
        }
        out = bson.decode(bson.encode(doc))
        assert out["vol"] == doc["vol"]
        assert out["arr"] == doc["arr"]
        assert bytes(out["bin"]) == bytes(doc["bin"])

    def test_known_bytes(self):
        # {"a": 1} → canonical BSON bytes
        assert bson.encode({"a": 1}) == bytes.fromhex("0c0000001061000100000000")


def small_setup():
    cfg = ModelConfig(
        encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                log2_hashmap_size=12, base_resolution=4),
        network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
    )
    field = NeuralField.from_config(cfg)
    params = field.init(jax.random.PRNGKey(0))
    return field, params


class TestCheckpoint:
    def test_pack_unpack_roundtrip(self):
        field, params = small_setup()
        blob = pack_params(field, params)
        out = unpack_params(field, blob)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(out)):
            # fp16 storage quantization
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    def test_full_checkpoint_roundtrip(self, tmp_path):
        field, params = small_setup()
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        mc = mcmod.build(vol.data, vol.dims)
        p = tmp_path / "params.bson"
        save_checkpoint(str(p), field, params, mc, vol.dims, step=123,
                        loss=0.5)

        field2, params2, mc2, dims2, meta = load_checkpoint(str(p))
        assert dims2 == (32, 32, 32)
        assert meta["step"] == 123
        assert field2.cfg.encoding == field.cfg.encoding
        assert field2.cfg.network == field.cfg.network
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
        np.testing.assert_allclose(np.asarray(mc.value_lo),
                                   np.asarray(mc2.value_lo), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mc.value_hi),
                                   np.asarray(mc2.value_hi), atol=1e-6)

    def test_loaded_model_renders_without_gt(self, tmp_path):
        """vnrCreateNeuralVolume(params) path: checkpoint → render, no GT."""
        from instantvnr_tpu.config import TransferFunctionConfig
        from instantvnr_tpu.render import (
            RaymarchSettings,
            Renderer,
            make_neural_sample_fn,
        )
        from instantvnr_tpu.utils.tfn import bake_transfer_function

        field, params = small_setup()
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        p = tmp_path / "params.bson"
        save_checkpoint(str(p), field, params, mc, vol.dims)

        field2, params2, mc2, dims2, _ = load_checkpoint(str(p))
        mc2 = mcmod.update_max_opacity(mc2, tf)  # loader recomputes opacity
        r = Renderer(8, 8, mc2, tf, make_neural_sample_fn(field2),
                     sample_ctx=params2,
                     settings=RaymarchSettings(n_iters=4, max_supersteps=32))
        img = np.asarray(r.render())
        assert np.isfinite(img).all()
