"""OpenVDB ingestion (data/vdb.py): round-trip fixtures across the
compression matrix, sparse/active-mask semantics, strict-failure contract,
and the .vdb → train → PSNR flow (reference OpenVKLSampler VDB loader,
neural_sampler.cpp:756-770)."""
import struct

import numpy as np
import pytest

from instantvnr_tpu.data import vdb as vdbmod
from instantvnr_tpu.data.vdb import (
    VdbError,
    read_vdb,
    read_vdb_grids,
    vdb_to_volume,
    write_vdb,
)


def _field(dims=(48, 40, 33), seed=0):
    rng = np.random.default_rng(seed)
    dz, dy, dx = dims
    z, y, x = np.meshgrid(np.linspace(0, 1, dz), np.linspace(0, 1, dy),
                          np.linspace(0, 1, dx), indexing="ij")
    return (np.sin(7 * x) * np.cos(5 * y) * z
            + 0.1 * rng.random(dims)).astype(np.float32)


class TestRoundTrip:
    @pytest.mark.parametrize("compression", ["none", "zip", "zip+mask"])
    def test_dense_roundtrip_bitexact(self, tmp_path, compression):
        data = _field()
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data, compression=compression)
        dense, info = read_vdb(p)
        assert info.name == "density"
        assert info.file_version == 224
        assert info.bbox_min == (0, 0, 0)
        assert info.bbox_max == (32, 39, 47)  # (x, y, z) inclusive
        np.testing.assert_array_equal(dense, data)

    def test_non_aligned_dims_and_multiple_root_children(self, tmp_path):
        # > 4096 voxels along x would need 2 root children; keep the test
        # cheap by exercising the l2/leaf partial-coverage logic instead
        data = _field((9, 130, 67), seed=3)
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data, compression="zip")
        dense, info = read_vdb(p)
        np.testing.assert_array_equal(dense, data)

    def test_sparse_active_mask_drops_background(self, tmp_path):
        data = np.zeros((64, 64, 64), np.float32)
        data[10:20, 12:22, 30:40] = 2.5  # one active blob
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data, compression="zip+mask", active_threshold=0.5)
        dense, info = read_vdb(p)
        # bbox is the exact active-voxel box of the blob
        assert info.bbox_min == (30, 12, 10)
        assert info.bbox_max == (39, 21, 19)
        assert dense.shape == (10, 10, 10)
        np.testing.assert_array_equal(dense, 2.5)
        # inactive voxels in stored leaves decode as background: widen the
        # bbox metadata by hand and confirm the border reads 0.0
        raw = bytearray(open(p, "rb").read())
        i = raw.find(b"file_bbox_min")
        struct.pack_into("<3i", raw, i + len(b"file_bbox_min") + 4 + 5 + 4,
                         28, 10, 8)
        q = str(tmp_path / "wide.vdb")
        open(q, "wb").write(bytes(raw))
        dense2, info2 = read_vdb(q)
        assert info2.bbox_min == (28, 10, 8)
        assert dense2[0, 0, 0] == 0.0  # inactive corner = background
        np.testing.assert_array_equal(dense2[2:, 2:, 2:], 2.5)

    def test_background_value_fills_outside(self, tmp_path):
        data = np.full((16, 16, 16), 7.0, np.float32)
        data[0, 0, 0] = 9.0
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data, background=3.25, compression="none")
        dense, info = read_vdb(p)
        assert info.background == 3.25
        np.testing.assert_array_equal(dense, data)

    def test_grid_selection_by_name_errors(self, tmp_path):
        p = str(tmp_path / "t.vdb")
        write_vdb(p, _field((8, 8, 8)), name="temperature")
        with pytest.raises(VdbError, match="no grid named"):
            read_vdb(p, grid="density")
        dense, info = read_vdb(p, grid="temperature")
        assert info.name == "temperature"

    def test_voxel_size_in_transform(self, tmp_path):
        p = str(tmp_path / "t.vdb")
        write_vdb(p, _field((8, 8, 8)), voxel_size=0.125)
        _, info = read_vdb(p)
        np.testing.assert_allclose(info.voxel_size, (0.125,) * 3)


class TestStrictness:
    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.vdb"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(VdbError, match="magic"):
            read_vdb_grids(str(p))

    def test_truncated(self, tmp_path):
        p = str(tmp_path / "t.vdb")
        write_vdb(p, _field((8, 8, 8)))
        raw = open(p, "rb").read()
        q = tmp_path / "trunc.vdb"
        q.write_bytes(raw[: len(raw) // 2])
        with pytest.raises(VdbError, match="truncated"):
            read_vdb_grids(str(q))

    def test_unsupported_version(self, tmp_path):
        p = str(tmp_path / "t.vdb")
        write_vdb(p, _field((8, 8, 8)))
        raw = bytearray(open(p, "rb").read())
        raw[8:12] = struct.pack("<I", 219)
        q = tmp_path / "old.vdb"
        q.write_bytes(raw)
        with pytest.raises(VdbError, match="version 219"):
            read_vdb_grids(str(q))

    def test_blosc_refused_loudly(self, tmp_path):
        p = str(tmp_path / "t.vdb")
        write_vdb(p, _field((8, 8, 8)), compression="none")
        raw = bytearray(open(p, "rb").read())
        # flip the per-grid compression word (right at grid_pos) to BLOSC
        grid_pos = None
        # find it via the descriptor offsets: re-parse minimally
        idx = raw.find(b"Tree_float_5_4_3")
        off = idx + len(b"Tree_float_5_4_3") + 4  # + empty parent string
        grid_pos = struct.unpack_from("<q", raw, off)[0]
        struct.pack_into("<I", raw, grid_pos, vdbmod.COMPRESS_BLOSC)
        q = tmp_path / "blosc.vdb"
        q.write_bytes(raw)
        with pytest.raises(VdbError, match="BLOSC"):
            read_vdb_grids(str(q))


class TestVolumeFlow:
    def test_vdb_to_volume_normalizes(self, tmp_path):
        data = _field((20, 24, 28)) * 100.0 - 30.0
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data)
        vol = vdb_to_volume(p)
        assert vol.dims == (28, 24, 20)
        a = np.asarray(vol.data)
        assert a.min() == 0.0 and abs(a.max() - 1.0) < 1e-6
        np.testing.assert_allclose(vol.original_range,
                                   (data.min(), data.max()), rtol=1e-6)

    def test_train_on_vdb(self, tmp_path):
        """--volume foo.vdb trains and reaches a sane PSNR (the VERDICT's
        done-bar for the OpenVKL VDB source class)."""
        import dataclasses

        import jax

        from instantvnr_tpu.config import (EncodingConfig, ModelConfig,
                                           NetworkConfig)
        from instantvnr_tpu.models import (NeuralField, create_train_state,
                                           train_steps)
        from instantvnr_tpu.models.metrics import psnr_vs

        data = np.clip(_field((32, 32, 32), seed=5), 0, None)
        p = str(tmp_path / "t.vdb")
        write_vdb(p, data, compression="zip+mask", active_threshold=0.05)
        vol = vdb_to_volume(p)
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12,
                                    base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2))
        field = NeuralField.from_config(cfg)
        st = create_train_state(jax.random.PRNGKey(0), field)
        st = train_steps(field, vol.data, st, 150, 8192)
        db = float(psnr_vs(field, st.params, vol.data))
        assert db > 25.0, db
