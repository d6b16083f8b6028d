import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import EncodingConfig, NetworkConfig
from instantvnr_tpu.ops.hash_encoding import (
    HashGridSpec,
    corner_indices_and_weights,
    hash_encode,
    init_hash_table,
)
from instantvnr_tpu.ops.mlp import init_mlp_params, mlp_apply
from instantvnr_tpu.ops.trilinear import (
    sample_volume,
    sample_volume_tex,
    sample_volume_voxel,
)


class TestTrilinear:
    def test_voxel_centers_exact(self):
        """Sampling exactly at voxel centers returns the voxel values."""
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((5, 6, 7)).astype(np.float32))
        iz, iy, ix = 2, 3, 4
        p = jnp.array([[ix + 0.5, iy + 0.5, iz + 0.5]], jnp.float32)
        v = sample_volume_voxel(vol, p)
        assert np.allclose(v, vol[iz, iy, ix], atol=1e-6)

    def test_midpoint_interpolation(self):
        vol = jnp.zeros((2, 2, 2), jnp.float32).at[0, 0, 1].set(1.0)
        # midpoint between voxel (0,0,0) and (1,0,0) centers on x axis
        p = jnp.array([[1.0, 0.5, 0.5]], jnp.float32)
        v = sample_volume_voxel(vol, p)
        assert np.allclose(v, 0.5, atol=1e-6)

    def test_clamp_addressing(self):
        vol = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2)
        v_out = sample_volume_voxel(vol, jnp.array([[-5.0, -5.0, -5.0]]))
        assert np.allclose(v_out, vol[0, 0, 0])
        v_out = sample_volume_voxel(vol, jnp.array([[99.0, 99.0, 99.0]]))
        assert np.allclose(v_out, vol[1, 1, 1])

    def test_cell_centered_remap_corners(self):
        """With the renderer remap, p=0 hits voxel 0's center exactly
        (raytracing.h:105-110)."""
        rng = np.random.default_rng(1)
        vol = jnp.asarray(rng.random((4, 4, 4)).astype(np.float32))
        v0 = sample_volume(vol, jnp.array([[0.0, 0.0, 0.0]]))
        v1 = sample_volume(vol, jnp.array([[1.0, 1.0, 1.0]]))
        assert np.allclose(v0, vol[0, 0, 0], atol=1e-6)
        assert np.allclose(v1, vol[3, 3, 3], atol=1e-6)

    def test_tex_vs_scipy(self):
        """Direct-tex sampling matches scipy map_coordinates on interior."""
        from scipy.ndimage import map_coordinates

        rng = np.random.default_rng(2)
        vol_np = rng.random((8, 9, 10)).astype(np.float32)
        vol = jnp.asarray(vol_np)
        pts = rng.uniform(0.2, 0.8, (64, 3)).astype(np.float32)
        ours = np.asarray(sample_volume_tex(vol, jnp.asarray(pts)))
        dims = np.array([10, 9, 8], np.float32)
        voxel = pts * dims - 0.5  # x,y,z order
        ref = map_coordinates(
            vol_np, [voxel[:, 2], voxel[:, 1], voxel[:, 0]], order=1, mode="nearest"
        )
        assert np.allclose(ours, ref, atol=1e-5)


class TestHashEncoding:
    def spec(self, **kw):
        defaults = dict(n_levels=4, n_features_per_level=2,
                        log2_hashmap_size=12, base_resolution=4)
        defaults.update(kw)
        return HashGridSpec.from_config(EncodingConfig(**defaults))

    def test_layout(self):
        spec = self.spec()
        # scales: 2^l*4-1 → 3,7,15,31; resolutions 4,8,16,32
        assert spec.resolutions == (4, 8, 16, 32)
        # sizes: min(res³, 4096) next_multiple 8 → 64, 512, 4096, 4096
        assert spec.level_sizes == (64, 512, 4096, 4096)
        assert spec.level_is_dense == (True, True, True, False)
        assert spec.level_offsets == (0, 64, 576, 4672, 8768)

    def test_output_shape_and_grad(self):
        spec = self.spec()
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        out = hash_encode(table, coords, spec)
        assert out.shape == (32, spec.n_output_dims)

        # gradient w.r.t. table flows (scatter-add path)
        g = jax.grad(lambda t: hash_encode(t, coords, spec).sum())(table)
        assert g.shape == table.shape
        assert float(jnp.abs(g).sum()) > 0

    def test_dense_level_interpolation(self):
        """On a dense level, encoding == trilinear interp of table entries."""
        spec = self.spec(n_levels=1, base_resolution=4)
        assert spec.level_is_dense == (True,)
        table = jax.random.normal(jax.random.PRNGKey(2), (spec.n_entries, 2))
        # lattice points satisfy p·scale + 0.5 = integer → p = (k−0.5)/scale
        scale = spec.scales[0]  # 3.0
        p = jnp.array([[0.5 / scale, 1.5 / scale, 0.5 / scale]], jnp.float32)
        out = hash_encode(table, p, spec)
        res = spec.resolutions[0]
        idx = 1 + 2 * res + 1 * res * res
        assert np.allclose(out[0], table[idx], atol=1e-5)

    def test_corner_weights_sum_to_one(self):
        spec = self.spec()
        coords = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))
        idx, w = corner_indices_and_weights(spec, coords)
        w = w.reshape(16, spec.n_levels, 8)
        assert np.allclose(w.sum(-1), 1.0, atol=1e-5)
        assert idx.min() >= 0 and idx.max() < spec.n_entries

    def test_hash_matches_reference_formula(self):
        """Hashed level indices follow the tcnn prime-XOR formula."""
        spec = self.spec()
        lvl = 3  # hashed level, res 32
        coords = jnp.array([[0.37, 0.81, 0.12]], jnp.float32)
        idx, _ = corner_indices_and_weights(spec, coords)
        idx = np.asarray(idx).reshape(spec.n_levels, 8)[lvl]
        scale = spec.scales[lvl]
        cell = np.floor(np.array([0.37, 0.81, 0.12]) * scale + 0.5).astype(np.uint32)
        expect = []
        for c in range(8):
            p = cell + np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1], np.uint32)
            h = (
                p[0] * np.uint32(1)
                ^ p[1] * np.uint32(2654435761)
                ^ p[2] * np.uint32(805459861)
            )
            expect.append(int(h % np.uint32(spec.level_sizes[lvl])) + spec.level_offsets[lvl])
        assert list(idx) == expect


class TestMLP:
    def test_shapes_and_no_bias(self):
        cfg = NetworkConfig(n_neurons=64, n_hidden_layers=4)
        params = init_mlp_params(jax.random.PRNGKey(0), 64, cfg, 1)
        # n_hidden_layers+1 = 5 weight matrices, no biases
        assert len(params) == 5
        assert params[0].shape == (64, 64)
        assert params[-1].shape == (64, 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
        y = mlp_apply(params, x, cfg)
        assert y.shape == (128, 1)
        assert y.dtype == jnp.float32

    def test_matches_manual_forward(self):
        cfg = NetworkConfig(n_neurons=16, n_hidden_layers=2)
        params = init_mlp_params(jax.random.PRNGKey(0), 8, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        y = mlp_apply(params, x, cfg, compute_dtype=jnp.float32)
        h = np.asarray(x)
        ws = [np.asarray(w) for w in params]
        for w in ws[:-1]:
            h = np.maximum(h @ w, 0)
        ref = h @ ws[-1]
        assert np.allclose(np.asarray(y), ref, atol=1e-4)

    def test_relu_grad_flows(self):
        cfg = NetworkConfig(n_neurons=16, n_hidden_layers=2)
        params = init_mlp_params(jax.random.PRNGKey(0), 8, cfg, 1)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
        g = jax.grad(lambda p: mlp_apply(p, x, cfg).sum())(params)
        assert all(float(jnp.abs(gi).sum()) > 0 for gi in g)


class TestEncodingNumpyOracle:
    def test_matches_independent_numpy_implementation(self):
        """Full encoding vs a from-scratch NumPy reimplementation of the
        tcnn semantics (scale/fract/dense-vs-hash/trilinear blend) — an
        independent oracle, not a refactor of the JAX code."""
        spec = HashGridSpec.from_config(EncodingConfig(
            n_levels=5, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=3, per_level_scale=1.7))
        table = np.asarray(init_hash_table(jax.random.PRNGKey(5), spec))
        pts = np.random.default_rng(6).random((40, 3)).astype(np.float32)

        out = np.asarray(hash_encode(jnp.asarray(table), jnp.asarray(pts),
                                     spec, compute_dtype=jnp.float32))

        import math
        expect = np.zeros((40, spec.n_levels * spec.n_features), np.float32)
        for lvl in range(spec.n_levels):
            scale = 2.0 ** (lvl * math.log2(spec.per_level_scale)) \
                * spec.base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            size = spec.level_sizes[lvl]
            off = spec.level_offsets[lvl]
            dense = res ** 3 <= size
            for i, p in enumerate(pts):
                x = p * scale + 0.5
                cell = np.floor(x).astype(np.int64)
                frac = x - cell
                acc = np.zeros(spec.n_features, np.float32)
                for c in range(8):
                    ofs = np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1])
                    corner = cell + ofs
                    if dense:
                        idx = corner[0] + corner[1] * res + corner[2] * res * res
                    else:
                        # wrapping u32 arithmetic via Python ints mod 2^32
                        # (plain np.uint32 multiplies emit overflow warnings)
                        idx = ((int(corner[0]) * 1)
                               ^ (int(corner[1]) * 2654435761) & 0xFFFFFFFF
                               ^ (int(corner[2]) * 805459861) & 0xFFFFFFFF)
                    idx = int(idx % size) + off
                    w = np.prod(np.where(ofs == 0, 1.0 - frac, frac))
                    acc += np.float32(w) * table[idx]
                expect[i, lvl * spec.n_features:(lvl + 1) * spec.n_features] = acc
        np.testing.assert_allclose(out, expect, atol=1e-5)


class TestSplatBackward:
    """Dense-level separable-splat backward ≡ XLA scatter-add autodiff
    (hash_encoding.hash_encode_splat), including the dense out-of-row corner
    aliasing and % size wrap that tcnn's forward indexing implies."""

    @pytest.mark.parametrize("log2", [6, 14])
    def test_grad_matches_autodiff(self, log2):
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode,
            hash_encode_splat,
            init_hash_table,
        )

        spec = HashGridSpec.from_config(
            EncodingConfig(n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=log2, base_resolution=4))
        assert any(spec.level_is_dense) and (
            not all(spec.level_is_dense) or log2 == 14)
        key = jax.random.PRNGKey(3)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(key, (257, 3), jnp.float32)
        # weighted sum loss so every output position has a distinct cotangent
        w = jax.random.normal(jax.random.PRNGKey(4),
                              (257, spec.n_output_dims))

        def loss(enc):
            return lambda t: jnp.sum(enc(t, coords, spec) * w)

        g_ref = jax.grad(loss(hash_encode))(table)
        g_new = jax.grad(loss(hash_encode_splat))(table)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)

    def test_dense_grads_match_f64_oracle_at_train_batch(self):
        """Both dense-level backwards (splat ≤res32, scatter above) vs a
        float64 NumPy oracle at the PRODUCTION batch size (B=2^16) on the
        reference 2^19 dense layout (res 16/32/64). Guards the r5 finding:
        the one-shot HIGHEST splat matmul at K=2^16 silently produced
        full-magnitude wrong entries on v5e; the fix is K-chunked
        accumulation (scratch/splat_matmul_bug.py) and this oracle is the
        regression net (decisive on TPU runs; on CPU it pins algorithm
        correctness at scale)."""
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops import hash_encoding as he

        spec = he.HashGridSpec.from_config(
            EncodingConfig(n_levels=3, n_features_per_level=2,
                           log2_hashmap_size=19, base_resolution=16,
                           per_level_scale=2.0))
        assert spec.resolutions == (16, 32, 64)
        assert all(spec.level_is_dense)
        b = 1 << 16
        coords = jax.random.uniform(jax.random.PRNGKey(1), (b, 3))
        g = jax.random.normal(jax.random.PRNGKey(2), (b, 2))
        idx, w = he.corner_indices_and_weights(spec, coords)
        idxn = np.asarray(idx).reshape(b, 3, 8)
        wn = np.asarray(w, np.float64).reshape(b, 3, 8)
        gn = np.asarray(g, np.float64)
        for l, fn in ((0, he._dense_level_grad_splat),
                      (1, he._dense_level_grad_splat),
                      (2, he._dense_level_grad_scatter)):
            o, s = spec.level_offsets[l], spec.level_sizes[l]
            ref = np.zeros((s, 2), np.float64)
            np.add.at(ref, (idxn[:, l] - o).reshape(-1),
                      (wn[:, l, :, None] * gn[:, None, :]).reshape(-1, 2))
            got = np.asarray(jax.jit(
                lambda c, gg, l=l, fn=fn: fn(spec, l, c, gg))(coords, g))
            np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4,
                                       err_msg=f"level {l}")

    def test_forward_identical(self):
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode,
            hash_encode_splat,
            init_hash_table,
        )

        spec = HashGridSpec.from_config(
            EncodingConfig(n_levels=3, n_features_per_level=2,
                           log2_hashmap_size=8, base_resolution=4))
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(key, (64, 3), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(hash_encode_splat(table, coords, spec)),
            np.asarray(hash_encode(table, coords, spec)))

    def test_precast_gather_bit_identical(self, monkeypatch):
        """Big-table forwards cast the f32 table to the 16-bit compute
        dtype BEFORE the gather (half the gathered bytes, hash_encoding.py
        _precast_for_gather). The cast commutes with the gather, so the
        output must be BIT-identical to the gather-then-cast path for both
        hash variants."""
        import instantvnr_tpu.ops.hash_encoding as he
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode,
            init_hash_table,
        )

        key = jax.random.PRNGKey(3)
        for variant in ("tcnn", "paired"):
            spec = HashGridSpec.from_config(
                EncodingConfig(n_levels=3, n_features_per_level=2,
                               log2_hashmap_size=8, base_resolution=4,
                               hash_variant=variant))
            table = init_hash_table(key, spec)
            coords = jax.random.uniform(key, (64, 3), jnp.float32)
            monkeypatch.setattr(he, "_PRECAST_MIN_BYTES", 1 << 60)
            ref = np.asarray(hash_encode(table, coords, spec,
                                         compute_dtype=jnp.bfloat16))
            monkeypatch.setattr(he, "_PRECAST_MIN_BYTES", 0)
            got = np.asarray(hash_encode(table, coords, spec,
                                         compute_dtype=jnp.bfloat16))
            np.testing.assert_array_equal(got, ref)
            # f32 compute never casts, gate or not
            f32 = np.asarray(hash_encode(table, coords, spec,
                                         compute_dtype=jnp.float32))
            assert f32.dtype == np.float32

    def test_coords_grad_matches_scatter_path(self):
        """The splat path must give the SAME position gradients as the
        plain autodiff path (consumers that differentiate through sample
        positions must not silently get zeros on TPU configs)."""
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode,
            hash_encode_splat,
            init_hash_table,
        )

        spec = HashGridSpec.from_config(
            EncodingConfig(n_levels=3, n_features_per_level=2,
                           log2_hashmap_size=8, base_resolution=4))
        key = jax.random.PRNGKey(1)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(key, (97, 3), jnp.float32,
                                    minval=0.05, maxval=0.95)
        w = jax.random.normal(jax.random.PRNGKey(5),
                              (97, spec.n_output_dims))
        g_ref = jax.grad(lambda c: jnp.sum(hash_encode(table, c, spec) * w))(
            coords)
        g_new = jax.grad(
            lambda c: jnp.sum(hash_encode_splat(table, c, spec) * w))(coords)
        assert float(jnp.abs(g_ref).max()) > 0  # nontrivial gradients
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)


class TestPackedEncode:
    """Corner-packed dense-level inference gathers (hash_encoding.py notes):
    one [size, 8F] row per dense-level lookup, rolls reproducing tcnn's
    `% size` wrap — must match hash_encode exactly."""

    def _spec(self, **kw):
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import HashGridSpec

        base = dict(n_levels=4, n_features_per_level=2,
                    log2_hashmap_size=9, base_resolution=4,
                    per_level_scale=2.0)
        base.update(kw)
        return HashGridSpec.from_config(EncodingConfig(**base))

    def test_matches_plain_encode(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from instantvnr_tpu.ops.hash_encoding import (
            hash_encode, hash_encode_packed, init_hash_table,
            packed_dense_tables)

        # res 4,8,16,32 with cap 512: levels 0,1 dense (64, 512), 2,3 hashed
        spec = self._spec()
        assert spec.level_is_dense == (True, True, False, False)
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, spec)
        packed = packed_dense_tables(table, spec)
        assert set(packed) == {"0", "1"}
        # include boundary coords (cell == R-1 → out-of-row +1 aliasing)
        coords = jnp.concatenate([
            jax.random.uniform(key, (200, 3), jnp.float32),
            jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [1.0, 0.0, 0.5]]),
        ])
        a = hash_encode(table, coords, spec)
        b = hash_encode_packed(table, packed, coords, spec)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)

    def test_padded_dense_level_wrap(self):
        """A dense level whose size is padded past R³ (next multiple of 8)
        must wrap at SIZE, not R³ — roll length equals the padded size."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from instantvnr_tpu.ops.hash_encoding import (
            hash_encode, hash_encode_packed, init_hash_table,
            packed_dense_tables)

        spec = self._spec(base_resolution=5, n_levels=2)  # 5³=125 → size 128
        assert spec.level_sizes[0] == 128
        key = jax.random.PRNGKey(1)
        table = init_hash_table(key, spec)
        packed = packed_dense_tables(table, spec)
        coords = jax.random.uniform(key, (128, 3), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(hash_encode_packed(table, packed, coords, spec)),
            np.asarray(hash_encode(table, coords, spec)),
            atol=1e-6, rtol=1e-6)

    def test_render_params_layouts(self):
        """Schema-dependent inference layout: small schemas stay f32 with no
        packed tables; big schemas (≥2^22 params) get bf16 + packed."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from instantvnr_tpu.config import ModelConfig
        from instantvnr_tpu.models import NeuralField
        from instantvnr_tpu.models.network import (
            network_apply, render_params)

        key = jax.random.PRNGKey(2)
        coords = jax.random.uniform(key, (65, 3), jnp.float32)

        small = NeuralField.from_config(dataclasses.replace(
            ModelConfig(), encoding=dataclasses.replace(
                ModelConfig().encoding, log2_hashmap_size=14)))
        p = small.init(key)
        rp = render_params(p, small)
        assert "packed" not in rp
        assert rp["table"].dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(network_apply(rp, coords, small)),
            np.asarray(network_apply(p, coords, small)))

        big = NeuralField.from_config(ModelConfig())  # 2^19 reference schema
        p = big.init(key)
        rp = render_params(p, big)
        assert rp["table"].dtype == jnp.bfloat16
        assert set(rp["packed"]) == {"0", "1", "2"}
        # bf16 table quantization only (the packed gather itself is exact)
        np.testing.assert_allclose(
            np.asarray(network_apply(rp, coords, big)),
            np.asarray(network_apply(p, coords, big)), atol=2e-2)


class TestPackedTrainingForward:
    """grid_fwd_impl="packed": the training forward gathers dense levels
    from corner-packed tables while the backward stays the analytic
    splat+scatter — outputs and gradients must match the plain path."""

    def test_fwd_and_grad_match_plain(self):
        from instantvnr_tpu.config import EncodingConfig
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode_splat,
            init_hash_table,
        )

        spec = HashGridSpec.from_config(
            EncodingConfig(n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=10, base_resolution=4))
        assert any(spec.level_is_dense) and not all(spec.level_is_dense)
        key = jax.random.PRNGKey(7)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(key, (301, 3), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(8),
                              (301, spec.n_output_dims))

        def loss(packed):
            return lambda t: jnp.sum(
                hash_encode_splat(t, coords, spec, packed_fwd=packed) * w)

        out_p = hash_encode_splat(table, coords, spec, packed_fwd=True)
        out_r = hash_encode_splat(table, coords, spec, packed_fwd=False)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                                   atol=1e-6)
        g_p = jax.grad(loss(True))(table)
        g_r = jax.grad(loss(False))(table)
        np.testing.assert_array_equal(np.asarray(g_p), np.asarray(g_r))

    def test_train_step_matches_plain(self):
        import dataclasses

        from instantvnr_tpu.config import EncodingConfig, ModelConfig
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.models import (
            NeuralField,
            create_train_state,
            train_steps,
        )

        vol = synthetic_volume((16, 16, 16), kind="sphere")
        # f32 compute: in bf16 the packed path's different summation order
        # amplifies chaotically through Adam steps (same effect as any
        # numerically-equivalent training variant, NOTES_ROUND2.md)
        base = ModelConfig(encoding=EncodingConfig(
            n_levels=3, n_features_per_level=2, log2_hashmap_size=9,
            base_resolution=4), compute_dtype="float32")
        outs = {}
        for fwd in ("plain", "packed"):
            cfg = dataclasses.replace(base, grid_grad_impl="splat",
                                      grid_fwd_impl=fwd)
            field = NeuralField.from_config(cfg)
            state = create_train_state(jax.random.PRNGKey(0), field)
            state = train_steps(field, vol.data, state, 3, 512)
            outs[fwd] = np.asarray(state.params["table"])
        np.testing.assert_allclose(outs["packed"], outs["plain"],
                                   atol=1e-5, rtol=1e-4)


class TestSampleGradient:
    """ops.trilinear.sample_gradient == the reference's forward difference
    with boundary flip (sampleGradient, raytracing.h:112-130)."""

    def test_matches_manual_forward_difference(self):
        from instantvnr_tpu.ops.trilinear import sample_gradient, sample_volume

        rng = np.random.default_rng(3)
        vol = jnp.asarray(rng.random((9, 7, 8)).astype(np.float32))
        # include points near the upper boundary so the step flip triggers
        p = jnp.asarray(rng.uniform(0.05, 0.99, (64, 3)).astype(np.float32))
        step = 0.08
        v = sample_volume(vol, p)
        g = np.asarray(sample_gradient(vol, p, v, step))

        eps = 1.19209e-07
        stp = np.full((64, 3), step, np.float32)
        stp = np.where(np.asarray(p) + stp > 1.0 - eps, -stp, stp)
        assert (stp < 0).any()  # the flip case is actually exercised
        for ax in range(3):
            d = np.zeros((64, 3), np.float32)
            d[:, ax] = stp[:, ax]
            ga = (np.asarray(sample_volume(vol, jnp.asarray(np.asarray(p) + d)))
                  - np.asarray(v)) / stp[:, ax]
            np.testing.assert_allclose(g[:, ax], ga, rtol=1e-4, atol=1e-5)


class TestTracedSplitGrad:
    """hash_encode_traced_splitgrad backward ≡ plain autodiff of the traced
    encode (the TP path's per-level-scatter gradient)."""

    def test_grad_matches_autodiff(self):
        from instantvnr_tpu.ops.hash_encoding import (
            HashGridSpec,
            hash_encode_traced,
            hash_encode_traced_splitgrad,
            init_hash_table,
            level_param_arrays,
        )

        spec = HashGridSpec.from_config(
            EncodingConfig(n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=9, base_resolution=4))
        lp = {k: jnp.asarray(v) for k, v in level_param_arrays(spec).items()}
        caps = tuple(spec.level_sizes)
        key = jax.random.PRNGKey(7)
        table = init_hash_table(key, spec)
        coords = jax.random.uniform(key, (133, 3), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(8),
                              (133, spec.n_output_dims))

        def loss_ref(t):
            return jnp.sum(hash_encode_traced(
                t, coords, lp, spec.n_levels, spec.n_features) * w)

        def loss_new(t):
            return jnp.sum(hash_encode_traced_splitgrad(
                t, coords, lp, caps, spec.n_features) * w)

        # forwards identical
        np.testing.assert_array_equal(
            np.asarray(jax.jit(loss_ref)(table)),
            np.asarray(jax.jit(loss_new)(table)))
        g_ref = jax.grad(loss_ref)(table)
        g_new = jax.grad(loss_new)(table)
        assert float(jnp.abs(g_ref).max()) > 0
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   atol=1e-5, rtol=1e-4)
