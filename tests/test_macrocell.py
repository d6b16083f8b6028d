import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.utils.tfn import bake_transfer_function, classify, max_alpha_in_range


class TestTransferFunction:
    def test_classify_linear_ramp(self):
        tf = bake_transfer_function(TransferFunctionConfig())
        rgb, alpha = classify(tf, jnp.array([0.0, 0.5, 1.0]))
        assert np.allclose(alpha, [0.0, 0.5, 1.0], atol=2e-3)
        # default colors ramp from blue-ish (0,0,1) to red-ish (1,0,0)
        assert np.allclose(rgb[0], [0.0, 0.0, 1.0], atol=2e-3)
        assert np.allclose(rgb[2], [1.0, 0.0, 0.0], atol=2e-3)

    def test_classify_clamps_to_range(self):
        cfg = TransferFunctionConfig(range=(10.0, 20.0))
        tf = bake_transfer_function(cfg)
        _, a_below = classify(tf, jnp.array([-5.0]))
        _, a_above = classify(tf, jnp.array([99.0]))
        assert float(a_below[0]) == pytest.approx(0.0, abs=1e-3)
        assert float(a_above[0]) == pytest.approx(1.0, abs=1e-3)

    def test_range_max_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        alphas = rng.random(64).astype(np.float32)
        cfg = TransferFunctionConfig(
            alphas=tuple(
                (i / 63.0, float(alphas[i])) for i in range(64)
            )
        )
        tf = bake_transfer_function(cfg, resolution=64)
        lut = np.asarray(tf.alphas)
        r = 64
        for lo, hi in [(0.0, 1.0), (0.2, 0.4), (0.77, 0.78), (0.5, 0.5)]:
            got = float(max_alpha_in_range(tf, jnp.float32(lo), jnp.float32(hi)))
            i0 = max(int(np.floor(lo * (r - 1) + 0.5)) - 1, 0)
            i1 = min(int(np.floor(hi * (r - 1) + 0.5)) + 1, r - 1)
            expect = float(lut[i0 : i1 + 1].max())
            assert got == pytest.approx(expect, abs=1e-6), (lo, hi)


class TestMacroCell:
    def test_dims(self):
        assert mcmod.macrocell_dims((64, 64, 64)) == (4, 4, 4)
        assert mcmod.macrocell_dims((65, 16, 17)) == (5, 1, 2)

    def test_offline_ranges(self):
        """Cell ranges cover their voxels (with the ±1 overlap)."""
        rng = np.random.default_rng(1)
        vol = rng.random((32, 32, 32)).astype(np.float32)
        mc = mcmod.build(jnp.asarray(vol), (32, 32, 32))
        lo = np.asarray(mc.value_lo)
        hi = np.asarray(mc.value_hi)
        assert lo.shape == (2, 2, 2)
        w = MACROCELL_SIZE
        for cz in range(2):
            for cy in range(2):
                for cx in range(2):
                    z0, y0, x0 = cz * w, cy * w, cx * w
                    block = vol[
                        max(z0 - 1, 0) : z0 + w + 1,
                        max(y0 - 1, 0) : y0 + w + 1,
                        max(x0 - 1, 0) : x0 + w + 1,
                    ]
                    assert lo[cz, cy, cx] == pytest.approx(block.min(), abs=1e-6)
                    assert hi[cz, cy, cx] == pytest.approx(block.max(), abs=1e-6)

    def test_explicit_update_scatters(self):
        mc = mcmod.allocate((64, 64, 64))
        # one sample in the interior of cell (1,0,0): voxel ~ (20, 5, 5)
        coords = jnp.array([[20.5 / 64, 5.5 / 64, 5.5 / 64]], jnp.float32)
        values = jnp.array([0.7], jnp.float32)
        mc = mcmod.update_explicit(mc, coords, values)
        lo = np.asarray(mc.value_lo)
        hi = np.asarray(mc.value_hi)
        assert hi[0, 0, 1] == pytest.approx(0.7)
        assert lo[0, 0, 1] == pytest.approx(0.7)
        # no other cell touched (interior voxel, no boundary splat)
        touched = (np.asarray(mc.value_hi) >= np.asarray(mc.value_lo)).sum()
        assert touched == 1

    def test_explicit_boundary_splat(self):
        mc = mcmod.allocate((64, 64, 64))
        # voxel (16, 16, 16): on the lower boundary of cell (1,1,1) in all
        # axes → splats into all 8 cells (0|1)³
        coords = jnp.array([[16.5 / 64, 16.5 / 64, 16.5 / 64]], jnp.float32)
        values = jnp.array([0.9], jnp.float32)
        mc = mcmod.update_explicit(mc, coords, values)
        touched = np.asarray(mc.value_hi) >= np.asarray(mc.value_lo)
        assert touched.sum() == 8
        assert touched[:2, :2, :2].all()

    def test_max_opacity_empty_cells_zero(self):
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.allocate((64, 64, 64))
        coords = jnp.array([[0.4, 0.4, 0.4]], jnp.float32)
        mc = mcmod.update_explicit(mc, coords, jnp.array([0.5], jnp.float32))
        mc = mcmod.update_max_opacity(mc, tf)
        op = np.asarray(mc.max_opacity)
        assert op[1, 1, 1] > 0.4  # ~alpha(0.5)=0.5 with LUT widening
        assert op[0, 0, 0] == 0.0  # untouched cell stays empty

    def test_explicit_matches_offline_when_dense(self):
        """Scattering every voxel center reproduces the offline sweep."""
        rng = np.random.default_rng(2)
        vol = rng.random((16, 16, 16)).astype(np.float32)
        dims = (16, 16, 16)
        z, y, x = np.meshgrid(*(np.arange(16),) * 3, indexing="ij")
        coords = np.stack(
            [(x.ravel() + 0.5) / 16, (y.ravel() + 0.5) / 16, (z.ravel() + 0.5) / 16],
            axis=-1,
        ).astype(np.float32)
        values = vol.ravel()
        mc_e = mcmod.update_explicit(
            mcmod.allocate(dims), jnp.asarray(coords), jnp.asarray(values)
        )
        mc_o = mcmod.build(jnp.asarray(vol), dims)
        # single cell; its range covers all voxels in both paths
        assert np.asarray(mc_e.value_lo)[0, 0, 0] == pytest.approx(
            np.asarray(mc_o.value_lo)[0, 0, 0], abs=1e-6
        )
        assert np.asarray(mc_e.value_hi)[0, 0, 0] == pytest.approx(
            np.asarray(mc_o.value_hi)[0, 0, 0], abs=1e-6
        )


def test_max_opacity_majorant_covers_narrow_spike():
    """The RMQ max-opacity must upper-bound the EXACT control-point alpha —
    a knot peak falling between LUT samples must not yield a violated
    majorant (delta tracking / adaptive sampling correctness)."""
    import jax.numpy as jnp

    from instantvnr_tpu.config import TransferFunctionConfig
    from instantvnr_tpu.utils.tfn import (
        bake_transfer_function,
        classify_controls,
        max_alpha_in_range,
    )

    tfc = TransferFunctionConfig(
        alphas=((0.0, 0.0), (0.5, 0.0), (0.50049, 1.0), (0.501, 0.0),
                (1.0, 0.0)))
    tf = bake_transfer_function(tfc)
    _, a_exact = classify_controls(tf, jnp.array([[0.50049]]))
    assert float(a_exact[0, 0]) > 0.9  # the spike is real
    m = max_alpha_in_range(tf, jnp.array([0.49]), jnp.array([0.52]))
    assert float(m[0]) >= float(a_exact[0, 0]) - 1e-6
