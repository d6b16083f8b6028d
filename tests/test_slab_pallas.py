"""Fused Pallas slab compositor == the XLA sequential scan
(ops/pallas/slab_composite.py vs render/slabmarch.py `body`).

Runs the kernel in interpret mode on the CPU backend; the numerics are the
same code path the real TPU kernel runs, so any semantic divergence
(classification, opacity correction, coverage/clip masks, blend order,
early termination) shows up here.
"""
import dataclasses

import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.decoded import DecodedRenderer
from instantvnr_tpu.render.slabmarch import SlabSettings
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    return vol, tf, mc


def _frame(vol, tf, mc, cam, use_pallas, w=40, h=40, xform=None,
           shading="none", shadows=False):
    s = SlabSettings(pallas_compositor=use_pallas, shading=shading)
    dr = DecodedRenderer(w, h, mc, tf, vol.dims, initial_volume=vol.data,
                         settings=s)
    dr.set_camera(cam)
    if xform is not None:
        dr.set_transform(xform)
    if shadows:
        dr.enable_shadows()
    dr.render()
    return dr.mapframe()


@pytest.mark.parametrize("eye", [(0, 0, -70), (60, 9, 7), (-4, 66, 3)])
def test_pallas_matches_scan(scene, eye):
    vol, tf, mc = scene
    cam = Camera(eye=eye, center=(0, 0, 0), up=(0, 1, 0), fovy=40)
    ref = _frame(vol, tf, mc, cam, False)
    got = _frame(vol, tf, mc, cam, True)
    assert np.isfinite(got).all()
    assert ref[..., 3].max() > 0.05  # scene actually visible
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pallas_matches_scan_clipped_scaled(scene):
    vol, tf, mc = scene
    from instantvnr_tpu.render.transform import default_transform
    import jax.numpy as jnp

    cam = Camera(eye=(8, -6, -75), center=(0, 0, 0), up=(0, 1, 0), fovy=38)
    xf = default_transform(vol.dims)._replace(
        clip_lower=jnp.array([4.0, 0.0, 6.0]),
        clip_upper=jnp.array([28.0, 25.0, 30.0]),
        scale=jnp.array([1.0, 1.4, 0.8]))
    ref = _frame(vol, tf, mc, cam, False, xform=xf)
    got = _frame(vol, tf, mc, cam, True, xform=xf)
    assert ref[..., 3].max() > 0.05
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pallas_respects_custom_tf(scene):
    vol, _, _ = scene
    tfc = TransferFunctionConfig(
        colors=((0.0, 1.0, 0.1, 0.1), (0.5, 0.1, 1.0, 0.1),
                (1.0, 0.1, 0.1, 1.0)),
        alphas=((0.0, 0.0), (0.3, 0.05), (0.7, 0.6), (1.0, 1.0)),
        range=(0.1, 0.9))
    tf = bake_transfer_function(tfc)
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
    ref = _frame(vol, tf, mc, cam, False)
    got = _frame(vol, tf, mc, cam, True)
    assert ref[..., 3].max() > 0.05
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("shading,shadows", [
    ("gradient", False), ("none", True), ("gradient", True)])
def test_pallas_ext_matches_scan(scene, shading, shadows):
    """Extended kernel (gradient shading and/or shadow modulation) == the
    XLA scan body for the same settings."""
    vol, tf, mc = scene
    cam = Camera(eye=(25, -18, -62), center=(0, 0, 0), up=(0, 1, 0), fovy=42)
    ref = _frame(vol, tf, mc, cam, False, shading=shading, shadows=shadows)
    got = _frame(vol, tf, mc, cam, True, shading=shading, shadows=shadows)
    assert np.isfinite(got).all()
    assert ref[..., 3].max() > 0.05
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_ext_matches_scan_clipped_scaled_shaded(scene):
    vol, tf, mc = scene
    from instantvnr_tpu.render.transform import default_transform
    import jax.numpy as jnp

    cam = Camera(eye=(8, -6, -75), center=(0, 0, 0), up=(0, 1, 0), fovy=38)
    xf = default_transform(vol.dims)._replace(
        clip_lower=jnp.array([4.0, 0.0, 6.0]),
        clip_upper=jnp.array([28.0, 25.0, 30.0]),
        scale=jnp.array([1.0, 1.4, 0.8]))
    ref = _frame(vol, tf, mc, cam, False, xform=xf, shading="gradient")
    got = _frame(vol, tf, mc, cam, True, xform=xf, shading="gradient")
    assert ref[..., 3].max() > 0.05
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_auto_off_on_cpu(scene):
    """'auto' must resolve to the XLA scan on non-TPU backends."""
    import jax

    assert jax.default_backend() == "cpu"
    vol, tf, mc = scene
    cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
    a = _frame(vol, tf, mc, cam, "auto")
    b = _frame(vol, tf, mc, cam, False)
    np.testing.assert_array_equal(a, b)


class TestIsoSweepPallas:
    """Fused Pallas first-hit sweep == the XLA scan
    (ops/pallas/iso_sweep.py vs render/isosurf.py slab_iso_render body)."""

    def _frame(self, scene, cam, use_pallas, iso=0.5, xform=None):
        from instantvnr_tpu.render.isosurf import IsoRenderer, IsoSettings

        vol, tf, _ = scene
        ir = IsoRenderer(40, 40, vol.data, tf, isovalue=iso,
                         settings=IsoSettings(pallas_sweep=use_pallas),
                         transform=xform)
        ir.set_camera(cam)
        ir.render()
        return np.asarray(ir._frame)

    @pytest.mark.parametrize("eye", [(0, 0, -70), (60, 9, 7)])
    def test_matches_scan(self, scene, eye):
        cam = Camera(eye=eye, center=(0, 0, 0), up=(0, 1, 0), fovy=40)
        ref = self._frame(scene, cam, False)
        got = self._frame(scene, cam, True)
        assert np.isfinite(got).all()
        assert ref[:, 3].max() > 0.5  # surface visible
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_matches_scan_clipped_scaled(self, scene):
        from instantvnr_tpu.render.transform import default_transform
        import jax.numpy as jnp

        vol = scene[0]
        cam = Camera(eye=(8, -6, -75), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=38)
        xf = default_transform(vol.dims)._replace(
            clip_lower=jnp.array([4.0, 0.0, 6.0]),
            clip_upper=jnp.array([28.0, 25.0, 30.0]),
            scale=jnp.array([1.0, 1.4, 0.8]))
        ref = self._frame(scene, cam, False, xform=xf)
        got = self._frame(scene, cam, True, xform=xf)
        assert ref[:, 3].max() > 0.5
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_traced_isovalue(self, scene):
        """Iso edits reuse the same program in both paths."""
        cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=40)
        for iso in (0.3, 0.62):
            ref = self._frame(scene, cam, False, iso=iso)
            got = self._frame(scene, cam, True, iso=iso)
            np.testing.assert_allclose(got, ref, atol=2e-5)


def test_pallas_multi_tile_grid(scene, monkeypatch):
    """Force n_tiles > 1 (tile_h < hi) so the i-indexed block maps and the
    per-tile k==0 carry re-init are exercised in interpret mode (real
    frames tile at 512² → tile_h 256 × 2 tiles)."""
    import instantvnr_tpu.ops.pallas.slab_composite as sc

    orig = sc.pick_tile_h
    tiles = []

    def halved(hi, wi, *a, **kw):
        t = orig(hi, wi, *a, max_tile=hi // 2, **kw)
        tiles.append((hi, t))
        return t

    monkeypatch.setattr(sc, "pick_tile_h", halved)
    # earlier tests traced slab_render with the same shapes/statics — drop
    # the cached executables or the monkeypatch never runs at trace time
    from instantvnr_tpu.render import slabmarch

    slabmarch.slab_render.clear_cache()
    vol, tf, mc = scene
    cam = Camera(eye=(14, -9, -66), center=(0, 0, 0), up=(0, 1, 0), fovy=41)
    ref = _frame(vol, tf, mc, cam, False)
    got = _frame(vol, tf, mc, cam, True)
    got_sh = _frame(vol, tf, mc, cam, True, shading="gradient")
    ref_sh = _frame(vol, tf, mc, cam, False, shading="gradient")
    # the patched picker must have actually run and forced n_tiles > 1
    assert tiles and all(t is not None and t < hi for hi, t in tiles), tiles
    assert ref[..., 3].max() > 0.05
    np.testing.assert_allclose(got, ref, atol=2e-5)
    np.testing.assert_allclose(got_sh, ref_sh, atol=2e-4)


def test_iso_pallas_multi_tile_grid(scene, monkeypatch):
    import instantvnr_tpu.ops.pallas.slab_composite as sc
    from instantvnr_tpu.render.isosurf import IsoRenderer, IsoSettings

    orig = sc.pick_tile_h
    tiles = []

    def halved(hi, wi, *a, **kw):
        t = orig(hi, wi, *a, max_tile=hi // 2, **kw)
        tiles.append((hi, t))
        return t

    monkeypatch.setattr(sc, "pick_tile_h", halved)
    # same cache-bypass hazard as above, for the iso sweep's jitted entry
    from instantvnr_tpu.render import isosurf as isomod

    isomod.slab_iso_render.clear_cache()
    vol, tf, _ = scene
    cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
    frames = {}
    for mode in (False, True):
        ir = IsoRenderer(40, 40, vol.data, tf, isovalue=0.5,
                         settings=IsoSettings(pallas_sweep=mode))
        ir.set_camera(cam)
        ir.render()
        frames[mode] = np.asarray(ir._frame)
    assert tiles and all(t is not None and t < hi for hi, t in tiles), tiles
    assert frames[False][:, 3].max() > 0.5
    np.testing.assert_allclose(frames[True], frames[False], atol=2e-5)


def test_pick_tile_h_vmem_fallback():
    """A working set no tile height can fit must return None (the promised
    XLA-scan fallback), and normal frame shapes must tile aligned."""
    from instantvnr_tpu.ops.pallas.slab_composite import pick_tile_h

    assert pick_tile_h(512, 512, 128, 128) == 256
    assert pick_tile_h(768, 768, 128, 128) == 256
    # a 2048² permuted slab plane alone exceeds the VMEM budget
    assert pick_tile_h(512, 512, 2048, 2048) is None
