import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.pathtrace import PathTraceRenderer, PathTraceSettings
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    return vol, tf, mc


class TestPathTracer:
    def test_renders_finite_nonnegative(self, scene):
        vol, tf, mc = scene
        r = PathTraceRenderer(24, 24, mc, tf, vol.data,
                              settings=PathTraceSettings(max_events=256))
        r.render()
        img = r.mapframe()
        assert np.isfinite(img).all()
        assert (img >= 0).all()
        # center rays scatter at least once → some radiance/alpha
        assert img[..., 3].max() > 0

    def test_empty_volume_is_black(self, scene):
        _, tf, _ = scene
        empty = jnp.zeros((32, 32, 32), jnp.float32)
        mc = mcmod.build(empty, (32, 32, 32), tf)
        r = PathTraceRenderer(12, 12, mc, tf, empty)
        r.render()
        img = r.mapframe()
        assert np.abs(img).max() < 1e-6

    def test_progressive_accumulation_converges(self, scene):
        """Variance of the running mean decreases with accumulated frames."""
        vol, tf, mc = scene
        r = PathTraceRenderer(16, 16, mc, tf, vol.data, seed=1)
        r.render()
        f1 = np.asarray(r._frame).copy()
        for _ in range(15):
            r.render()
        f16 = np.asarray(r._frame)
        assert r.frame_index == 16
        # frames differ (stochastic) and stay finite
        assert not np.allclose(f1, f16)
        assert np.isfinite(f16).all()
        # accumulate 16 more; the running mean should move less than the
        # first 15 frames moved it (convergence)
        d_early = np.abs(f16 - f1).mean()
        for _ in range(16):
            r.render()
        f32 = np.asarray(r._frame)
        d_late = np.abs(f32 - f16).mean()
        assert d_late < d_early

    def test_dense_opaque_volume_bright_center(self, scene):
        """A dense volume scatters a lot: radiance present, mostly from
        direct light + ambient escapes."""
        _, tf, _ = scene
        dense = jnp.full((32, 32, 32), 0.9, jnp.float32)
        mc = mcmod.build(dense, (32, 32, 32), tf)
        r = PathTraceRenderer(12, 12, mc, tf, dense, seed=3)
        for _ in range(4):
            r.render()
        img = r.mapframe()
        assert img[..., 3][4:8, 4:8].mean() > 0.9  # all center rays scatter
        assert img[..., :3].max() > 0.01


class TestDenoiser:
    def test_reduces_noise_preserves_alpha(self, scene):
        """The à-trous filter lowers pixel-to-pixel variance of the MC
        estimate inside the volume while leaving alpha untouched."""
        vol, tf, mc = scene
        r = PathTraceRenderer(32, 32, mc, tf, vol.data, seed=7)
        for _ in range(6):
            r.render()
        raw = r.mapframe()
        den = r.mapframe(denoise=True)
        # alpha filtered edge-aware: interior stays saturated
        hit = raw[..., 3] > 0.5
        assert hit.sum() > 20
        # local variance proxy: variance of horizontal differences
        def rough(img):
            d = np.diff(img[..., :3], axis=1)
            return float((d[hit[:, 1:]] ** 2).mean())
        assert rough(den) < 0.6 * rough(raw), (rough(den), rough(raw))

    def test_smooth_region_unchanged_mean(self, scene):
        vol, tf, mc = scene
        r = PathTraceRenderer(24, 24, mc, tf, vol.data, seed=9)
        for _ in range(8):
            r.render()
        raw = r.mapframe()
        den = r.mapframe(denoise=True)
        hit = raw[..., 3] > 0.5
        # energy approximately preserved (edge-aware blur, not darkening)
        assert abs(den[hit][:, :3].mean() - raw[hit][:, :3].mean()) < 0.02


def test_pathtrace_clip_and_scale():
    """Clip box and anisotropic scaling thread through the delta-tracking
    path (reference overwrites DeviceVolume::bbox, object.cpp:386-391)."""
    import numpy as np

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.pathtrace import PathTraceRenderer
    from instantvnr_tpu.render.transform import default_transform
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    vol = synthetic_volume((16, 16, 16), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(3, 2, -40), center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    def run(transform):
        r = PathTraceRenderer(12, 12, mc, tf, vol.data, transform=transform,
                              seed=5)
        r.set_camera(cam)
        for _ in range(8):
            r.render()
        return np.asarray(r.mapframe())

    full = run(None)
    xf = default_transform(vol.dims)
    clipped = run(xf._replace(
        clip_lower=jnp.asarray([0.0, 0.0, 0.0]),
        clip_upper=jnp.asarray([16.0, 16.0, 8.0])))  # front half only
    scaled = run(xf._replace(scale=jnp.asarray([2.0, 1.0, 1.0])))

    assert np.isfinite(full).all() and np.isfinite(clipped).all()
    assert np.isfinite(scaled).all()
    # clipping removes volume → strictly less accumulated opacity
    assert clipped[..., 3].sum() < full[..., 3].sum()
    assert not np.allclose(scaled, full)  # scaling changes the image


def test_facade_pathtrace_uses_compaction():
    """The facade's PT modes must run the compacted driver (the in-jit
    masked loop is ~18× slower at scale; regression guard for the
    _pt_settings default)."""
    from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer
    from instantvnr_tpu.data import synthetic_volume

    vol = synthetic_volume((16, 16, 16), kind="sphere")
    r = VNRenderer(SimpleVolume(vol), 16, 16,
                   mode=RenderMode.PATHTRACE_REFERENCE)
    assert r._impl.settings.compact
    r.render()
    assert r._impl._sched_cache.get("ops") is not None  # driver recorded


def test_facade_clipping_on_pathtrace_mode():
    """set_clipping_box/set_scaling must work in PATHTRACE_* modes
    (PathTraceRenderer.set_transform; regression: AttributeError)."""
    import numpy as np

    from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.render.camera import Camera

    vol = synthetic_volume((16, 16, 16), kind="sphere")
    simple = SimpleVolume(vol)
    r = VNRenderer(simple, 24, 24, mode=RenderMode.PATHTRACE_REFERENCE)
    r.set_camera(Camera(eye=(0, 0, -40), center=(0, 0, 0), up=(0, 1, 0),
                        fovy=45))
    for _ in range(3):
        r.render()
    full = r.mapframe()
    n_full = (full[..., 3] > 0.2).sum()
    assert n_full > 5
    r.set_clipping_box((0, 0, 0), (8, 16, 16))
    r.set_scaling((1.0, 1.0, 1.0))
    for _ in range(3):
        r.render()
    half = r.mapframe()
    assert np.isfinite(half).all()
    assert 0 < (half[..., 3] > 0.2).sum() < n_full


class TestPathtraceCompaction:
    """Host-orchestrated bucketed compaction for the tracker
    (render/pathtrace.pathtrace_compacted). Scheduling-only change: with
    compaction disabled (bucket ≥ R) the result is BIT-IDENTICAL to the
    in-jit while_loop (same key chain, same ray order); with compaction
    the Monte Carlo estimate must agree statistically."""

    def _rays(self, scene, n=16, seed=0):
        import jax

        from instantvnr_tpu.render.pathtrace import _pt_rays

        vol, tf, mc = scene
        cam = Camera(eye=(5, 4, -60), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45)
        cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
                      jnp.asarray(cam.center, jnp.float32),
                      jnp.asarray(cam.up, jnp.float32),
                      jnp.float32(cam.fovy))
        settings = PathTraceSettings(max_events=160)
        return _pt_rays(n, n, settings, cam_arrays,
                        tuple(int(d) for d in mc.volume_dims),
                        jax.random.PRNGKey(seed)), settings

    def test_uncompacted_bit_parity(self, scene, monkeypatch):
        import jax
        from functools import partial

        import instantvnr_tpu.render.compaction as comp
        from instantvnr_tpu.render.pathtrace import (
            pathtrace,
            pathtrace_compacted,
        )
        from instantvnr_tpu.render.renderer import reference_sample_fn

        vol, tf, mc = scene
        (org, dirn, t0, t1, light, lo, hi, k_pt, scale), settings = \
            self._rays(scene)
        # bucket floor ≥ R ⇒ the driver never compacts / never permutes
        monkeypatch.setattr(comp, "_MIN_BUCKET", 1 << 20)
        got = pathtrace_compacted(
            reference_sample_fn, org, dirn, t0, t1, mc, tf, k_pt, settings,
            light, sample_ctx=vol.data, scale=scale,
            clip_lower=lo, clip_upper=hi)
        want = pathtrace(
            partial(reference_sample_fn, vol.data), org, dirn, t0, t1, mc,
            tf, k_pt, settings, light, scale=scale,
            clip_lower=lo, clip_upper=hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_compacted_statistical_parity(self, scene):
        """Mean image over many progressive frames matches the in-jit
        tracker's mean (both are unbiased estimators of the same integral)."""
        vol, tf, mc = scene
        frames = 48
        means = {}
        for compact in (False, True):
            r = PathTraceRenderer(
                16, 16, mc, tf, vol.data, seed=11,
                settings=PathTraceSettings(max_events=160, compact=compact))
            r.set_camera(Camera(eye=(5, 4, -60), center=(0, 0, 0),
                                up=(0, 1, 0), fovy=45))
            for _ in range(frames):
                r.render()
            means[compact] = np.asarray(r._frame)
        assert np.isfinite(means[True]).all()
        # alpha (hit/miss) is deterministic per pixel ray distribution —
        # compare means loosely (MC noise ~1/sqrt(48))
        np.testing.assert_allclose(means[True].mean(), means[False].mean(),
                                   rtol=0.15)
        np.testing.assert_allclose(means[True], means[False], atol=0.35)

    def test_uncompacted_bit_parity_chunked(self, scene, monkeypatch):
        """Same as above but with the tail finisher disabled, so the driver
        takes the per-dispatch `_pt_events_prefix` chunks (the default
        settings route everything ≤ finish_bucket through the one-program
        finisher, which the test above covers)."""
        import jax
        from functools import partial

        import instantvnr_tpu.render.compaction as comp
        from instantvnr_tpu.render.pathtrace import (
            pathtrace,
            pathtrace_compacted,
        )
        from instantvnr_tpu.render.renderer import reference_sample_fn

        vol, tf, mc = scene
        (org, dirn, t0, t1, light, lo, hi, k_pt, scale), settings = \
            self._rays(scene)
        settings = PathTraceSettings(max_events=settings.max_events,
                                     finish_bucket=0)
        monkeypatch.setattr(comp, "_MIN_BUCKET", 1 << 20)
        got = pathtrace_compacted(
            reference_sample_fn, org, dirn, t0, t1, mc, tf, k_pt, settings,
            light, sample_ctx=vol.data, scale=scale,
            clip_lower=lo, clip_upper=hi)
        want = pathtrace(
            partial(reference_sample_fn, vol.data), org, dirn, t0, t1, mc,
            tf, k_pt, settings, light, scale=scale,
            clip_lower=lo, clip_upper=hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)

    def test_cell_skips_statistical_parity(self, scene):
        """Folding τ-surviving cell crossings into one event changes only
        the RNG *schedule* (crossings never consumed randoms to begin
        with), so the estimator stays unbiased: means must agree."""
        vol, tf, mc = scene
        frames = 40
        means = {}
        for skips in (0, 2):
            r = PathTraceRenderer(
                16, 16, mc, tf, vol.data, seed=13,
                settings=PathTraceSettings(max_events=160, compact=False,
                                           cell_skips=skips))
            r.set_camera(Camera(eye=(5, 4, -60), center=(0, 0, 0),
                                up=(0, 1, 0), fovy=45))
            for _ in range(frames):
                r.render()
            means[skips] = np.asarray(r._frame)
        assert np.isfinite(means[2]).all()
        np.testing.assert_allclose(means[2].mean(), means[0].mean(),
                                   rtol=0.15)
        np.testing.assert_allclose(means[2], means[0], atol=0.35)

    def test_schedule_replay_statistical_parity(self, scene, monkeypatch):
        """Schedule replay only remaps slots to RNG draws (the estimator is
        unchanged); means must agree, and the fast path must engage."""
        import instantvnr_tpu.render.compaction as comp

        monkeypatch.setattr(comp, "_MIN_BUCKET", 64)
        vol, tf, mc = scene
        frames = 40
        means = {}
        for replay in (False, True):
            r = PathTraceRenderer(
                16, 16, mc, tf, vol.data, seed=21,
                settings=PathTraceSettings(max_events=160, compact=True,
                                           finish_bucket=128,
                                           schedule_replay=replay))
            r.set_camera(Camera(eye=(5, 4, -60), center=(0, 0, 0),
                                up=(0, 1, 0), fovy=45))
            for _ in range(frames):
                r.render()
            means[replay] = np.asarray(r._frame)
            if replay:
                assert r._sched_cache.get("replays", 0) >= frames // 2, \
                    r._sched_cache
        assert np.isfinite(means[True]).all()
        np.testing.assert_allclose(means[True].mean(), means[False].mean(),
                                   rtol=0.15)
        np.testing.assert_allclose(means[True], means[False], atol=0.35)

    def test_fused_frame_matches_replay(self, scene, monkeypatch):
        """The fused whole-frame PT program (pt_fused_frame) replays the
        same schedule with the same key chain as the per-dispatch path:
        frames must stay allclose (XLA fusion moves ulps) to a
        fused-disabled renderer, and the fused path must engage."""
        import instantvnr_tpu.render.compaction as comp

        monkeypatch.setattr(comp, "_MIN_BUCKET", 64)
        monkeypatch.setattr(comp, "FUSED_AUTOCOMPILE", True)
        vol, tf, mc = scene
        cam = Camera(eye=(5, 4, -60), center=(0, 0, 0), up=(0, 1, 0),
                     fovy=45)
        frames = {}
        for fused in (False, True):
            r = PathTraceRenderer(
                16, 16, mc, tf, vol.data, seed=21,
                settings=PathTraceSettings(max_events=160, compact=True,
                                           finish_bucket=128,
                                           fused_replay=fused))
            r.set_camera(cam)
            fs = []
            for i in range(8):
                r.render()
                if fused and i == 3:
                    assert comp.wait_fused_compiles(120)
                fs.append(np.asarray(r._frame).copy())
            r.mapframe()
            frames[fused] = fs
            if fused:
                assert r._sched_cache.get("fused_frames", 0) >= 1, \
                    r._sched_cache
        for a, b in zip(frames[True], frames[False]):
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)

    def test_warmup_compiles_bucket_family(self, scene):
        from instantvnr_tpu.render.pathtrace import warmup_pt_programs
        from instantvnr_tpu.render.renderer import reference_sample_fn

        vol, tf, mc = scene
        n = warmup_pt_programs(reference_sample_fn,
                               PathTraceSettings(max_events=32),
                               mc, tf, 24 * 24, sample_ctx=vol.data)
        assert n >= 1
