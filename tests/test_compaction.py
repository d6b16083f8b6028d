"""Compacted wavefront == plain wavefront (render/compaction.py).

The bucketed-compaction driver reschedules the exact same supersteps the
in-jit while_loop runs, so the two must agree bit-for-bit-ish (float
assoc differences only) on every shading mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import (
    Camera,
    RaymarchSettings,
    Renderer,
    reference_sample_fn,
)
from instantvnr_tpu.render.compaction import _bucket, raymarch_compacted
from instantvnr_tpu.render.raymarch import raymarch
from instantvnr_tpu.utils.math import ray_box_intersect
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    return vol, tf, mc


def _rays(dims, n=64):
    cam = Camera.default_for_dims(dims)
    from instantvnr_tpu.render import camera_rays

    org_w, dirn = camera_rays(cam, n, n)
    d = jnp.array(dims, jnp.float32)
    org = org_w + 0.5 * d
    t0, t1, hit = ray_box_intersect(org, dirn, jnp.zeros(3), d)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)
    jitter = jax.random.uniform(jax.random.PRNGKey(7), (org.shape[0],))
    return org, dirn, t0, t1, jitter


@pytest.mark.parametrize("shading", ["none", "gradient", "ssh"])
def test_compacted_matches_plain(scene, shading):
    vol, tf, mc = scene
    org, dirn, t0, t1, jitter = _rays(vol.dims)
    settings = RaymarchSettings(shading=shading, max_supersteps=64)
    light = jnp.array([0.7, 0.9, 0.4], jnp.float32)
    light = light / jnp.linalg.norm(light)

    ref = raymarch(lambda p: reference_sample_fn(vol.data, p),
                   org, dirn, t0, t1, mc, tf, jitter, settings,
                   light_dir=light)
    out = raymarch_compacted(reference_sample_fn, org, dirn, t0, t1, mc, tf,
                             jitter, settings, light_dir=light,
                             sample_ctx=vol.data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tiles", [2, 4, 3])
def test_tiled_matches_untiled(scene, tiles, monkeypatch):
    """Frame tiling (RaymarchSettings.tiles) is pure scheduling — the
    tiled frame must equal the untiled frame bit-for-bit, including with
    replay across frames and deferred validation."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIN_BUCKET", 256)
    monkeypatch.setattr(comp, "_FINISH_BUCKET", 512)
    vol, tf, mc = scene
    cam = Camera.default_for_dims(vol.dims)
    frames = {}
    for t_ in (1, tiles):
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True, tiles=t_),
                     seed=5)
        r.set_camera(cam)
        fs = []
        for _ in range(3):
            r.render()
            fs.append(r.mapframe().copy())
        frames[t_] = fs
        if t_ > 1:
            # per-band replay engaged after the first frame
            sub = r._sched_cache.get("tile0", {})
            assert sub.get("replays", 0) >= 1, r._sched_cache
    for a, b in zip(frames[1], frames[tiles]):
        np.testing.assert_array_equal(a, b)


def test_tiled_ssh_matches_untiled(scene, monkeypatch):
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIN_BUCKET", 256)
    monkeypatch.setattr(comp, "_FINISH_BUCKET", 512)
    vol, tf, mc = scene
    cam = Camera.default_for_dims(vol.dims)
    frames = {}
    for t_ in (1, 2):
        r = Renderer(32, 32, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True, tiles=t_,
                                               shading="ssh"), seed=2)
        r.set_camera(cam)
        r.render()
        frames[t_] = r.mapframe()
    np.testing.assert_array_equal(frames[1], frames[2])


def test_bucket_schedule(monkeypatch):
    """Power-of-two-only ladder (VNR_BUCKET_MIDPOINTS=0 override)."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIDPOINT_BUCKETS", False)
    assert _bucket(1, 1 << 20) == 8192
    assert _bucket(8193, 1 << 20) == 16384
    assert _bucket(1 << 20, 1 << 18) == 1 << 18


def test_bump_schedule_transform(monkeypatch):
    """bump_schedule: every C moves one rung up, S/F follow the relaxed
    trajectory, useless compactions drop — and it never ratchets because
    recorded ops stay tight (the transform is re-derived per frame)."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIDPOINT_BUCKETS", True)
    r = 1 << 20
    ops = (("S", r), ("C", 98304), ("S", 98304), ("C", 12288),
           ("S", 12288), ("F", 8192))
    got = comp.bump_schedule(ops, r)
    assert got == (("S", r), ("C", 131072), ("S", 131072), ("C", 16384),
                   ("S", 16384), ("F", 16384))
    # a C whose bumped bucket no longer shrinks the prefix is dropped
    ops2 = (("C", 98304), ("C", 131072), ("F", 131072))
    assert comp.bump_schedule(ops2, r) == (("C", 131072), ("F", 131072))
    # idempotence guard: applying to its own output moves exactly one
    # more rung (no compounding within a frame)
    twice = comp.bump_schedule(got, r)
    assert twice[1] == ("C", 196608)


def test_bump_next_consumed_and_record_kept(scene, monkeypatch):
    """After a camera change the renderer sets bump_next; the next frame
    consumes it and must NOT overwrite the tight recorded schedule."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIN_BUCKET", 256)
    monkeypatch.setattr(comp, "_FINISH_BUCKET", 512)
    vol, tf, mc = scene
    cam1 = Camera.default_for_dims(vol.dims)
    cam2 = Camera(eye=(1.2 * vol.dims[0], 10, 6), center=(0, 0, 0),
                  up=(0, 1, 0), fovy=55)
    r = Renderer(48, 48, mc, tf, reference_sample_fn, sample_ctx=vol.data,
                 settings=RaymarchSettings(compact=True), seed=11)
    r.set_camera(cam1)
    r.render()
    r.render()
    tight = list(r._sched_cache.get("ops") or [])
    assert tight
    r.set_camera(cam2)
    assert r._sched_cache.get("bump_next") is True
    r.render()
    assert "bump_next" not in r._sched_cache  # consumed by one frame
    # the bumped replay (valid or not) must not have replaced the record
    # with relaxed buckets; either the tight record survives or a fresh
    # serialized record (measured counts) took its place
    ops = r._sched_cache.get("ops") or []
    for op in ops:
        if op[0] == "C":
            assert op[2] <= op[1]  # recorded C is tight vs its own count
    r.mapframe()  # settles + parity with the serialized path is covered
    # by test_camera_change_mid_accumulation


def test_bump_propagates_to_tile_bands(scene, monkeypatch):
    """Tiled frames: the top-level bump_next flag must reach every band's
    sub-cache (raymarch_compacted tiles branch) and the motion frame must
    equal the serialized render exactly."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIN_BUCKET", 128)
    monkeypatch.setattr(comp, "_FINISH_BUCKET", 256)
    vol, tf, mc = scene
    cam1 = Camera.default_for_dims(vol.dims)
    cam2 = Camera(eye=(1.2 * vol.dims[0], 10, 6), center=(0, 0, 0),
                  up=(0, 1, 0), fovy=55)
    frames = {}
    for replay in (False, True):
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True, tiles=2,
                                               schedule_replay=replay),
                     seed=13)
        r.set_camera(cam1)
        r.render()
        r.render()
        if replay:
            r.set_camera(cam2)
            assert r._sched_cache.get("bump_next") is True
            r.render()
            # consumed from the top cache and from every band sub-cache
            assert "bump_next" not in r._sched_cache
            for i in range(2):
                sub = r._sched_cache.get(f"tile{i}") or {}
                assert "bump_next" not in sub
        else:
            r.set_camera(cam2)
            r.render()
        frames[replay] = r.mapframe()
    np.testing.assert_array_equal(frames[True], frames[False])


def test_bucket_midpoints(monkeypatch):
    """The 3·2^k midpoint ladder (VNR_BUCKET_MIDPOINTS)."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIDPOINT_BUCKETS", True)
    assert comp._bucket(8193, 1 << 20) == 12288
    assert comp._bucket(12289, 1 << 20) == 16384
    assert comp._bucket(20000, 1 << 20) == 24576
    assert comp._bucket(1, 1 << 20) == 8192
    assert comp._bucket(1 << 20, 1 << 18) == 1 << 18
    assert comp._next_bucket(8192, 1 << 20) == 12288
    assert comp._next_bucket(12288, 1 << 20) == 16384
    assert comp.bucket_sizes(65536) == [65536, 49152, 32768, 24576,
                                        16384, 12288, 8192]


def test_midpoint_buckets_bit_identical(scene, monkeypatch):
    """Output is bit-identical under the midpoint ladder (the wavefront's
    schedule-independence invariant — per-ray state is slot-independent)."""
    import instantvnr_tpu.render.compaction as comp

    monkeypatch.setattr(comp, "_MIN_BUCKET", 256)
    monkeypatch.setattr(comp, "_FINISH_BUCKET", 384)
    vol, tf, mc = scene
    cam = Camera.default_for_dims(vol.dims)
    frames = {}
    for mid in (False, True):
        monkeypatch.setattr(comp, "_MIDPOINT_BUCKETS", mid)
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True), seed=7)
        r.set_camera(cam)
        for _ in range(3):
            r.render()
        frames[mid] = r.mapframe()
    np.testing.assert_array_equal(frames[True], frames[False])


def test_renderer_compact_flag(scene):
    """Renderer.render with compact=True equals compact=False (same key)."""
    vol, tf, mc = scene
    frames = []
    for compact in (False, True):
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=compact), seed=3)
        r.render()
        frames.append(r.mapframe())
    np.testing.assert_allclose(frames[1], frames[0], rtol=1e-4, atol=1e-5)


class TestScheduleReplay:
    """Schedule replay (compaction.drive_compacted/_replay): frame k+1
    re-dispatches frame k's superstep/compaction schedule free-running and
    validates with async live counts. A wavefront ray's march is
    slot-independent, so ANY schedule yields bit-identical output."""

    def _small_buckets(self, monkeypatch):
        # shrink the bucket floor/finisher so 48² frames actually exercise
        # compaction + replay (defaults are sized for 512² on real TPU)
        import instantvnr_tpu.render.compaction as comp

        monkeypatch.setattr(comp, "_MIN_BUCKET", 256)
        monkeypatch.setattr(comp, "_FINISH_BUCKET", 512)

    def test_progressive_frames_bit_identical(self, scene, monkeypatch):
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        cam = Camera.default_for_dims(vol.dims)
        frames = {}
        for replay in (False, True):
            r = Renderer(48, 48, mc, tf, reference_sample_fn,
                         sample_ctx=vol.data,
                         settings=RaymarchSettings(
                             compact=True, schedule_replay=replay), seed=5)
            r.set_camera(cam)
            fs = []
            for _ in range(4):
                r.render()
                fs.append(np.asarray(r._frame).copy())
            frames[replay] = fs
            if replay:
                # the fast path must actually engage after frame 1
                assert r._sched_cache.get("replays", 0) >= 2, r._sched_cache
        for a, b in zip(frames[True], frames[False]):
            np.testing.assert_array_equal(a, b)

    def test_camera_change_mid_accumulation(self, scene, monkeypatch):
        """A schedule recorded for one camera replays against another —
        validation/continuation must keep the result exact (the stale
        schedule is only a performance hint, never a correctness input).
        Read through mapframe(): the replayed frame is PROVISIONAL until
        the deferred validation settles, and under the midpoint ladder's
        tighter buckets the stale-schedule replay here really is invalid
        (detected, rolled back, re-rendered) — reading the internal
        `_frame` before settlement would observe the provisional image."""
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        cam1 = Camera.default_for_dims(vol.dims)
        # a close-up from a different axis: very different live-count
        # trajectory (and many more near-plane hits)
        cam2 = Camera(eye=(1.5 * vol.dims[0], 8, 4), center=(0, 0, 0),
                      up=(0, 1, 0), fovy=60)
        frames = {}
        for replay in (False, True):
            r = Renderer(48, 48, mc, tf, reference_sample_fn,
                         sample_ctx=vol.data,
                         settings=RaymarchSettings(
                             compact=True, schedule_replay=replay), seed=9)
            r.set_camera(cam1)
            r.render()
            r.render()
            r.set_camera(cam2)
            r.render()
            frames[replay] = r.mapframe()
        np.testing.assert_array_equal(frames[True], frames[False])

    def test_deferred_validation_bit_identical(self, scene, monkeypatch):
        """Deferred settle (validation read at the NEXT frame) must not
        change any pixel vs blocking validation, and mapframe() must leave
        nothing pending."""
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        cam = Camera.default_for_dims(vol.dims)
        frames = {}
        for deferred in (False, True):
            r = Renderer(48, 48, mc, tf, reference_sample_fn,
                         sample_ctx=vol.data,
                         settings=RaymarchSettings(
                             compact=True,
                             deferred_validation=deferred), seed=5)
            r.set_camera(cam)
            for _ in range(4):
                r.render()
            frames[deferred] = r.mapframe()
            assert "pending" not in r._sched_cache
            assert r._pending_frame is None
        np.testing.assert_array_equal(frames[True], frames[False])

    def test_invalid_deferred_replay_rolls_back(self, scene, monkeypatch):
        """Corrupt the recorded schedule so the replayed compaction drops
        live rays: the deferred settle must detect it, roll the provisional
        frame out of the accumulation, and re-render it serialized — the
        final frame matches a no-replay renderer (up to the ~1 ulp of the
        accumulation subtract/re-add)."""
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        cam = Camera.default_for_dims(vol.dims)

        ref = Renderer(48, 48, mc, tf, reference_sample_fn,
                       sample_ctx=vol.data,
                       settings=RaymarchSettings(
                           compact=True, schedule_replay=False), seed=5)
        ref.set_camera(cam)
        for _ in range(4):
            ref.render()
        want = ref.mapframe()

        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True), seed=5)
        r.set_camera(cam)
        for _ in range(3):
            r.render()
        r._settle()  # clear frame 3's pending before corrupting
        assert r._sched_cache.get("ops")
        # a compaction far below the live count (48²: hundreds of hits)
        r._sched_cache["ops"] = [("C", 256, 100)] + [
            op for op in r._sched_cache["ops"] if op[0] != "C"]
        r.render()  # frame 4 replays the corrupt schedule (provisional)
        got = r.mapframe()  # settles → invalid → rollback + redo
        assert r._sched_cache.get("invalidated", 0) >= 1, r._sched_cache
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    def test_fused_schedule_matches_replay(self, scene, monkeypatch):
        """Once a schedule repeats unchanged, it is AOT-compiled into ONE
        whole-frame program (compaction._FusedAdapter) and dispatched in
        place of per-dispatch replay — frames must stay allclose (fusing
        across former dispatch boundaries moves ≤ a few ulps) to the
        no-replay renderer, and the fused path must actually engage."""
        self._small_buckets(monkeypatch)
        import instantvnr_tpu.render.compaction as comp

        monkeypatch.setattr(comp, "FUSED_AUTOCOMPILE", True)
        vol, tf, mc = scene
        cam = Camera.default_for_dims(vol.dims)
        ref = Renderer(48, 48, mc, tf, reference_sample_fn,
                       sample_ctx=vol.data,
                       settings=RaymarchSettings(
                           compact=True, schedule_replay=False), seed=5)
        ref.set_camera(cam)
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True), seed=5)
        r.set_camera(cam)
        for i in range(8):
            ref.render()
            r.render()
            if i == 3:
                # frame 1 records; 2 replays; 3 proves stability and kicks
                # the background compile — block until it lands so the
                # remaining frames exercise the fused executable
                assert comp.wait_fused_compiles(120)
            np.testing.assert_allclose(
                np.asarray(r._frame), np.asarray(ref._frame),
                rtol=0, atol=1e-6)
        r.mapframe()
        assert r._sched_cache.get("fused_frames", 0) >= 1, r._sched_cache

    def test_fused_camera_change_falls_back(self, scene, monkeypatch):
        """A camera change invalidates the fused schedule exactly like a
        replayed one: the counts check catches it and the frame re-renders
        serialized — output equal to a no-replay renderer."""
        self._small_buckets(monkeypatch)
        import instantvnr_tpu.render.compaction as comp

        monkeypatch.setattr(comp, "FUSED_AUTOCOMPILE", True)
        vol, tf, mc = scene
        cam1 = Camera.default_for_dims(vol.dims)
        cam2 = Camera(eye=(1.5 * vol.dims[0], 8, 4), center=(0, 0, 0),
                      up=(0, 1, 0), fovy=60)
        frames = {}
        for replay in (False, True):
            r = Renderer(48, 48, mc, tf, reference_sample_fn,
                         sample_ctx=vol.data,
                         settings=RaymarchSettings(
                             compact=True, schedule_replay=replay), seed=9)
            r.set_camera(cam1)
            for _ in range(4):
                r.render()
            if replay:
                comp.wait_fused_compiles(120)
            r.render()  # with replay: the fused frame on cam1
            if replay:
                r._settle()
                assert r._sched_cache.get("fused_frames", 0) >= 1
            # the camera change resets accumulation; the stale schedule
            # (and its fused executable) is only a hint — validity checks
            # must keep the new frame exact
            r.set_camera(cam2)
            r.render()
            frames[replay] = r.mapframe()
        np.testing.assert_allclose(frames[True], frames[False],
                                   rtol=0, atol=1e-5)

    def test_resize_with_pending_frame(self, scene, monkeypatch):
        """resize() between frames must discard the pending provisional
        frame and the size-specific schedule without touching the old
        accumulation buffers (shape mismatch crash otherwise)."""
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True), seed=2)
        r.set_camera(Camera.default_for_dims(vol.dims))
        r.render()
        r.render()  # leaves a pending provisional frame (deferred default)
        r.resize(32, 32)
        assert r._pending_frame is None
        assert "ops" not in r._sched_cache
        r.reset_accumulation()
        r.render()
        f = r.mapframe()
        assert f.shape == (32, 32, 4)
        assert np.isfinite(f).all()

    def test_all_miss_frame(self, scene, monkeypatch):
        """Rays that never hit the box record an empty schedule; replay
        must not engage on nothing and the frame stays black."""
        self._small_buckets(monkeypatch)
        vol, tf, mc = scene
        away = Camera(eye=(0, 0, -5.0 * vol.dims[2]), center=(0, 0, -9999),
                      up=(0, 1, 0), fovy=30)
        r = Renderer(32, 32, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=True), seed=1)
        r.set_camera(away)
        for _ in range(3):
            r.render()
        assert np.abs(np.asarray(r._frame)).max() < 1e-6
        assert r._sched_cache.get("replays", 0) == 0


def test_samples_per_slot_bit_identical(scene):
    """S samples per emit slot only re-chunks the march (same sample
    positions, same jitter, fewer occupancy probes): frames must be
    bit-identical across (n_iters, samples_per_slot) splits of the same
    per-superstep sample count — and across different superstep sizes."""
    vol, tf, mc = scene
    cam = Camera.default_for_dims(vol.dims)
    frames = {}
    for k, s in ((8, 1), (4, 2), (2, 4), (8, 2)):
        r = Renderer(32, 32, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(n_iters=k, samples_per_slot=s,
                                               compact=True), seed=4)
        r.set_camera(cam)
        r.render()
        frames[(k, s)] = r.mapframe()
    assert frames[(8, 1)][..., 3].max() > 0.1
    for key in ((4, 2), (2, 4), (8, 2)):
        np.testing.assert_array_equal(frames[key], frames[(8, 1)])


def test_warmup_precompiles_and_matches(scene):
    """Renderer.warmup() compiles the bucket family without disturbing
    output: a warmed renderer's frame equals an unwarmed one's."""
    vol, tf, mc = scene
    kw = dict(sample_fn=reference_sample_fn, sample_ctx=vol.data,
              settings=RaymarchSettings(n_iters=4, compact=True))
    cam = Camera.default_for_dims(vol.dims)
    r1 = Renderer(96, 96, mc, tf, **kw)  # r=9216 > MIN_BUCKET → 2 buckets
    r1.set_camera(cam)
    from instantvnr_tpu.render.compaction import bucket_sizes

    n = r1.warmup(parallel=True)
    assert n == len(bucket_sizes(96 * 96)) >= 2
    assert r1.frame_index == 0  # accumulation untouched
    f1 = np.asarray(r1.render())
    r2 = Renderer(96, 96, mc, tf, **kw)
    r2.set_camera(cam)
    f2 = np.asarray(r2.render())
    np.testing.assert_allclose(f1, f2, atol=1e-6)
