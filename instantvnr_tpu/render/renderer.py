"""Main renderer — the TPU counterpart of `MainRenderer` (renderer.h:55-237).

Owns the scene (volume/network + macrocell + transfer function), the camera,
and the progressive accumulation buffer. A frame is ONE jitted device program:
ray generation → box intersection → masked-wavefront ray marching → blend into
the accumulation buffer (writePixelColor semantics, raytracing.h:196-207).
Frame readback (`mapframe`) is an explicit device→host transfer the caller
pays for only when displaying, mirroring the reference's async double-buffered
download (framebuffer.h:7-101) — under jit, dispatch is already async, so the
next frame's compute overlaps the previous frame's host copy naturally.

Render modes (api.h:36-60, reduced to the TPU-meaningful matrix):
  the reference's {OptiX reference, DECODING, SAMPLE_STREAMING, IN_SHADER}
  execution strategies collapse to WHAT the sample function is:
    - REFERENCE: trilinear GT lookup (covers both the OptiX reference
      renderer and the "decoding" modes — one jitted marcher over a texture)
    - NEURAL: batched network inference inside the march (sample-streaming)
  and the Pallas fused raymarch+network kernel (in-shader) slots in as a
  third sample_fn implementation without changing this class.
Shading {none, gradient} × method {raymarch, pathtrace} are settings.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel.macrocell import MacroCell
from instantvnr_tpu.render.camera import Camera, camera_rays
from instantvnr_tpu.render.raymarch import RaymarchSettings, raymarch
from instantvnr_tpu.utils.math import ray_box_intersect
from instantvnr_tpu.utils.tfn import TransferFunction


@partial(jax.jit, static_argnums=(0, 1))
def _frame_rays(width: int, height: int, cam_arrays, dims, light_dir, xform):
    """Ray generation + clip-box intersection + view-flipped light, as its
    own program (the compacted path marches outside jit). Applies the
    volume transform (render/transform.py): scaling via the world→voxel ray
    map, clipping via the box bounds (api.cpp:322-351)."""
    from instantvnr_tpu.render.transform import clip_bounds, rays_to_voxel

    cam = Camera(
        eye=cam_arrays[0], center=cam_arrays[1], up=cam_arrays[2],
        fovy=cam_arrays[3],
    )
    org_w, dirn_w = camera_rays(cam, width, height)
    org, dirn = rays_to_voxel(xform, dims, org_w, dirn_w)
    lo, hi = clip_bounds(xform, dims)
    t0, t1, hit = ray_box_intersect(org, dirn, lo, hi)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)
    from instantvnr_tpu.utils.math import normalize

    view = normalize(cam_arrays[1] - cam_arrays[0])
    light = jnp.where(jnp.dot(view, light_dir) > 0, -light_dir, light_dir)
    return org, dirn, t0, t1, light, lo, hi


@partial(jax.jit, donate_argnums=(1,))
def _accumulate(rgba, accum, frame_index):
    """Progressive accumulation (writePixelColor, raytracing.h:196-207)."""
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    return accum, accum / frame_index.astype(jnp.float32)


@partial(jax.jit, donate_argnums=(0,))
def _accum_fix(accum, bad, good, frame_index):
    """Replace a rolled-back provisional frame's contribution (deferred
    replay validation failed): exact when the frame was the accumulation
    reset (accum == bad ⇒ result == good), ~1 ulp otherwise — and the
    serialized redo result `good` is the ground-truth frame."""
    accum = accum - bad + good
    return accum, accum / frame_index.astype(jnp.float32)


def settle_provisional(sched_cache, pending, redo_fn, accum):
    """Resolve a deferred-validation pending frame (shared by the
    wavefront and path-trace renderers — ONE copy of the rollback
    protocol). pending = (rgba, cam_arrays, sub key, frame_index) or
    None; redo_fn(cam_arrays, sub) re-renders that frame serialized with
    the SAME key — the ground truth. Returns None when nothing needs
    fixing, else the repaired (accum, frame)."""
    if pending is None:
        return None
    from instantvnr_tpu.render.compaction import settle_pending

    if settle_pending(sched_cache):
        return None
    rgba_bad, cam_arrays, sub, fidx = pending
    good = redo_fn(cam_arrays, sub)
    return _accum_fix(accum, rgba_bad, good, jnp.int32(fidx))


def discard_provisional(sched_cache, pending):
    """Drop a pending frame together with the accumulation it belongs to
    (reset/resize): no rollback, but still resolve validity so an unsafe
    schedule is cleared for re-recording (settle_pending pops either
    way)."""
    if pending is not None:
        from instantvnr_tpu.render.compaction import settle_pending

        settle_pending(sched_cache)


@partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(9,))
def _render_frame(
    sample_fn,
    width: int,
    height: int,
    settings: RaymarchSettings,
    sample_ctx,  # pytree closed over by sample_fn (volume array / params)
    cam_arrays,  # (eye, center, up, fovy) as arrays for retrace-free moves
    mc: MacroCell,
    tf: TransferFunction,
    key: jax.Array,
    accum: jnp.ndarray,
    frame_index: jnp.ndarray,
    xform=None,  # VolumeTransform (render/transform.py)
    shadow_vol=None,  # [dz,dy,dx] transmittance (shading == "shadow")
):
    from instantvnr_tpu.render.transform import default_transform

    dims = jnp.array(mc.volume_dims, jnp.float32)
    if xform is None:
        xform = default_transform(dims)
    org, dirn, t0, t1, light, lo, hi = _frame_rays(
        width, height, cam_arrays, dims,
        jnp.asarray(settings.light_dir, jnp.float32), xform)

    jitter = jax.random.uniform(key, (org.shape[0],), jnp.float32)
    rgba = raymarch(partial(sample_fn, sample_ctx), org, dirn, t0, t1, mc, tf,
                    jitter, settings, light_dir=light, scale=xform.scale,
                    clip_lower=lo, clip_upper=hi, shadow_vol=shadow_vol)

    # progressive accumulation (writePixelColor, raytracing.h:196-207)
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    frame = accum / frame_index.astype(jnp.float32)
    return accum, frame


class FusedPipelineMixin:
    """Shared fused whole-frame machinery for the wavefront and path-trace
    renderers: per-camera array caching, the device-resident frame
    counter, and the pipelined provisional-frame settle (fused frames'
    validity counts are read with a lag so frames stay in flight; the
    rare invalid rolls back via _accum_fix + a serialized same-key
    redo)."""

    def _init_fused_pipeline(self):
        self._cam_cache = None  # (Camera, device cam_arrays)
        # device-resident frame counter (the fused program advances it,
        # sparing the per-frame int32 upload); None = resync from
        # self.frame_index at the next fused frame
        self._fidx_dev = None
        # fused provisional frames awaiting validation, settled with a
        # lag so the pipeline keeps frames in flight (blocking on a
        # frame's counts before dispatching the next costs a full
        # compute+RTT serialization per frame: 9.7 → 12.9 fps @512² at
        # depth 3, flat at 4 — NOTES_ROUND4): list of
        # (rgba, cam_arrays, lazysub, frame_index, pend, subs)
        self._pending_fused = []
        self._fused_depth = 3

    def _cached_cam_arrays(self):
        if self._cam_cache is not None and self._cam_cache[0] == self.camera:
            return self._cam_cache[1]
        cam = self.camera
        ca = (jnp.asarray(cam.eye, jnp.float32),
              jnp.asarray(cam.center, jnp.float32),
              jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
        self._cam_cache = (cam, ca)
        return ca

    @staticmethod
    def _resolve_sub(sub):
        """Fused frames store ("_lazykey", master_key) instead of the
        frame's sub-key (deriving it eagerly would cost the dispatch the
        fused path removes); split it here, only on the rare rollback."""
        if isinstance(sub, tuple) and len(sub) == 2 and sub[0] == "_lazykey":
            return jax.random.split(sub[1])[1]
        return sub

    def _settle_fused(self, keep: int = 0):
        """Settle fused provisional frames until at most `keep` remain.

        Valid (the overwhelmingly common case): drop. Invalid: clear the
        schedule caches so the next frame re-records, re-render THAT
        frame serialized with its own key, and swap its contribution in
        the accumulation (additive, so fixing an older frame is exact up
        to ~1 ulp; the division renormalizes by the CURRENT count)."""
        while len(self._pending_fused) > keep:
            rgba_bad, ca, sub, fidx, pend, subs = self._pending_fused.pop(0)
            if all(int(h) <= m_new for h, m_new in pend):
                continue
            self._sched_cache["invalidated"] = (
                self._sched_cache.get("invalidated", 0) + 1)
            for c in subs:
                c.pop("ops", None)
            good = self._compacted_rgba(ca, self._resolve_sub(sub), None,
                                        False)
            self._accum, self._frame = _accum_fix(
                self._accum, rgba_bad, good, jnp.int32(self.frame_index))

    def _discard_fused(self):
        """Drop fused provisional frames with the accumulation they belong
        to — but still resolve validity so an unsafe schedule is cleared
        for re-recording (mirrors discard_provisional)."""
        pendings, self._pending_fused = self._pending_fused, []
        for _rgba, _ca, _sub, _fidx, pend, subs in pendings:
            if not all(int(h) <= m_new for h, m_new in pend):
                self._sched_cache["invalidated"] = (
                    self._sched_cache.get("invalidated", 0) + 1)
                for c in subs:
                    c.pop("ops", None)


class Renderer(FusedPipelineMixin):
    """Stateful frame orchestrator (host-side state, device-side compute)."""

    def __init__(self, width: int, height: int, mc: MacroCell,
                 tf: TransferFunction,
                 sample_fn: Callable[..., jnp.ndarray],
                 sample_ctx=None,
                 settings: RaymarchSettings | None = None,
                 seed: int = 0, transform=None):
        from instantvnr_tpu.render.transform import default_transform

        self.width = width
        self.height = height
        self.mc = mc
        self.tf = tf
        self.sample_fn = sample_fn
        self.sample_ctx = sample_ctx
        self.settings = settings or RaymarchSettings()
        self.transform = transform or default_transform(mc.volume_dims)
        self.camera = Camera.default_for_dims(mc.volume_dims)
        self._key = jax.random.PRNGKey(seed)
        self._accum = jnp.zeros((width * height, 4), jnp.float32)
        self._frame = self._accum
        self.frame_index = 0
        self.shadow_volume = None  # [dz,dy,dx] for shading == "shadow"
        # previous frame's superstep/compaction schedule, replayed
        # free-running by the compacted driver (compaction.drive_compacted)
        self._sched_cache: dict = {}
        # provisional frame awaiting deferred replay validation:
        # (rgba, cam_arrays, sub key, frame_index) — settled at the next
        # render()/mapframe(), rolled back + re-rendered if invalid
        self._pending_frame = None
        # per-camera ray buffers for the fused whole-frame path (the rays
        # of a progressive accumulation are identical frame to frame; the
        # fused program must NOT be handed freshly dispatched ray programs
        # each frame — that link latency is what it exists to remove)
        self._rays_cache = None  # (key tuple, _frame_rays output)
        self._parity_handle = None
        self._init_fused_pipeline()
        self._queue_parity_check()

    # -- transactional updates (reference MainRenderer::set_*) --------------

    def set_camera(self, cam: Camera):
        self.camera = cam
        self.reset_accumulation()

    def set_transfer_function(self, tf: TransferFunction):
        self.tf = tf
        self.reset_accumulation()

    def set_sample_fn(self, sample_fn, sample_ctx=None):
        self.sample_fn = sample_fn
        self.sample_ctx = sample_ctx
        self._queue_parity_check()
        self.reset_accumulation()

    def set_sample_ctx(self, sample_ctx):
        """Swap the sample context (e.g. updated network params during
        online training) WITHOUT retracing the frame program."""
        self.sample_ctx = sample_ctx
        self._queue_parity_check()
        self.reset_accumulation()

    def _queue_parity_check(self):
        """Queue the async emission-parity check (occ_slot col 0 ==
        mc.max_opacity — brickcache.emission_parity_handle). Resolved at the
        next mapframe(); dedup by array identity so repeated ctx swaps of
        the same pool cost nothing."""
        ctx = self.sample_ctx
        occ = ctx.get("occ_slot") if isinstance(ctx, dict) else None
        if occ is None:
            self._parity_handle = None
            return
        key = (id(occ), id(self.mc.max_opacity))
        if key == getattr(self, "_parity_ok_key", None):
            return
        from instantvnr_tpu.render.brickcache import emission_parity_handle

        self._parity_handle = emission_parity_handle(self.mc, ctx)
        self._parity_key = key

    def _resolve_parity_check(self):
        h = getattr(self, "_parity_handle", None)
        if h is None:
            return
        self._parity_handle = None
        if not bool(h):
            raise RuntimeError(
                "emission-parity invariant violated: sample_ctx['occ_slot']"
                " column 0 != mc.max_opacity — the fused occ_slot sampling"
                " row would emit against stale occupancy (rebuild the brick"
                " pool after any macrocell update; see render/brickcache.py)")
        self._parity_ok_key = self._parity_key

    def set_settings(self, settings: RaymarchSettings):
        self.settings = settings
        self.reset_accumulation()

    def set_shadow_volume(self, shadow_vol):
        """Attach the directional-light transmittance grid for the
        FULL_SHADOW variant (settings.shading == "shadow"); compute it
        with render.shadow.shadow_volume_for. Traced pytree — no retrace
        beyond the one None→array switch."""
        self.shadow_volume = shadow_vol
        self.reset_accumulation()

    def set_transform(self, transform):
        """Clipping box / scaling update (vnrVolumeSetClippingBox /
        vnrVolumeSetScaling, api.cpp:322-351). Traced pytree — no retrace."""
        self.transform = transform
        self.reset_accumulation()

    def resize(self, width: int, height: int):
        pf, self._pending_frame = self._pending_frame, None
        discard_provisional(self._sched_cache, pf)
        self._discard_fused()
        self._sched_cache.pop("ops", None)  # schedules are size-specific
        self.width, self.height = width, height
        self._fidx_dev = None
        self._rays_cache = None
        self._accum = jnp.zeros((width * height, 4), jnp.float32)
        # _frame must match the new size too: a mapframe() between resize
        # and the next render (e.g. an async viewer answering a frame
        # request) would otherwise reshape a stale buffer and crash
        self._frame = self._accum
        self.frame_index = 0

    def reset_accumulation(self):
        pf, self._pending_frame = self._pending_frame, None
        discard_provisional(self._sched_cache, pf)
        self._discard_fused()
        self.frame_index = 0
        self._fidx_dev = None  # device counter resyncs at next fused frame
        if self._sched_cache.get("ops") or any(
                isinstance(v, dict) and v.get("ops")
                for v in self._sched_cache.values()):
            # camera/TF/params changed: the recorded schedule is stale for
            # the next frame's count trajectory — replay it one rung
            # relaxed (compaction.bump_schedule) instead of risking an
            # invalidation rollback (measured: midpoint-tight schedules
            # invalidated 5/16 orbit frames at 768², NOTES_ROUND5)
            self._sched_cache["bump_next"] = True

    def warmup(self, parallel: bool = True):
        """Pre-compile this renderer's programs before the first timed frame.
        For the compacted wavefront that means the whole bucket-program
        family IN PARALLEL (compaction.warmup_programs — cold-compile there
        is the dominant startup cost); other paths just render one frame.
        Accumulation state is left untouched."""
        if self.settings.compact and not self.settings.fixed_steps:
            import dataclasses

            from instantvnr_tpu.render.compaction import warmup_programs

            r = self.width * self.height
            settings = self.settings
            if settings.tiles > 1:
                # band programs carry tiles=1 settings and band-size frames
                band = -(-r // settings.tiles)
                settings = dataclasses.replace(settings, tiles=1)
                n = warmup_programs(
                    self.sample_fn, settings, self.mc, self.tf, band,
                    sample_ctx=self.sample_ctx,
                    scale=self.transform.scale, parallel=parallel,
                    shadow_vol=self.shadow_volume)
                if r % band:  # smaller trailing band has its own family
                    n += warmup_programs(
                        self.sample_fn, settings, self.mc, self.tf,
                        r % band, sample_ctx=self.sample_ctx,
                        scale=self.transform.scale, parallel=parallel,
                        shadow_vol=self.shadow_volume)
                return n
            return warmup_programs(
                self.sample_fn, settings, self.mc, self.tf, r,
                sample_ctx=self.sample_ctx,
                scale=self.transform.scale, parallel=parallel,
                shadow_vol=self.shadow_volume)
        self.render()
        self.reset_accumulation()
        return 1

    # -- frame loop ---------------------------------------------------------

    def _compacted_rgba(self, cam_arrays, sub, schedule_cache, defer):
        """One compacted-wavefront frame's rgba (pre-accumulation)."""
        from instantvnr_tpu.render.compaction import raymarch_compacted

        org, dirn, t0, t1, light, lo, hi = _frame_rays(
            self.width, self.height, cam_arrays,
            jnp.array(self.mc.volume_dims, jnp.float32),
            jnp.asarray(self.settings.light_dir, jnp.float32),
            self.transform)
        jitter = jax.random.uniform(sub, (org.shape[0],), jnp.float32)
        return raymarch_compacted(
            self.sample_fn, org, dirn, t0, t1, self.mc, self.tf,
            jitter, self.settings, light_dir=light,
            sample_ctx=self.sample_ctx, scale=self.transform.scale,
            clip_lower=lo, clip_upper=hi,
            shadow_vol=self.shadow_volume,
            schedule_cache=schedule_cache, defer=defer)

    def _cached_frame_rays(self, cam_arrays):
        """The frame's ray buffers, cached per (camera, size, transform,
        light): identical across a progressive accumulation, so the fused
        whole-frame path reuses them instead of re-dispatching _frame_rays
        (and its link round-trip) every frame."""
        ck = (self.camera, self.width, self.height, id(self.transform),
              self.settings.light_dir)
        if self._rays_cache is not None and self._rays_cache[0] == ck:
            return self._rays_cache[1]
        out = _frame_rays(self.width, self.height, cam_arrays,
                          jnp.array(self.mc.volume_dims, jnp.float32),
                          jnp.asarray(self.settings.light_dir, jnp.float32),
                          self.transform)
        self._rays_cache = (ck, out)
        return out

    def _fused_frame_try(self, cam_arrays):
        """One whole-frame fused dispatch (compaction.fused_frame), or
        None when the schedule isn't stable/compiled yet. Passes the
        PRE-advance master key + frame counter (the program advances
        both); donates the accumulation buffer. Returns
        (key_next, fidx_dev, accum, frame, rgba)."""
        from instantvnr_tpu.render.compaction import fused_frame

        org, dirn, t0, t1, light, lo, hi = self._cached_frame_rays(
            cam_arrays)
        if self._fidx_dev is None:
            self._fidx_dev = jnp.int32(self.frame_index)
        return fused_frame(
            self.sample_fn, self.settings, self._sched_cache, self.mc,
            self.tf, light, org, dirn, t0, t1, self._key, self._accum,
            self._fidx_dev, sample_ctx=self.sample_ctx,
            scale=self.transform.scale, shadow_vol=self.shadow_volume)

    def _settle(self):
        """Resolve the previous frame's deferred replay validation
        (settle_provisional — rollback + same-key serialized redo on the
        rare invalid replay) and every fused pending past the pipeline
        depth."""
        pf, self._pending_frame = self._pending_frame, None
        out = settle_provisional(
            self._sched_cache, pf,
            lambda ca, sub: self._compacted_rgba(
                ca, self._resolve_sub(sub), None, False),
            self._accum)
        if out is not None:
            self._accum, self._frame = out
        self._settle_fused(keep=self._fused_depth - 1)

    def render(self):
        """Render one frame (async dispatch; returns the device frame array)."""
        self._settle()
        cam_arrays = self._cached_cam_arrays()
        if self.settings.compact and not self.settings.fixed_steps:
            # whole-frame fused path first: key/counter advance on device
            out = self._fused_frame_try(cam_arrays)
            if out is not None:
                key_prev = self._key
                (self._key, self._fidx_dev, self._accum, self._frame,
                 rgba, pend, subs) = out
                self.frame_index += 1
                if pend:
                    # the redo sub-key is derived from key_prev only on
                    # the rare rollback (_resolve_sub) — splitting it now
                    # would cost the dispatch the fused path removes
                    self._pending_fused.append(
                        (rgba, cam_arrays, ("_lazykey", key_prev),
                         self.frame_index, pend, subs))
                if not self.settings.deferred_validation:
                    self._settle_fused(keep=0)  # always provisional
                return self._frame
        self.frame_index += 1
        self._fidx_dev = None  # fused counter resyncs after host frames
        self._key, sub = jax.random.split(self._key)
        if self.frame_index == 1:
            # fresh accumulation buffer (donated each frame)
            self._accum = jnp.zeros((self.width * self.height, 4), jnp.float32)
        if self.settings.compact and not self.settings.fixed_steps:
            rgba = self._compacted_rgba(
                cam_arrays, sub, self._sched_cache,
                defer=self.settings.deferred_validation)
            if "pending" in self._sched_cache:
                # provisional frame: keep what a rollback needs
                self._pending_frame = (rgba, cam_arrays, sub,
                                       self.frame_index)
            self._accum, self._frame = _accumulate(
                rgba, self._accum, jnp.int32(self.frame_index))
            return self._frame
        self._accum, self._frame = _render_frame(
            self.sample_fn, self.width, self.height, self.settings,
            self.sample_ctx, cam_arrays, self.mc, self.tf, sub, self._accum,
            jnp.int32(self.frame_index), self.transform,
            self.shadow_volume,
        )
        return self._frame

    def mapframe(self) -> np.ndarray:
        """Blocking device→host readback as [H, W, 4] float32
        (reference FrameBuffer::mapframe, framebuffer.h:84-94)."""
        self._settle()
        self._settle_fused(keep=0)  # a displayed frame is never provisional
        self._resolve_parity_check()
        return np.asarray(self._frame).reshape(self.height, self.width, 4)


def reference_sample_fn(volume: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """GT sample function: cell-centered trilinear texture lookup
    (sampleVolume, raytracing.h:105-110). ctx = the volume array."""
    from instantvnr_tpu.ops.trilinear import sample_volume

    return sample_volume(volume, p)


_NEURAL_SAMPLE_FN_CACHE: dict = {}


def make_neural_sample_fn(field, chunk: int = 1 << 18):
    """Neural sample function factory: batched network inference — the
    reference's sample-streaming mode (`NeuralVolume::inference`,
    network.cu:1043). ctx = the params pytree, so online-training updates
    swap ctx without retracing.

    Inference is chunked to `chunk` samples (bounds the 16x-padded gather
    temp that would otherwise OOM at 512²+ wavefronts — see
    network_apply_chunked). Pass the ctx through models.network.render_params
    for the bf16-table fast path.

    Memoized per (field, chunk): downstream jit caches (the frame program,
    the whole compaction bucket family) key on sample_fn IDENTITY, so a
    fresh closure per call would recompile minutes of programs on every
    facade knob change."""
    key = (field, chunk)
    fn = _NEURAL_SAMPLE_FN_CACHE.get(key)
    if fn is not None:
        return fn
    from instantvnr_tpu.models.network import network_apply_chunked

    def fn(params, p):
        if isinstance(params, dict) and "_render" not in params:
            # trace-time check (runs once per ctx treedef): an unmarked ctx
            # in a render context silently loses the inference fast paths
            # (Pallas MLP / packed gathers) — pass params through
            # models.network.render_params (models/network.py docstring)
            import warnings

            if not _NEURAL_SAMPLE_FN_CACHE.get("_warned"):
                _NEURAL_SAMPLE_FN_CACHE["_warned"] = True
                warnings.warn(
                    "neural sample ctx lacks the '_render' marker — "
                    "inference fast paths disabled; build the ctx with "
                    "models.network.render_params", stacklevel=2)
        return network_apply_chunked(params, p, field, chunk=chunk)[:, 0]

    _NEURAL_SAMPLE_FN_CACHE[key] = fn
    return fn
