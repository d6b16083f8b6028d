"""Volumetric path tracer — delta tracking with per-macrocell majorants.

TPU redesign of `core/renderer/method_pathtracing.cu`. The CUDA wavefront
suspends/resumes per-ray `DeltaTrackingIter` payloads through atomic queues
(:82-172, :679-813); here every ray advances ONE tracking event per
bulk-synchronous superstep of a masked lax.while_loop:

  event = consume the remaining optical depth τ through up to
  cell_skips+1 macrocells (majorant = cell max-opacity × density_scale —
  the per-cell varying majorant of delta_tracking, :261-359; crossings
  whose τ budget survives consume no RNG and no volume sample, so they
  fold into the event as pure VPU work), which yields one of
    - cell exit   → move to the next cell (τ partially consumed)
    - volume exit → escape lighting / shadow-ray resolution
    - collision candidate → ONE batched volume sample + TF classification,
      accepted with probability σ(x)/majorant

and the per-ray state machine on top is the reference's wavefront program
(path_tracing_traceray, :424-476):
    primary/scatter ray hit → russian roulette (>4 scatters, q=min(.95,
    max(throughput)), :366-376) → move origin, throughput ×= 0.6·albedo
    (PHASE, :35) → fire a SHADOW ray toward the directional light;
    shadow ray resolved (escape adds light_directional_rgb, hit adds
    nothing) → continue with a uniform-sphere scatter direction;
    scatter-ray escape adds throughput·light_ambient (not for primaries).

Progressive: one sample/pixel/frame, averaged by the caller's accumulation
buffer. All volume samples in a superstep form one batched sample_fn call.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE, MacroCell
from instantvnr_tpu.render.camera import Camera, camera_rays
from instantvnr_tpu.render.renderer import FusedPipelineMixin
from instantvnr_tpu.render.raymarch import (_PROBE_EPS, _cell_exit_t,
                                            _cell_flat, _occupancy)
from instantvnr_tpu.utils.math import normalize, ray_box_intersect
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls

_EPS = 1e-6
RUSSIAN_ROULETTE_LENGTH = 4  # method_pathtracing.cu:33
PHASE_FACTOR = 0.6  # PHASE(albedo) = 0.6·albedo (:35)


@dataclass(frozen=True)
class PathTraceSettings:
    density_scale: float = 1.0
    max_events: int = 512  # superstep bound per frame sample
    light_ambient: float = 1.5  # instantvnr_types.h:146
    light_rgb: tuple = (1.0, 1.0, 1.0)
    light_dir: tuple = (0.7, 0.9, 0.4)  # flipped against view (renderer.cpp:98-100)
    # host-orchestrated bucketed ray compaction (the reference wavefront
    # PT exists because paths die exponentially — RR after 4 scatters,
    # method_pathtracing.cu:366-376; this is the TPU analog, same scheme
    # as render/compaction.py). Only honored by PathTraceRenderer.render
    # (needs host-side live counts).
    compact: bool = False
    # tracking events per device dispatch in the compacted driver: amortizes
    # the per-dispatch scalar readback; keep ≤ ~10 (long device programs
    # fault through the tunnel). Re-swept under schedule replay (dispatches
    # ~2 ms instead of ~30): 2→3.20, 4→3.11, 8→2.43, 16→2.15 fps @512²
    # decoded — finer chunks compact sooner; 4 keeps the serialized
    # (first-frame/camera-move) dispatch count reasonable.
    events_per_dispatch: int = 4
    # buckets ≤ this run ONE run-to-completion while_loop program instead of
    # per-dispatch event chunks (compaction._FINISH_BUCKET analog): each
    # dispatch costs ~25-30 ms of device-link latency while a PT event at
    # 16384 rays computes for well under 1 ms, so the exponential tail
    # (RR after 4 scatters) is pure dispatch overhead without this.
    # Measured @512² decoded (scratch/pt_finish_sweep.py, pre-replay):
    # 0→0.78, 16384→1.14, 32768→0.99, 65536→0.71 fps — larger finishers
    # lose because the while_loop pays full-bucket compute while paths
    # decay. Re-swept under schedule replay at epd=4: 8192→3.11,
    # 16384→2.59, 32768→2.14 (8192 = the compaction bucket floor, so the
    # finisher fires only for the last bucket; anything below the floor
    # never fires).
    finish_bucket: int = 8192
    # extra τ-consuming cell crossings folded into each tracking event
    # (raymarch._emit_samples skip-loop analog): crossing a cell whose
    # majorant budget is exhausted consumes no RNG and needs no volume
    # sample — pure VPU work. Measured @512² decoded: 0→1.15, 2→1.21,
    # 4→1.05, 8→0.88 fps — vorts majorants are high enough that most
    # events are already collision candidates, so keep this small.
    cell_skips: int = 2
    # wrap a plain decoded/GT grid ctx into a corner-packed brick pool
    # (render/brickcache.build_brick_cache_from_grid): 2 gathers/sample
    # instead of sample_volume's 8, exact on occupied cells up to float
    # summation order — and PT samples only ever land in occupied cells.
    # None = auto (on when the pool fits grid_bricks_max_bytes),
    # True/False = force.
    grid_bricks: bool | None = None
    grid_bricks_max_bytes: int = 2 << 30
    # speculative dispatch depth (compaction driver): keep up to this many
    # event-chunk live-counts in flight (copy_to_host_async) and act on
    # them stale — counts only decrease within a frame so the bucket stays
    # ≥ live. 0 = serialized schedule. See RaymarchSettings.speculate for
    # the measured per-dispatch wall (32 → 9.5 ms at depth 2, v5e tunnel)
    # and the end-to-end counter-evidence (delayed compaction loses more).
    speculate: int = 0
    # replay the previous frame's event-chunk/compaction schedule
    # free-running, validated post-hoc (compaction._replay) — the
    # progressive-accumulation fast path. Estimator-neutral: schedule
    # changes only remap slots to RNG draws.
    schedule_replay: bool = True
    # settle replay validation at the next frame (see
    # RaymarchSettings.deferred_validation); rollback + serialized redo on
    # the rare invalid replay.
    deferred_validation: bool = True
    # fuse a stable replayed schedule into ONE whole-frame device program
    # (jittered ray gen + every event chunk/compaction/finisher +
    # unpermute + accumulation), AOT-compiled in the background — see
    # RaymarchSettings.fused_replay / compaction._frame_body for the
    # measured per-dispatch link costs this removes.
    fused_replay: bool = True

    def __post_init__(self):
        # the compacted driver advances whole events_per_dispatch chunks:
        # a non-divisible budget would overshoot max_events on the last
        # chunk and diverge from the in-jit tracker's exact stop
        assert self.max_events % self.events_per_dispatch == 0, (
            self.max_events, self.events_per_dispatch)


class _PTState(NamedTuple):
    org: jnp.ndarray  # [R,3] current segment origin (voxel space)
    dirn: jnp.ndarray  # [R,3]
    t: jnp.ndarray  # [R] position along current segment
    t_far: jnp.ndarray  # [R]
    tau: jnp.ndarray  # [R] remaining optical depth to next candidate
    throughput: jnp.ndarray  # [R,3]
    radiance: jnp.ndarray  # [R,3]
    scatter_index: jnp.ndarray  # [R] int32
    shadow: jnp.ndarray  # [R] bool
    active: jnp.ndarray  # [R] bool


def _uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """uniform_sample_sphere (raytracing.h:263-269). u: [R,2]."""
    phi = 2.0 * jnp.pi * u[:, 0]
    cos_t = 1.0 - 2.0 * u[:, 1]
    sin_t = 2.0 * jnp.sqrt(jnp.maximum(u[:, 1] * (1.0 - u[:, 1]), 0.0))
    return jnp.stack(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )


def _restart_segment(org, dirn, box_lo, box_hi):
    """After a direction change the segment starts at the origin (inside the
    volume): tnear 0, tfar = box exit. The box is the CLIP box when one is
    set (the reference overwrites DeviceVolume::bbox, object.cpp:386-391)."""
    _, t1, hit = ray_box_intersect(org, dirn, box_lo, box_hi)
    return jnp.where(hit, jnp.maximum(t1, 0.0), 0.0)


def pathtrace(
    sample_fn: Callable[[jnp.ndarray], jnp.ndarray],
    org: jnp.ndarray,  # [R,3] voxel-space origins
    dirn: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    mc: MacroCell,
    tf: TransferFunction,
    key: jax.Array,
    settings: PathTraceSettings,
    light_dir_world: jnp.ndarray,
    scale=None,  # [3] voxel→world scaling (render/transform.py)
    clip_lower=None,  # [3] voxel-space clip box
    clip_upper=None,
) -> jnp.ndarray:
    """One progressive sample per ray → radiance rgba [R, 4].

    Under anisotropic scaling the caller hands VOXEL-space rays with
    UNNORMALIZED directions (t stays world-metric, so the optical depth per
    t is unchanged); scatter/shadow directions generated here are drawn in
    world space and mapped through S⁻¹ the same way."""
    r = org.shape[0]
    dims = jnp.array(mc.volume_dims, jnp.float32)
    light_dir = normalize(light_dir_world)
    light_rgb = jnp.asarray(settings.light_rgb, jnp.float32)
    box_lo = jnp.zeros(3) if clip_lower is None else clip_lower
    box_hi = dims if clip_upper is None else clip_upper
    s_inv = (jnp.ones(3, jnp.float32) if scale is None
             else 1.0 / jnp.asarray(scale, jnp.float32))
    light_v = light_dir * s_inv  # world light → voxel marching direction

    k_tau, key = jax.random.split(key)
    state = _PTState(
        org=org,
        dirn=dirn,
        t=t_near,
        t_far=t_far,
        tau=-jnp.log1p(-jax.random.uniform(k_tau, (r,))),
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        scatter_index=jnp.zeros((r,), jnp.int32),
        shadow=jnp.zeros((r,), bool),
        active=t_near < t_far,
    )
    consts = _PTConsts(light_v=light_v, light_rgb=light_rgb, s_inv=s_inv,
                       box_lo=box_lo, box_hi=box_hi, dims=dims)

    def superstep(carry):
        st, key, it = carry
        key, st = _pt_event(sample_fn, settings, mc, tf, consts, st, key)
        return st, key, it + 1

    def cond(carry):
        st, _, it = carry
        return jnp.any(st.active) & (it < settings.max_events)

    state, _, _ = jax.lax.while_loop(cond, superstep,
                                     (state, key, jnp.int32(0)))
    alpha = jnp.where(state.scatter_index > 0, 1.0, 0.0)
    return jnp.concatenate([state.radiance, alpha[:, None]], axis=-1)


class _PTConsts(NamedTuple):
    """Per-frame traced constants shared by every tracking event."""

    light_v: jnp.ndarray  # [3] light direction in voxel marching space
    light_rgb: jnp.ndarray  # [3]
    s_inv: jnp.ndarray  # [3] world→voxel direction map
    box_lo: jnp.ndarray  # [3] clip/volume box
    box_hi: jnp.ndarray
    dims: jnp.ndarray  # [3] volume dims (f32)


def _pt_event(sample_fn, settings: PathTraceSettings, mc: MacroCell,
              tf: TransferFunction, consts: _PTConsts, st: _PTState,
              key: jax.Array, occ_aux=None, fused_fn=None):
    """ONE delta-tracking event for every ray in `st` (masked): advance
    through up to settings.cell_skips τ-surviving cell crossings, then
    resolve the final cell (collision candidate / exit / plain crossing).

    Shared verbatim by the in-jit while_loop (`pathtrace`) and the
    host-orchestrated compaction driver (`pathtrace_compacted`), so the two
    schedules are bit-identical for identical key chains and ray order.
    Returns (next carried key, new state); the key discipline is
    key, k1..k5 = split(key, 6) per event.
    """
    r = st.org.shape[0]
    w = float(MACROCELL_SIZE)
    key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)

    # --- advance τ through up to cell_skips+1 cells -------------------
    # a crossing whose τ budget survives the cell consumes no RNG and
    # needs no volume sample, so several fold into one event as pure VPU
    # work (occupancy gather + boundary math) — the emit-skip-loop analog
    def _adv(_, c):
        t, tau = c
        p = st.org + (t + _PROBE_EPS)[:, None] * st.dirn
        cell = jnp.floor(p / w).astype(jnp.int32)
        majorant = _occupancy(mc, cell) * settings.density_scale
        t1 = jnp.minimum(
            jnp.maximum(_cell_exit_t(st.org, st.dirn, cell, w),
                        t + _PROBE_EPS),
            st.t_far,
        )
        dtau = (t1 - t) * majorant
        cross = (tau > dtau) & (t < st.t_far - _EPS)
        t = jnp.where(cross, t1, t)
        tau = jnp.where(cross, tau - dtau, tau)
        return (t, tau)

    t_a, tau_a = jax.lax.fori_loop(0, settings.cell_skips, _adv,
                                   (st.t, st.tau))

    # final cell of this event: collision candidate / volume exit /
    # (skip budget exhausted) one more plain crossing. With occ_aux the
    # occupancy gather fetches the (occupancy, brick slot) row instead —
    # same cost, and the slot lets the sample below skip its LUT gather
    # (raymarch._emit_samples fused-sampling analog).
    p = st.org + (t_a + _PROBE_EPS)[:, None] * st.dirn
    cell = jnp.floor(p / w).astype(jnp.int32)
    cflat = _cell_flat(mc, cell)
    if occ_aux is None:
        occ, slot_v = mc.max_opacity.reshape(-1)[cflat], None
    else:
        row = occ_aux[cflat]
        occ, slot_v = row[:, 0], row[:, 1]
    majorant = occ * settings.density_scale
    t1 = jnp.minimum(
        jnp.maximum(_cell_exit_t(st.org, st.dirn, cell, w),
                    t_a + _PROBE_EPS),
        st.t_far,
    )
    dtau = (t1 - t_a) * majorant
    crosses = tau_a > dtau  # τ survives the cell → move to next cell
    t_coll = t_a + tau_a / jnp.maximum(majorant, _EPS)
    new_t = jnp.where(crosses, t1, t_coll)
    new_tau = jnp.where(crosses, tau_a - dtau, tau_a)

    exited = crosses & (new_t >= st.t_far - _EPS)
    candidate = ~crosses  # a collision candidate inside this cell

    # --- one batched volume sample for all candidates ----------------
    pos = st.org + new_t[:, None] * st.dirn
    pos_obj = jnp.clip(pos / consts.dims, 0.0, 1.0)
    if fused_fn is not None and slot_v is not None:
        values = fused_fn(pos_obj, slot_v, cflat.astype(jnp.float32))
    else:
        values = sample_fn(pos_obj)
    rgb, alpha = classify_controls(tf, values)
    u_accept = jax.random.uniform(k1, (r,))
    real = candidate & (
        u_accept * jnp.maximum(majorant, _EPS)
        < alpha * settings.density_scale
    )
    null = candidate & ~real  # null collision: draw a fresh τ, continue
    new_tau = jnp.where(null, -jnp.log1p(-jax.random.uniform(k2, (r,))),
                        new_tau)

    # --- event handling ----------------------------------------------
    act = st.active
    radiance = st.radiance
    throughput = st.throughput
    scatter_index = st.scatter_index
    shadow = st.shadow
    org_new = st.org
    dir_new = st.dirn
    t_new = new_t
    tfar_new = st.t_far
    terminate = jnp.zeros((r,), bool)

    # (1) shadow ray resolved (exit → add light; hit → nothing), then
    #     becomes a scatter ray with a uniform-sphere direction
    shadow_done = act & shadow & (exited | real)
    radiance = jnp.where(
        (shadow_done & exited)[:, None],
        radiance + throughput * consts.light_rgb[None, :],
        radiance,
    )
    sphere = _uniform_sphere(jax.random.uniform(k3, (r, 2))) * consts.s_inv
    dir_new = jnp.where(shadow_done[:, None], sphere, dir_new)
    shadow = jnp.where(shadow_done, False, shadow)

    # (2) scatter/primary ray escaped → ambient light (not primaries)
    escape = act & ~st.shadow & exited
    radiance = jnp.where(
        (escape & (scatter_index > 0))[:, None],
        radiance + throughput * settings.light_ambient,
        radiance,
    )
    terminate = terminate | escape

    # (3) real collision on a scatter/primary ray → russian roulette,
    #     move origin, apply phase, fire shadow ray toward the light
    hit = act & ~st.shadow & real
    # floor keeps the boost division finite when throughput reaches
    # exactly zero (black TF colors) and u draws exactly 0.0 — a NaN
    # here would poison the progressive accumulation permanently
    rr_q = jnp.clip(jnp.max(throughput, axis=-1), 1e-6, 0.95)
    rr_kill = hit & (scatter_index > RUSSIAN_ROULETTE_LENGTH) & (
        jax.random.uniform(k4, (r,)) > rr_q
    )
    rr_boost = hit & (scatter_index > RUSSIAN_ROULETTE_LENGTH) & ~rr_kill
    throughput = jnp.where(
        rr_boost[:, None], throughput / rr_q[:, None], throughput
    )
    terminate = terminate | rr_kill
    hit = hit & ~rr_kill
    scatter_index = jnp.where(hit, scatter_index + 1, scatter_index)
    org_new = jnp.where(hit[:, None], pos, org_new)
    throughput = jnp.where(
        hit[:, None], throughput * PHASE_FACTOR * rgb, throughput
    )
    dir_new = jnp.where(hit[:, None], consts.light_v[None, :], dir_new)
    shadow = jnp.where(hit, True, shadow)

    # segment restarts where the direction changed
    restart = shadow_done | hit
    tfar_restart = _restart_segment(org_new, dir_new, consts.box_lo,
                                    consts.box_hi)
    tfar_new = jnp.where(restart, tfar_restart, tfar_new)
    t_new = jnp.where(restart, 0.0, t_new)
    # dedicated key: drawing from the carried `key` would reuse the
    # same key material the next superstep's split consumes, giving
    # mechanically correlated tau/scatter decisions across events
    new_tau2 = jnp.where(
        restart, -jnp.log1p(-jax.random.uniform(k5, (r,))), new_tau
    )

    active = act & ~terminate
    st = _PTState(
        org=org_new, dirn=dir_new, t=t_new, t_far=tfar_new, tau=new_tau2,
        throughput=throughput, radiance=radiance,
        scatter_index=scatter_index, shadow=shadow, active=active,
    )
    return key, st


# ---------------------------------------------------------------------------
# Host-orchestrated bucketed compaction (render/compaction.py scheme).
#
# Paths die exponentially (escape + russian roulette after 4 scatters), so
# the masked while_loop pays full-frame sampling/arithmetic long after most
# rays finished — exactly the regime the reference built its wavefront PT
# for (method_pathtracing.cu:679-813). Here: all per-ray state stays in
# _PTState, live rays are kept in a power-of-2 prefix, one jitted program
# per bucket size advances `events_per_dispatch` tracking events and
# returns the live count; the host shrinks the bucket when the count
# halves. Key discipline matches `pathtrace` exactly (one split(key,6) per
# event), so an uncompacted run is bit-identical to the in-jit loop.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(6,))
def _pt_events_prefix(sample_fn, settings: PathTraceSettings, m: int,
                      mc, tf, consts: _PTConsts, state: _PTState,
                      key: jax.Array, sample_ctx):
    """Advance `events_per_dispatch` tracking events on the first `m` rays.

    Returns (state, carried key, live count in the prefix)."""
    from instantvnr_tpu.render.compaction import _fused_sampling

    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)
    pre = jax.tree_util.tree_map(lambda a: a[:m], state)

    def body(carry, _):
        st, k = carry
        k, st = _pt_event(fn, settings, mc, tf, consts, st, k,
                          occ_aux=occ_aux, fused_fn=fused_fn)
        return (st, k), None

    (sub, key), _ = jax.lax.scan(body, (pre, key), None,
                                 length=settings.events_per_dispatch)
    new_state = jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice(
            full, part, (0,) * full.ndim),
        state, sub)
    return new_state, key, jnp.sum(sub.active.astype(jnp.int32))


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(6,))
def _pt_finish_prefix(sample_fn, settings: PathTraceSettings, m: int,
                      mc, tf, consts: _PTConsts, state: _PTState,
                      key: jax.Array, sample_ctx, budget):
    """Trace the first `m` rays to COMPLETION in ONE device program
    (in-jit while_loop over tracking events), for the small-bucket tail.
    `budget` (traced scalar) caps the remaining events so the total across
    dispatches still honors settings.max_events exactly."""
    from instantvnr_tpu.render.compaction import _fused_sampling

    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)
    pre = jax.tree_util.tree_map(lambda a: a[:m], state)

    def cond(carry):
        st, _, i = carry
        return jnp.any(st.active) & (i < budget)

    def body(carry):
        st, k, i = carry
        k, st = _pt_event(fn, settings, mc, tf, consts, st, k,
                          occ_aux=occ_aux, fused_fn=fused_fn)
        return st, k, i + 1

    sub, _, _ = jax.lax.while_loop(cond, body, (pre, key, jnp.int32(0)))
    new_state = jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice(
            full, part, (0,) * full.ndim),
        state, sub)
    return new_state, jnp.sum(sub.active.astype(jnp.int32))


@jax.jit
def _pt_unpermute(perm, radiance, scatter_index):
    """Scatter per-slot results back to pixel order → rgba [R, 4]."""
    r = perm.shape[0]
    rad = jnp.zeros((r, 3), radiance.dtype).at[perm].set(radiance)
    si = jnp.zeros((r,), scatter_index.dtype).at[perm].set(scatter_index)
    alpha = jnp.where(si > 0, 1.0, 0.0)
    return jnp.concatenate([rad, alpha[:, None]], axis=-1)


def _pt_consts(mc, settings, light_dir_world, scale, clip_lower, clip_upper):
    dims = jnp.array(mc.volume_dims, jnp.float32)
    light_dir = normalize(light_dir_world)
    s_inv = (jnp.ones(3, jnp.float32) if scale is None
             else 1.0 / jnp.asarray(scale, jnp.float32))
    return _PTConsts(
        light_v=light_dir * s_inv,
        light_rgb=jnp.asarray(settings.light_rgb, jnp.float32),
        s_inv=s_inv,
        box_lo=jnp.zeros(3) if clip_lower is None else clip_lower,
        box_hi=dims if clip_upper is None else clip_upper,
        dims=dims,
    )


def pathtrace_compacted(
    sample_fn,
    org: jnp.ndarray,
    dirn: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    mc: MacroCell,
    tf: TransferFunction,
    key: jax.Array,
    settings: PathTraceSettings,
    light_dir_world: jnp.ndarray,
    sample_ctx=None,
    scale=None,
    clip_lower=None,
    clip_upper=None,
    schedule_cache: dict | None = None,  # per-renderer dict for replay
    defer: bool = False,  # deferred replay validation — caller MUST settle
) -> jnp.ndarray:
    """`pathtrace` with host-orchestrated bucketed ray compaction.

    Must be called OUTSIDE jit (reads live counts on the host). sample_fn is
    called as sample_fn(sample_ctx, positions) and must be a long-lived
    callable (it keys the per-bucket program cache). Orchestration (incl.
    schedule replay — see compaction.drive_compacted) only changes the RNG
    *assignment* of slots to rays, never the estimator: results are
    bit-identical when no compaction/replay triggers and statistically
    identical otherwise (tests/test_pathtrace.py)."""
    import dataclasses

    from instantvnr_tpu.render.compaction import drive_compacted

    r = org.shape[0]
    consts = _pt_consts(mc, settings, light_dir_world, scale,
                        clip_lower, clip_upper)
    k_tau, k_run = jax.random.split(key)
    key_cell = [k_run]

    def make_initial():
        key_cell[0] = k_run  # replay-failure rerun uses the same chain
        state = _PTState(
            org=org + 0.0,  # fresh buffers: the bucket programs donate them
            dirn=dirn + 0.0,
            t=t_near + 0.0,
            t_far=t_far + 0.0,
            tau=-jnp.log1p(-jax.random.uniform(k_tau, (r,))),
            throughput=jnp.ones((r, 3), jnp.float32),
            radiance=jnp.zeros((r, 3), jnp.float32),
            scatter_index=jnp.zeros((r,), jnp.int32),
            shadow=jnp.zeros((r,), bool),
            active=t_near < t_far,
        )
        return (), state, jnp.arange(r, dtype=jnp.int32)

    def dispatch_super(m, rays, state):
        state, k, n_live = _pt_events_prefix(
            sample_fn, settings, m, mc, tf, consts, state, key_cell[0],
            sample_ctx)
        key_cell[0] = k
        return state, n_live

    def dispatch_finish(m, rays, state, budget):
        return _pt_finish_prefix(sample_fn, settings, m, mc, tf, consts,
                                 state, key_cell[0], sample_ctx,
                                 jnp.int32(budget))

    sched_key = (r, dataclasses.astuple(settings), scale is None,
                 clip_lower is None)
    (), state, perm = drive_compacted(
        r, make_initial, dispatch_super, dispatch_finish,
        settings.max_events, settings.events_per_dispatch,
        settings.finish_bucket, speculate=settings.speculate,
        schedule_cache=schedule_cache if settings.schedule_replay else None,
        sched_key=sched_key, defer=defer)

    return _pt_unpermute(perm, state.radiance, state.scatter_index)


def warmup_pt_programs(sample_fn, settings: PathTraceSettings, mc, tf,
                       r: int, sample_ctx=None, parallel: bool = True,
                       max_workers: int = 8) -> int:
    """Pre-compile the PT bucket-program family for frame size `r`
    (compaction.warmup_programs analog; trivial executions, t_far=0)."""
    from concurrent.futures import ThreadPoolExecutor

    from instantvnr_tpu.render.compaction import (_compact_prefix,
                                                  _count_active,
                                                  bucket_sizes)

    zeros = jnp.zeros((r,), jnp.float32)
    dirz = jnp.zeros((r, 3), jnp.float32).at[:, 2].set(1.0)
    consts = _pt_consts(mc, settings,
                        jnp.asarray(settings.light_dir, jnp.float32),
                        None, None, None)
    sizes = bucket_sizes(r)

    def warm_one(mm: int):
        st = _PTState(
            org=jnp.zeros((r, 3), jnp.float32), dirn=dirz + 0.0,
            t=zeros + 0.0, t_far=zeros + 0.0, tau=zeros + 1.0,
            throughput=jnp.ones((r, 3), jnp.float32),
            radiance=jnp.zeros((r, 3), jnp.float32),
            scatter_index=jnp.zeros((r,), jnp.int32),
            shadow=jnp.zeros((r,), bool),
            active=jnp.zeros((r,), bool),
        )
        if mm <= settings.finish_bucket:
            st, _ = _pt_finish_prefix(sample_fn, settings, mm, mc, tf,
                                      consts, st, jax.random.PRNGKey(0),
                                      sample_ctx,
                                      jnp.int32(settings.max_events))
        else:
            st, _, _ = _pt_events_prefix(sample_fn, settings, mm, mc, tf,
                                         consts, st, jax.random.PRNGKey(0),
                                         sample_ctx)
        _compact_prefix(mm, (), st, jnp.arange(r, dtype=jnp.int32))

    if parallel:
        with ThreadPoolExecutor(max_workers=min(max_workers,
                                                len(sizes))) as ex:
            list(ex.map(warm_one, sizes))
    else:
        for mm in sizes:
            warm_one(mm)
    _pt_unpermute(jnp.arange(r, dtype=jnp.int32),
                  jnp.zeros((r, 3), jnp.float32), jnp.zeros((r,), jnp.int32))
    _count_active(jnp.zeros((r,), bool))
    return len(sizes)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _pt_rays(width: int, height: int, settings, cam_arrays, mc_dims, key,
             xform=None):
    """Jittered ray generation + clip-box intersection + light flip, as its
    own program (the compacted path traces outside jit)."""
    from instantvnr_tpu.render.transform import (
        clip_bounds,
        default_transform,
        rays_to_voxel,
    )

    cam = Camera(eye=cam_arrays[0], center=cam_arrays[1], up=cam_arrays[2],
                 fovy=cam_arrays[3])
    k_jit, k_pt = jax.random.split(key)
    jit2 = jax.random.uniform(k_jit, (width * height, 2))
    org_w, dirn_w = camera_rays(cam, width, height, jitter=jit2)
    dims = jnp.asarray(mc_dims, jnp.float32)
    if xform is None:
        xform = default_transform(dims)
    org, dirn = rays_to_voxel(xform, dims, org_w, dirn_w)
    lo, hi = clip_bounds(xform, dims)
    t0, t1, hit = ray_box_intersect(org, dirn, lo, hi)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)

    # flip the light against the view direction (renderer.cpp:98-100)
    view = normalize(cam_arrays[1] - cam_arrays[0])
    light = jnp.asarray(settings.light_dir, jnp.float32)
    light = jnp.where(jnp.dot(view, light) > 0, -light, light)
    return org, dirn, t0, t1, light, lo, hi, k_pt, xform.scale


@partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(9,))
def _pt_frame(sample_fn, width, height, settings, sample_ctx, cam_arrays,
              mc, tf, key, accum, frame_index, xform=None):
    org, dirn, t0, t1, light, lo, hi, k_pt, scale = _pt_rays(
        width, height, settings, cam_arrays, mc.volume_dims, key, xform)
    rgba = pathtrace(partial(sample_fn, sample_ctx), org, dirn, t0, t1,
                     mc, tf, k_pt, settings, light, scale=scale,
                     clip_lower=lo, clip_upper=hi)
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    return accum, accum / frame_index.astype(jnp.float32)


def _pt_frame_body(sample_fn, settings: PathTraceSettings, width: int,
                   height: int, ops, mc, tf, cam_arrays, key, accum,
                   frame_index, sample_ctx, xform):
    """The whole-frame fused PT program (compaction._frame_body analog):
    master-key split + frame-counter advance, jittered ray generation,
    the recorded event-chunk/compaction/finisher schedule, unpermute and
    progressive accumulation — one dispatch per frame. Key discipline
    matches pathtrace_compacted exactly (same split chain), so a fused
    frame equals the per-dispatch frame up to XLA fusion ulps.

    Returns (key_next, frame_index, accum, frame, rgba, counts)."""
    from instantvnr_tpu.render.compaction import (_compact_body,
                                                  _fused_sampling)

    key_next, sub = jax.random.split(key)
    frame_index = frame_index + 1
    org, dirn, t0, t1, light, lo, hi, k_pt, scale = _pt_rays(
        width, height, settings, cam_arrays, mc.volume_dims, sub, xform)
    r = width * height
    consts = _pt_consts(mc, settings, light, scale, lo, hi)
    k_tau, k = jax.random.split(k_pt)
    state = _PTState(
        org=org, dirn=dirn, t=t0, t_far=t1,
        tau=-jnp.log1p(-jax.random.uniform(k_tau, (r,))),
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        scatter_index=jnp.zeros((r,), jnp.int32),
        shadow=jnp.zeros((r,), bool),
        active=t0 < t1,
    )
    perm = jnp.arange(r, dtype=jnp.int32)
    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)
    counts = [jnp.sum(state.active.astype(jnp.int32))]
    used = 0
    m = r
    for op in ops:
        if op[0] == "S":
            pre = jax.tree_util.tree_map(lambda a: a[:m], state)

            def chunk(carry, _):
                st, kk = carry
                kk, st = _pt_event(fn, settings, mc, tf, consts, st, kk,
                                   occ_aux=occ_aux, fused_fn=fused_fn)
                return (st, kk), None

            (sub_st, k), _ = jax.lax.scan(
                chunk, (pre, k), None, length=settings.events_per_dispatch)
            state = jax.tree_util.tree_map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim), state, sub_st)
            counts.append(jnp.sum(sub_st.active.astype(jnp.int32)))
            used += settings.events_per_dispatch
        elif op[0] == "C":
            (), state, perm = _compact_body(m, (), state, perm)
            m = op[1]
        else:  # "F" — run-to-completion event tail
            mf = op[1]
            pre = jax.tree_util.tree_map(lambda a: a[:mf], state)
            budget = jnp.int32(settings.max_events - used)

            def cond(carry):
                st, _kk, i = carry
                return jnp.any(st.active) & (i < budget)

            def body(carry):
                st, kk, i = carry
                kk, st = _pt_event(fn, settings, mc, tf, consts, st, kk,
                                   occ_aux=occ_aux, fused_fn=fused_fn)
                return st, kk, i + 1

            sub_st, k, _ = jax.lax.while_loop(cond, body,
                                              (pre, k, jnp.int32(0)))
            state = jax.tree_util.tree_map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim), state, sub_st)
    rgba = _pt_unpermute(perm, state.radiance, state.scatter_index)
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    frame = accum / frame_index.astype(jnp.float32)
    return key_next, frame_index, accum, frame, rgba, jnp.stack(counts)


def pt_fused_frame(sample_fn, settings: PathTraceSettings,
                   schedule_cache: dict, mc, tf, cam_arrays, key, accum,
                   frame_index, width: int, height: int, sample_ctx=None,
                   xform=None):
    """compaction.fused_frame analog for the path tracer (single band).

    Returns None (no stable fusable schedule / still compiling) or
    (key_next, frame_index, accum, frame, rgba, pend) — ALWAYS
    provisional; the caller settles `pend` with a pipeline lag and rolls
    back via the shared protocol on the rare invalid."""
    import dataclasses

    from instantvnr_tpu.render import compaction as comp

    if not (settings.fused_replay and settings.schedule_replay):
        return None
    r = width * height
    sched_key = (r, dataclasses.astuple(settings), False, False)
    ops = schedule_cache.get("ops")
    if (not ops or schedule_cache.get("key") != sched_key
            or not comp._fusable(tuple(ops))):
        schedule_cache.pop("_fused_prev", None)
        return None
    ops = comp.strip_counts(ops)
    bump = bool(schedule_cache.get("bump_next"))
    if bump:
        # motion tolerance: one-rung-relaxed schedule, tight record kept
        # (see compaction.bump_schedule)
        ops = comp.bump_schedule(ops, r)
        if not comp._fusable(ops):
            schedule_cache.pop("_fused_prev", None)
            return None
    dyn = (mc, tf, cam_arrays, key, accum, frame_index, sample_ctx, xform)
    exe_key = (sample_fn, settings, (width, height), ops,
               comp.shape_fingerprint(dyn))
    exe = comp._FUSED_EXE.get(exe_key)
    if exe is None:
        if (comp.FUSED_AUTOCOMPILE
                and schedule_cache.get("_fused_prev") == ops):
            jitted = jax.jit(
                partial(_pt_frame_body, sample_fn, settings, width, height,
                        ops),
                donate_argnums=(4,))  # accum
            comp.compile_frame_async(exe_key, jitted, dyn)
        schedule_cache["_fused_prev"] = ops
        return None
    if exe in ("compiling", "failed"):
        return None
    schedule_cache.pop("bump_next", None)  # consumed by this frame
    key_next, fidx, accum, frame, rgba, counts = exe(*dyn)
    counts.copy_to_host_async()
    pend = comp._frame_pend(((0, r, ops),), counts)
    schedule_cache["replays"] = schedule_cache.get("replays", 0) + 1
    schedule_cache["fused_frames"] = (
        schedule_cache.get("fused_frames", 0) + 1)
    return key_next, fidx, accum, frame, rgba, pend


class PathTraceRenderer(FusedPipelineMixin):
    """Progressive path-tracing frame orchestrator (same surface as
    render.renderer.Renderer)."""

    def __init__(self, width, height, mc: MacroCell, tf: TransferFunction,
                 volume_or_ctx, sample_fn=None,
                 settings: PathTraceSettings | None = None, seed: int = 0,
                 transform=None):
        from instantvnr_tpu.render.renderer import reference_sample_fn
        from instantvnr_tpu.render.transform import default_transform

        self.width, self.height = width, height
        self.mc, self.tf = mc, tf
        self.sample_fn = sample_fn or reference_sample_fn
        self.sample_ctx = volume_or_ctx
        self.settings = settings or PathTraceSettings()
        # plain grid ctx → corner-packed brick pool (2 gathers/sample vs
        # 8; exact to summation order for the tracker, whose samples only
        # land in occupied cells) unless forced off or too big to cache
        self._grid_bricks = False
        if (sample_fn is None and self.settings.grid_bricks is not False
                and getattr(volume_or_ctx, "ndim", 0) == 3):
            from instantvnr_tpu.render.brickcache import (
                brick_cache_bytes,
                brick_sample_fn,
                build_brick_cache_from_grid,
            )

            if (self.settings.grid_bricks
                    or brick_cache_bytes(mc)
                    <= self.settings.grid_bricks_max_bytes):
                self.sample_ctx = build_brick_cache_from_grid(
                    volume_or_ctx, mc)
                self.sample_fn = brick_sample_fn
                self._grid_bricks = True
        self.transform = transform or default_transform(mc.volume_dims)
        self.camera = Camera.default_for_dims(mc.volume_dims)
        self._key = jax.random.PRNGKey(seed)
        # previous frame's event/compaction schedule for free-running
        # replay (compaction.drive_compacted)
        self._sched_cache: dict = {}
        # provisional frame awaiting deferred replay validation
        # (rgba, cam_arrays, sub key, frame_index)
        self._pending_frame = None
        self._accum = jnp.zeros((width * height, 4), jnp.float32)
        self._frame = self._accum
        self.frame_index = 0
        self._init_fused_pipeline()

    def reset_accumulation(self):
        from instantvnr_tpu.render.renderer import discard_provisional

        pf, self._pending_frame = self._pending_frame, None
        discard_provisional(self._sched_cache, pf)
        self._discard_fused()
        self.frame_index = 0
        self._fidx_dev = None  # device counter resyncs at next fused frame
        if self._sched_cache.get("ops"):
            # stale schedule for the next trajectory: replay it one rung
            # relaxed (compaction.bump_schedule motion tolerance)
            self._sched_cache["bump_next"] = True

    def set_camera(self, cam: Camera):
        self.camera = cam
        self.reset_accumulation()

    def set_grid(self, volume):
        """Swap the decoded/GT grid (online-training refresh), re-applying
        the construction-time grid→brick-pool policy so sample_fn and
        sample_ctx stay consistent."""
        if self._grid_bricks:
            from instantvnr_tpu.render.brickcache import (
                build_brick_cache_from_grid,
            )

            self.sample_ctx = build_brick_cache_from_grid(volume, self.mc)
        else:
            self.sample_ctx = volume
        self.reset_accumulation()

    def set_transform(self, transform):
        """Clipping box / scaling update (vnrVolumeSetClippingBox /
        vnrVolumeSetScaling through the facade); restarts accumulation."""
        self.transform = transform
        self.reset_accumulation()

    def warmup(self, parallel: bool = True):
        """Pre-compile this renderer's programs (for the compacted tracer
        that is the whole bucket-program family, in parallel)."""
        if self.settings.compact:
            return warmup_pt_programs(
                self.sample_fn, self.settings, self.mc, self.tf,
                self.width * self.height, sample_ctx=self.sample_ctx,
                parallel=parallel)
        self.render()
        self.frame_index = 0
        return 1

    def _compacted_rgba(self, cam_arrays, sub, schedule_cache, defer):
        """One compacted path-traced frame's rgba (pre-accumulation)."""
        org, dirn, t0, t1, light, lo, hi, k_pt, scale = _pt_rays(
            self.width, self.height, self.settings, cam_arrays,
            tuple(int(d) for d in self.mc.volume_dims), sub,
            self.transform)
        return pathtrace_compacted(
            self.sample_fn, org, dirn, t0, t1, self.mc, self.tf, k_pt,
            self.settings, light, sample_ctx=self.sample_ctx,
            scale=scale, clip_lower=lo, clip_upper=hi,
            schedule_cache=schedule_cache, defer=defer)

    def _settle(self):
        """Resolve the previous frame's deferred replay validation
        (renderer.settle_provisional — one shared rollback protocol)."""
        from instantvnr_tpu.render.renderer import settle_provisional

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
        self._settle()
        cam_arrays = self._cached_cam_arrays()
        if self.settings.compact:
            # whole-frame fused path first (pt_fused_frame): key/counter
            # advance on device, one dispatch per frame
            if self._fidx_dev is None:
                self._fidx_dev = jnp.int32(self.frame_index)
            out = pt_fused_frame(
                self.sample_fn, self.settings, self._sched_cache, self.mc,
                self.tf, cam_arrays, self._key, self._accum,
                self._fidx_dev, self.width, self.height,
                sample_ctx=self.sample_ctx, xform=self.transform)
            if out is not None:
                key_prev = self._key
                (self._key, self._fidx_dev, self._accum, self._frame,
                 rgba, pend) = out
                self.frame_index += 1
                if pend:
                    self._pending_fused.append(
                        (rgba, cam_arrays, ("_lazykey", key_prev),
                         self.frame_index, pend, [self._sched_cache]))
                if not self.settings.deferred_validation:
                    self._settle_fused(keep=0)  # always provisional
                return self._frame
        self.frame_index += 1
        self._fidx_dev = None  # fused counter resyncs after host frames
        self._key, sub = jax.random.split(self._key)
        if self.frame_index == 1:
            self._accum = jnp.zeros((self.width * self.height, 4), jnp.float32)
        if self.settings.compact:
            from instantvnr_tpu.render.renderer import _accumulate

            rgba = self._compacted_rgba(
                cam_arrays, sub, self._sched_cache,
                defer=self.settings.deferred_validation)
            if "pending" in self._sched_cache:
                self._pending_frame = (rgba, cam_arrays, sub,
                                       self.frame_index)
            self._accum, self._frame = _accumulate(
                rgba, self._accum, jnp.int32(self.frame_index))
            return self._frame
        self._accum, self._frame = _pt_frame(
            self.sample_fn, self.width, self.height, self.settings,
            self.sample_ctx, cam_arrays, self.mc, self.tf, sub, self._accum,
            jnp.int32(self.frame_index), self.transform,
        )
        return self._frame

    def mapframe(self, denoise: bool = False) -> np.ndarray:
        """Frame readback; denoise=True applies the à-trous filter (the
        reference's optional denoiser hook, renderer.cpp:117-121)."""
        self._settle()
        self._settle_fused(keep=0)  # a displayed frame is never provisional
        frame = self._frame.reshape(self.height, self.width, 4)
        if denoise:
            from instantvnr_tpu.render.denoise import atrous_denoise

            frame = atrous_denoise(frame)
        return np.asarray(frame)
