"""Host-orchestrated ray compaction for the sample-streaming wavefront.

The reference's CUDA wavefront compacts terminated rays out of the stream
with device atomics and a host sync every iteration
(`core/renderer/method_raymarching.cu:687-973`, SURVEY.md §3.2). TPUs have
no atomic queues and XLA programs have static shapes, so the TPU-native
equivalent is *bucketed prefix compaction*:

  - all per-ray arrays stay full-size [R]; the live rays occupy a prefix
  - one jitted program per power-of-2 prefix length M runs ONE superstep
    on rays [0:M] (static slice in, dynamic_update_slice out) and returns
    the live count as a device scalar
  - the host reads the count (~a scalar readback per superstep) and, when
    it falls below half the current bucket, dispatches a compaction
    program that sorts the live rays of the prefix to the front and
    shrinks the bucket

Cost model (v5e, measured): a 512² superstep is sample-streaming
inference-bound (~150 ns/sample → ~600 ms at M=262144·K=16), while a
compaction is ~20 row-gathers of [R] (~5-15 ms) and a count readback is
~1 ms through the device link — so compaction pays for itself as soon as
the live fraction drops below ~95%. Programs are compiled once per bucket
size and reused across frames (and persisted via the JAX compile cache).

Output parity: `raymarch_compacted` computes exactly the same per-ray
march as `raymarch` (same superstep function, raymarch.py:_superstep);
only the scheduling differs. Verified allclose in
tests/test_compaction.py.
"""
from __future__ import annotations

from collections import deque
from functools import partial

import jax
import jax.numpy as jnp

from instantvnr_tpu.render.raymarch import (
    RaymarchSettings,
    _RayState,
    _superstep,
    init_ray_state,
    ssh_deferred_shade,
    ssh_shadow_settings,
)

_MIN_BUCKET = 8192

# Midpoint buckets: admit 3·2^k prefix sizes between the powers of two.
# Superstep compute is ∝ bucket size whatever the live count (masked lanes
# still issue their gathers), so a finer bucket ladder tracks the decaying
# live count tighter — average lane waste drops from ~33% to ~17% at the
# cost of a ~2× bucket-program family (warmed in parallel; one-time per
# machine via the persistent cache / vnr_precompile). DEFAULT ON since r5:
# measured end-to-end under fused whole-frame execution
# (scratch/midpoint_sweep.py, v5e, clean runs):
#   512² untiled:   15.46 → 18.05 fps (+17%)
#   768² T3 fin16k:  6.39 →  9.84 fps (+54% — past the reference's tuned
#                    7.25 fps at its own bench resolution)
# VNR_BUCKET_MIDPOINTS=0 restores the power-of-two-only ladder.
import os as _os

_MIDPOINT_BUCKETS = _os.environ.get("VNR_BUCKET_MIDPOINTS", "1") == "1"


def _bucket(count: int, r: int) -> int:
    """Smallest admissible prefix ≥ count (≥ _MIN_BUCKET, ≤ r): powers of
    two, plus their 1.5× midpoints when _MIDPOINT_BUCKETS."""
    m = _MIN_BUCKET
    while m < count:
        if _MIDPOINT_BUCKETS and count <= m + m // 2:
            return min(m + m // 2, r)
        m *= 2
    return min(m, r)


def _next_bucket(m: int, r: int) -> int:
    """The admissible size one rung ABOVE m (for replay's headroom bump)."""
    return min(_bucket(m + 1, r), r)


def _fused_sampling(sample_fn, sample_ctx):
    """Resolve the fused-sampling pair (occ_aux rows, bound fused fn) when
    the sample_fn advertises one (brickcache.brick_sample_fn.fused) and the
    ctx carries the packed (occupancy, slot) rows. Trace-time only."""
    fused = getattr(sample_fn, "fused", None)
    if fused is None or not isinstance(sample_ctx, dict):
        return None, None
    occ_aux = sample_ctx.get("occ_slot")
    if occ_aux is None:
        return None, None
    return occ_aux, partial(fused, sample_ctx)


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(7,))
def _superstep_prefix(sample_fn, settings: RaymarchSettings, m: int,
                      mc, tf, light_dir, rays, state: _RayState,
                      sample_ctx, scale, shadow_vol=None):
    """Run ONE superstep on the first `m` rays; everything else passes
    through. Returns (state, live_count_in_prefix)."""
    org, dirn, t_far, jitter = rays
    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)

    pre = jax.tree_util.tree_map(lambda a: a[:m], state)
    sub = _superstep(fn, org[:m], dirn[:m], t_far[:m], jitter[:m],
                     mc, tf, settings, light_dir, pre, scale=scale,
                     shadow_vol=shadow_vol, occ_aux=occ_aux,
                     fused_fn=fused_fn)
    new_state = jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice(
            full, part, (0,) * full.ndim),
        state, sub)
    return new_state, jnp.sum(sub.active.astype(jnp.int32))


_FINISH_BUCKET = 32768  # ≤ this, run one run-to-completion program: each
# extra dispatch costs ~25 ms through the device link while a superstep at
# 32768 rays computes for ~9 ms — finishing the tail inside ONE while_loop
# program beats per-superstep dispatch (measured round 3: tail steps at
# 16384/8192 were ~30 ms each, ~85% fixed overhead)


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(7,))
def _finish_prefix(sample_fn, settings: RaymarchSettings, m: int,
                   mc, tf, light_dir, rays, state, sample_ctx, scale,
                   shadow_vol=None, budget=None):
    """March the first `m` rays to completion in ONE device program
    (in-jit while_loop), for the small-bucket tail. `budget` (traced
    scalar) caps the remaining supersteps so the total across dispatches
    still honors settings.max_supersteps exactly.

    Returns (state, live count in the prefix) — the count is 0 unless the
    budget ran out first; schedule replay uses it to decide whether the
    frame still has work."""
    org, dirn, t_far, jitter = rays
    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)
    pre = jax.tree_util.tree_map(lambda a: a[:m], state)
    if budget is None:
        budget = jnp.int32(settings.max_supersteps)

    def cond(carry):
        st, i = carry
        return jnp.any(st.active) & (i < budget)

    def body(carry):
        st, i = carry
        st = _superstep(fn, org[:m], dirn[:m], t_far[:m], jitter[:m],
                        mc, tf, settings, light_dir, st, scale=scale,
                        shadow_vol=shadow_vol, occ_aux=occ_aux,
                        fused_fn=fused_fn)
        return st, i + 1

    sub, _ = jax.lax.while_loop(cond, body, (pre, jnp.int32(0)))
    new_state = jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice(
            full, part, (0,) * full.ndim),
        state, sub)
    return new_state, jnp.sum(sub.active.astype(jnp.int32))


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2, 3))
def _compact_prefix(m: int, rays, state, perm):
    return _compact_body(m, rays, state, perm)


def _compact_body(m: int, rays, state, perm):
    """Within the prefix [0:m], move live rays to the front (stable).

    Permutes the per-ray inputs, the marching state, and the slot→pixel
    permutation together, so position i always refers to one coherent ray.

    Cost shape (v5e): per-row gather cost is FLAT in row width
    (NOTES_ROUND2), so the ~15 per-leaf [m] gathers are packed into ONE
    [m, C] row-gather (~13 ns/ray instead of ~200); the stable partition
    comes from cumsum + one iota scatter instead of a sort. Measured
    ~70 → ~10 ms at m=262144 (scratch/superstep_phases.py round 3).
    Int leaves ride the f32 matrix exactly (values < 2^24)."""
    # int leaves (incl. the slot→pixel perm) round-trip through f32: past
    # 2^24 rays they'd silently corrupt — fail loudly instead (a 4096²
    # frame is 2^24; tile larger frames)
    assert m <= (1 << 24), m
    active = state.active[:m]
    # stable partition destinations: live rays keep order at the front,
    # dead rays keep order behind them
    live = active.astype(jnp.int32)
    n_live = jnp.sum(live)
    pos_live = jnp.cumsum(live) - 1
    pos_dead = n_live + jnp.cumsum(1 - live) - 1
    dest = jnp.where(active, pos_live, pos_dead)
    iota = jnp.arange(m, dtype=jnp.int32)
    order = jnp.zeros((m,), jnp.int32).at[dest].set(iota)

    leaves, treedef = jax.tree_util.tree_flatten((rays, state, perm))
    cols = []
    for l in leaves:
        c = l[:m].reshape(m, -1)
        assert jnp.issubdtype(c.dtype, jnp.floating) or c.dtype in (
            jnp.int32, jnp.bool_), c.dtype
        cols.append(c.astype(jnp.float32))
    widths = [c.shape[1] for c in cols]
    packed = jnp.concatenate(cols, axis=1)  # [m, C]
    packed = jnp.take(packed, order, axis=0)  # ONE row-gather

    out, off = [], 0
    for l, w_ in zip(leaves, widths):
        c = packed[:, off:off + w_].astype(l.dtype).reshape(l[:m].shape)
        out.append(l.at[:m].set(c))
        off += w_
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# Fused schedule execution — the whole recorded frame as ONE device program
#
# A replayed frame still pays per-dispatch link overhead: the 512² brick
# wavefront replays 7 dispatches (3 supersteps + 3 compactions + finisher)
# in ~112 ms while the same schedule fused into one jit runs in ~66 ms
# (scratch/megaframe.py, v5e) — the tunnel gaps between free-running
# dispatches cost ~40% of the frame. Once a schedule has been replayed
# unchanged twice, it is AOT-compiled in a BACKGROUND thread (compilation
# releases the GIL; frames keep replaying per-dispatch meanwhile) and
# swapped in when ready. Execution semantics are identical to _replay:
# the same superstep/compact/finisher math in the same order, with the
# same live-count validity checks (count before each compaction ≤ its
# bucket) read back asynchronously — an invalid fused frame falls back to
# the serialized re-render exactly like an invalid replay.
#
# Numerics: a fused frame is ALLCLOSE to the per-dispatch frame, not
# bitwise equal — XLA fuses across the former dispatch boundaries, which
# reorders a handful of f32 accumulations (measured ≤ ~3e-7 absolute on
# the CPU test scene). The wavefront's bit-identical-under-any-SCHEDULE
# property still holds; program PARTITIONING is what moves ulps.
# ---------------------------------------------------------------------------

_FUSED_EXE: dict = {}  # key -> compiled executable | "compiling" | "failed"
_FUSED_THREADS: list = []  # in-flight compile threads (wait_fused_compiles)
_FUSED_MAX = 64  # compile-cache cap: schedules beyond this keep replaying
# Tests set this False (conftest) so fused engagement is explicit: a
# background compile finishing mid-test would otherwise swap the ~1-ulp
# fused result under assertions nondeterministically. Production keeps it.
FUSED_AUTOCOMPILE = True


def _fusable(ops) -> bool:
    """Only schedules that END in a run-to-completion finisher can fuse:
    anything else needs live-count reads mid-frame to terminate."""
    return bool(ops) and ops[-1][0] == "F"


def strip_counts(ops) -> tuple:
    """Normalize recorded ops to (kind, bucket) pairs. "C" ops carry the
    measured live count as a third element (replay's headroom logic needs
    it), but the count is stochastic frame-to-frame while the fused frame
    program depends only on the BUCKET sequence — keying executables on
    raw ops would see a near-boundary schedule as 'changed' every frame
    and never engage (observed: PT counts 127/126/120 at bucket 128)."""
    return tuple((op[0], op[1]) for op in ops)


def bump_schedule(ops, r: int) -> tuple:
    """One-rung motion-tolerance transform of a stripped (kind, bucket)
    schedule: every compaction bucket moves to the next admissible rung
    and the S/F buckets follow the relaxed trajectory; compactions that
    stop shrinking the prefix are dropped.

    Replaying a schedule recorded for a DIFFERENT camera/TF/params relies
    on validation — and the midpoint ladder's tight buckets made that
    genuinely fail under motion (768² orbit fin16k: 5/16 frames
    invalidated, 2.7 → 1.7 fps, NOTES_ROUND5). A renderer sets
    `schedule_cache["bump_next"]` on any transactional change; the next
    frame replays/fuses this RELAXED schedule (recorded schedules stay
    tight, so the bump never ratchets), and the steady state returns to
    the tight executable one frame after motion stops."""
    out = []
    m = r
    for kind, bucket in ops:
        if kind == "C":
            nb = min(_next_bucket(bucket, r), r)
            if nb >= m:
                continue  # no longer shrinks the prefix — drop
            m = nb
            out.append(("C", m))
        else:
            out.append((kind, m))
    return tuple(out)


def _fused_body(sample_fn, settings, ops, budget_total, budget_step,
                mc, tf, light, rays, state, perm, sample_ctx, scale,
                shadow_vol):
    """The traced whole-frame program for one recorded schedule.

    Returns (rays, state, perm, counts[n_S + 1] int32): counts[0] is the
    initial live count, counts[1+i] the live count after the i-th
    superstep — the same quantities _replay async-copies per dispatch."""
    fn = partial(sample_fn, sample_ctx)
    occ_aux, fused_fn = _fused_sampling(sample_fn, sample_ctx)
    m = state.active.shape[0]
    counts = [jnp.sum(state.active.astype(jnp.int32))]
    used = 0
    for op in ops:
        # rays is REASSIGNED by every compaction: unpack per op, or the
        # supersteps would march pre-compaction rays against compacted state
        org, dirn, t_far, jitter = rays
        if op[0] == "S":
            pre = jax.tree_util.tree_map(lambda a: a[:m], state)
            sub = _superstep(fn, org[:m], dirn[:m], t_far[:m], jitter[:m],
                             mc, tf, settings, light, pre, scale=scale,
                             shadow_vol=shadow_vol, occ_aux=occ_aux,
                             fused_fn=fused_fn)
            state = jax.tree_util.tree_map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim), state, sub)
            counts.append(jnp.sum(sub.active.astype(jnp.int32)))
            used += budget_step
        elif op[0] == "C":
            rays, state, perm = _compact_body(m, rays, state, perm)
            m = op[1]
        else:  # "F" — terminal run-to-completion tail
            mf = op[1]
            pre = jax.tree_util.tree_map(lambda a: a[:mf], state)
            budget = jnp.int32(budget_total - used)

            def cond(carry):
                st_, i = carry
                return jnp.any(st_.active) & (i < budget)

            def body(carry):
                st_, i = carry
                st_ = _superstep(fn, org[:mf], dirn[:mf], t_far[:mf],
                                 jitter[:mf], mc, tf, settings, light, st_,
                                 scale=scale, shadow_vol=shadow_vol,
                                 occ_aux=occ_aux, fused_fn=fused_fn)
                return st_, i + 1

            sub, _ = jax.lax.while_loop(cond, body, (pre, jnp.int32(0)))
            state = jax.tree_util.tree_map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim), state, sub)
    return rays, state, perm, jnp.stack(counts)


class _CountRow:
    """Lazy int view of one row of the fused frame's counts array
    (settle_pending calls int(h); the array transfers once, not per row)."""

    __slots__ = ("arr", "i")

    def __init__(self, arr, i):
        self.arr = arr
        self.i = i

    def __int__(self):
        import numpy as _np

        return int(_np.asarray(self.arr)[self.i])


def _frame_body(sample_fn, settings, bands, mc, tf, light, org, dirn,
                t_near, t_far, key, accum, frame_index, sample_ctx, scale,
                shadow_vol):
    """The whole-frame fused program: per-frame RNG advance + jitter draw,
    every band's recorded schedule (`bands` = ((start, stop, ops), ...)
    static), the pixel-order unpermute, and the progressive accumulation —
    the entire render() turned into ONE dispatch. The peripheral work the
    per-dispatch path pays per frame (key split, jitter gen, make_initial
    copies, unpermute, accumulate dispatches AND the cam/frame-index
    host→device uploads) each cost ~2-10 ms of link latency through the
    tunnel; folding them in here is where half the fused-path win is.

    `key` is the renderer's MASTER key and `frame_index` the PREVIOUS
    frame count, both device-resident: the program advances them exactly
    like Renderer.render does on the host (split; +1), so the fallback
    paths continue the identical sequence.

    Returns (key_next, frame_index, accum, frame, rgba, counts): rgba
    feeds the deferred-validation rollback, counts the per-band
    compaction validity checks (concatenated band-major, counts[0] of
    each band = its initial live count, then one per superstep —
    _frame_pend maps them to buckets)."""
    r = org.shape[0]
    key_next, sub = jax.random.split(key)
    frame_index = frame_index + 1
    jitter = jax.random.uniform(sub, (r,), jnp.float32)
    rgba_parts, counts_parts = [], []
    for (a, b, ops) in bands:
        rays = tuple(x + 0.0 for x in
                     (org[a:b], dirn[a:b], t_far[a:b], jitter[a:b]))
        state = init_ray_state(t_near[a:b] + 0.0, rays[2])
        perm = jnp.arange(b - a, dtype=jnp.int32)
        rays, state, perm, counts = _fused_body(
            sample_fn, settings, ops, settings.max_supersteps, 1,
            mc, tf, light, rays, state, perm, sample_ctx, scale, shadow_vol)
        color, alpha, bw, bp, bc = _unpermute(
            perm, state.color, state.alpha, state.best_w, state.best_pos,
            state.best_rgb)
        rgba_parts.append(jnp.concatenate([color, alpha[:, None]], axis=-1))
        counts_parts.append(counts)
    rgba = (rgba_parts[0] if len(rgba_parts) == 1
            else jnp.concatenate(rgba_parts, axis=0))
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    frame = accum / frame_index.astype(jnp.float32)
    return (key_next, frame_index, accum, frame, rgba,
            jnp.concatenate(counts_parts))


def _frame_pend(bands, counts):
    """Validity pairs of a fused frame: for each band compaction, the live
    count just before it (a row of the async-copied counts array) vs its
    bucket — exactly _replay's checks, band-major."""
    pend = []
    ci = 0
    for (_a, _b, ops) in bands:
        ci += 1  # the band's initial count
        for op in ops:
            if op[0] == "S":
                ci += 1
            elif op[0] == "C":
                pend.append((_CountRow(counts, ci - 1), op[1]))
    return pend


def _band_layout(r: int, settings: RaymarchSettings, scale, shadow_vol):
    """The (start, stop, sub_settings, sub_cache_key, sched_key) of every
    band of a frame — MUST mirror raymarch_compacted's tiling exactly."""
    import dataclasses

    t_ = settings.tiles
    if t_ <= 1:
        sk = (r, dataclasses.astuple(settings), scale is None,
              shadow_vol is None)
        return [(0, r, settings, None, sk)]
    band = -(-r // t_)
    sub_settings = dataclasses.replace(settings, tiles=1)
    out = []
    for i in range(t_):
        a = i * band
        b = min((i + 1) * band, r)
        if a >= r:
            break
        sk = (b - a, dataclasses.astuple(sub_settings), scale is None,
              shadow_vol is None)
        out.append((a, b, sub_settings, f"tile{i}", sk))
    return out


def fused_frame(sample_fn, settings: RaymarchSettings, schedule_cache: dict,
                mc, tf, light, org, dirn, t_near, t_far, key, accum,
                frame_index, sample_ctx=None, scale=None, shadow_vol=None):
    """Try to render this frame as ONE fused device program.

    `key` is the MASTER rng key and `frame_index` the PREVIOUS frame
    count (both device-resident; the program advances them — see
    _frame_body). Returns None (no stable fusable schedule yet, or the
    executable is still compiling) or

        (key_next, frame_index, accum, frame, rgba, pend, sub_caches)

    The result is ALWAYS provisional: `pend` holds the (count, bucket)
    validity pairs and the caller must check them before trusting the
    frame — but NOT immediately: blocking on a frame's counts before
    dispatching the next serializes the pipeline at compute+RTT per frame
    (the renderer settles with a 2-frame lag, keeping 2 fused frames in
    flight; see Renderer._settle_fused). On invalid, clear every cache in
    `sub_caches` ("ops") and roll the frame's rgba out of the
    accumulation (additive — an old frame's fix stays exact).

    The caller owns ray/camera buffers (org/dirn/t_near/t_far are NOT
    donated — cache them per camera); `accum` IS donated."""
    if settings.shading == "ssh" or not (settings.fused_replay
                                         and settings.schedule_replay):
        return None  # ssh's deferred shadow pass marches separately
    r = org.shape[0]
    layout = _band_layout(r, settings, scale, shadow_vol)
    bump = bool(schedule_cache.get("bump_next"))
    bands = []
    sub_caches = []
    for (a, b, sub_settings, cache_key, sk) in layout:
        sub = (schedule_cache if cache_key is None
               else schedule_cache.get(cache_key))
        if (not sub or not sub.get("ops") or sub.get("key") != sk
                or not _fusable(tuple(sub["ops"]))):
            schedule_cache.pop("_fused_prev", None)
            return None
        ops_sb = strip_counts(sub["ops"])
        if bump:
            # motion tolerance: execute the one-rung-relaxed schedule
            # (bump_schedule) — the recorded tight ops stay untouched, so
            # the tight executable resumes the frame after motion stops
            ops_sb = bump_schedule(ops_sb, b - a)
            if not _fusable(ops_sb):
                schedule_cache.pop("_fused_prev", None)
                return None
        bands.append((a, b, ops_sb))
        sub_caches.append(sub)
    bands = tuple(bands)
    dyn = (mc, tf, light, org, dirn, t_near, t_far, key, accum,
           frame_index, sample_ctx, scale, shadow_vol)
    # sub_settings is identical across bands (tiles stripped); key on it
    exe_key = (sample_fn, layout[0][2], bands, shape_fingerprint(dyn))
    exe = _FUSED_EXE.get(exe_key)
    if exe is None:
        # kick the background AOT compile once the schedule repeats
        # unchanged (one frame of per-dispatch replay proves stability)
        if FUSED_AUTOCOMPILE and schedule_cache.get("_fused_prev") == bands:
            _compile_frame(exe_key, layout[0][2], dyn)
        schedule_cache["_fused_prev"] = bands
        return None
    if exe in ("compiling", "failed"):
        return None
    schedule_cache.pop("bump_next", None)  # consumed by this frame
    key_next, fidx, accum, frame, rgba, counts = exe(*dyn)
    counts.copy_to_host_async()
    pend = _frame_pend(bands, counts)
    schedule_cache["replays"] = schedule_cache.get("replays", 0) + 1
    schedule_cache["fused_frames"] = (
        schedule_cache.get("fused_frames", 0) + 1)
    return key_next, fidx, accum, frame, rgba, pend, sub_caches


def _absify(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def shape_fingerprint(dyn) -> tuple:
    """Hashable (treedef, per-leaf shape/dtype) key part: an executable is
    only valid for exactly the argument structure it was lowered with."""
    leaves, treedef = jax.tree_util.tree_flatten(dyn)
    return (treedef, tuple(
        (l.shape, str(l.dtype)) if hasattr(l, "shape") else l
        for l in leaves))


def compile_frame_async(exe_key, jitted, dyn):
    """Background AOT compile of one whole-frame program (compilation
    releases the GIL; frames keep replaying per-dispatch meanwhile).
    Shared by the wavefront and path-trace fused frames."""
    if sum(1 for v in _FUSED_EXE.values() if v != "failed") >= _FUSED_MAX:
        return
    _FUSED_EXE[exe_key] = "compiling"
    dyn_abs = jax.tree_util.tree_map(_absify, dyn)

    def compile_one():
        try:
            _FUSED_EXE[exe_key] = jitted.lower(*dyn_abs).compile()
        except Exception:  # noqa: BLE001 — never take a frame down
            _FUSED_EXE[exe_key] = "failed"

    import threading

    t = threading.Thread(target=compile_one, daemon=True,
                         name="fused-frame-compile")
    t.start()
    _FUSED_THREADS.append(t)


def _compile_frame(exe_key, settings, dyn):
    sample_fn, _settings, bands, _fp = exe_key
    jitted = jax.jit(partial(_frame_body, sample_fn, settings, bands),
                     donate_argnums=(8,))  # accum
    compile_frame_async(exe_key, jitted, dyn)


def wait_fused_compiles(timeout: float | None = None):
    """Block until all in-flight fused-schedule compiles finish (bench &
    tests; interactive callers just let them land between frames)."""
    for t in list(_FUSED_THREADS):
        t.join(timeout)
    _FUSED_THREADS[:] = [t for t in _FUSED_THREADS if t.is_alive()]
    return not _FUSED_THREADS


# interpreter teardown while an XLA compile is mid-flight on a daemon
# thread aborts the process (LLVM ERROR: ... TypeSize, observed on CLI
# exits right after a schedule stabilized); draining the threads first
# costs at most one compile
import atexit  # noqa: E402

atexit.register(wait_fused_compiles)


_REPLAY_HEADROOM = 0.95  # see _replay docstring


@jax.jit
def _count_active(active):
    return jnp.sum(active.astype(jnp.int32))


def _serial_loop(r, m, used, count, rays, state, perm, ops,
                 dispatch_super, dispatch_finish, budget_total, budget_step,
                 finish_bucket, speculate):
    """The serialized bucketed loop, shared by the fresh path and the
    post-replay continuation. Appends every dispatched op to `ops`
    (("S", m) superstep / ("C", m_new, count) compaction /
    ("F", m) finisher) so the next frame can replay the schedule.

    `speculate` > 0 keeps that many live-counts in flight
    (copy_to_host_async) and acts on them stale — counts only decrease
    within a frame so the bucket never drops below live; extra supersteps
    dispatched past ray death are masked no-ops.
    """
    spec = max(int(speculate), 0)
    pending = deque()
    while count > 0 and used < budget_total:
        if m <= finish_bucket:
            # small tail: run to completion in one program (per-dispatch
            # link latency dominates compute at these sizes)
            state, _ = dispatch_finish(m, rays, state, budget_total - used)
            ops.append(("F", m))
            break
        state, n_live = dispatch_super(m, rays, state)
        used += budget_step
        ops.append(("S", m))
        n_live.copy_to_host_async()
        pending.append(n_live)
        if len(pending) > spec:
            count = int(pending.popleft())  # host sync (stale by `spec`)
            if count > 0 and _bucket(count, r) < m:
                ops.append(("C", _bucket(count, r), count))
                rays, state, perm = _compact_prefix(m, rays, state, perm)
                m = _bucket(count, r)
    pending.clear()
    return rays, state, perm


def _replay(r, make_initial, dispatch_super, dispatch_finish, budget_total,
            budget_step, finish_bucket, speculate, schedule_cache,
            defer=False, bump=False):
    """Replay the previous frame's recorded schedule free-running.

    Progressive accumulation re-renders the same scene every frame, so the
    superstep/compaction trajectory is nearly identical frame to frame.
    Replaying it dispatches the whole frame WITHOUT blocking on any live
    count (~2 ms/dispatch instead of ~30 through the device link,
    scratch/dispatch_pipeline.py): a compaction was SAFE iff the live
    count just before it was ≤ the new bucket (live counts only decrease,
    rays at positions ≥ bucket would stop marching). The replayed frame
    always ends in a run-to-completion finisher (budget-capped), so no
    live-count read is ever needed for termination — validation reduces
    to the compaction checks, whose counts were async-copied at dispatch.

      - defer=False: read the checks here (one link round-trip, mostly
        overlapped by the finisher's compute). Unsafe ⇒ return None; the
        caller re-renders serialized (replay's donated buffers are rebuilt
        by `make_initial`).
      - defer=True: store (handle, bucket) pairs in
        schedule_cache["pending"] and return immediately — ZERO blocking.
        The CALLER must resolve them via `settle_pending` before trusting
        the result (render.renderer/pathtrace settle at the next frame and
        roll back the provisional accumulation on the rare invalid).

    Compaction buckets get a headroom bump (previous count within
    `_REPLAY_HEADROOM` of the bucket ⇒ next admissible bucket size, one
    `_next_bucket` rung up — a 1.5× midpoint under the midpoint ladder,
    the next power of two otherwise) so near-boundary
    counts don't oscillate between replay and re-render. Frame-to-frame
    counts differ only by the per-frame jitter draw, so the margin can be
    thin: 0.8 measurably hurt 768² (skipped compactions kept supersteps at
    full frame size, 1.81 → 1.52 fps) while 0.95 keeps the schedule tight.
    """
    ops = schedule_cache["ops"]
    rays, state, perm = make_initial()
    init_handle = _count_active(state.active)
    init_handle.copy_to_host_async()
    m = r
    used = 0
    counts = []  # live-count handles, one per replayed superstep
    checks = []  # (index into counts just before a compaction, bucket)
    replayed = []
    for op in ops:
        if op[0] == "C":
            m_new, c_just = op[1], op[2]
            if c_just > _REPLAY_HEADROOM * m_new:
                m_new = _next_bucket(m_new, r)
            if bump:
                # motion tolerance (bump_schedule semantics): run one rung
                # relaxed; the recorded ops are left untouched below
                m_new = min(_next_bucket(m_new, r), r)
            if m_new >= m:
                continue
            checks.append((len(counts) - 1, m_new))
            rays, state, perm = _compact_prefix(m, rays, state, perm)
            replayed.append(("C", m_new, c_just))
            m = m_new
        elif op[0] == "S":
            if used >= budget_total or m <= finish_bucket:
                break  # the terminal finisher below takes over
            state, n_live = dispatch_super(m, rays, state)
            used += budget_step
            n_live.copy_to_host_async()
            counts.append(n_live)
            replayed.append(("S", m))
        else:  # "F" — dispatched by the tail logic below
            break
    pend = [(init_handle if ci < 0 else counts[ci], m_new)
            for ci, m_new in checks]
    if used < budget_total and m <= finish_bucket:
        # terminal finisher: guarantees completion within budget, so no
        # live-count read is needed — stragglers that outlive the recorded
        # schedule still march to termination
        state, _ = dispatch_finish(m, rays, state, budget_total - used)
        replayed.append(("F", m))
        if not bump:  # a bumped replay never overwrites the tight record
            schedule_cache["ops"] = replayed
        if defer:
            if pend:  # nothing to validate ⇒ nothing pending
                schedule_cache["pending"] = pend
            return rays, state, perm
        for h, m_new in pend:
            if int(h) > m_new:
                return None  # compaction below live → frame invalid
        return rays, state, perm
    # ---- rare tail: the bucket is still ABOVE the finisher threshold
    # (headroom bump, or last frame's rays all died early at a big
    # bucket). A run-to-completion program at a big bucket could run
    # budget×n_iters steps in ONE dispatch — exactly the long device
    # program CLAUDE.md forbids through the tunnel — so validate inline
    # and continue with the bounded serialized loop instead.
    for h, m_new in pend:
        if int(h) > m_new:
            return None
    if used < budget_total:
        live = int(counts[-1]) if counts else int(init_handle)
        if live > 0:
            if _bucket(live, r) < m:
                replayed.append(("C", _bucket(live, r), live))
                rays, state, perm = _compact_prefix(m, rays, state, perm)
                m = _bucket(live, r)
            rays, state, perm = _serial_loop(
                r, m, used, live, rays, state, perm, replayed,
                dispatch_super, dispatch_finish, budget_total, budget_step,
                finish_bucket, speculate)
    if not bump:
        schedule_cache["ops"] = replayed
    return rays, state, perm


def settle_pending(schedule_cache: dict) -> bool:
    """Resolve a deferred replay's validation (schedule_cache["pending"]).

    Returns True when the provisional frame was valid. On False the caller
    MUST discard/rebuild that frame's result (the replayed schedule
    compacted below the live count, dropping rays); the recorded schedule
    is cleared so the next frame re-records serialized. No-op (True) when
    nothing is pending."""
    pend = schedule_cache.pop("pending", None)
    subs = schedule_cache.pop("pending_subs", None)
    if not pend:
        return True
    ok = all(int(h) <= m_new for h, m_new in pend)
    if ok:
        return True
    # tiled frames: the unsafe schedule(s) live in the band sub-caches
    for c in (subs or [schedule_cache]):
        c.pop("ops", None)
    schedule_cache["invalidated"] = schedule_cache.get("invalidated", 0) + 1
    return False


def drive_compacted(r, make_initial, dispatch_super, dispatch_finish,
                    budget_total, budget_step, finish_bucket,
                    speculate=0, schedule_cache=None, sched_key=None,
                    defer=False):
    """Shared host orchestration for the compacted wavefront and path
    tracer: bucketed supersteps + compaction + tail finisher, with
    schedule replay (when `schedule_cache` is a dict owned by the caller)
    and optional stale-count speculation.

    make_initial() → (rays, state, perm) must build FRESH buffers each
    call (the bucket programs donate them); it may be called twice when a
    replay fails validation. dispatch_super(m, rays, state) →
    (state, live-count handle); dispatch_finish(m, rays, state, budget) →
    (state, live-count handle). Returns (rays, state, perm).

    defer=True makes the replay path skip its validation read and leave
    schedule_cache["pending"] for the caller to `settle_pending` — the
    result is PROVISIONAL until then (see _replay)."""
    bump = bool(schedule_cache.pop("bump_next", False)) \
        if schedule_cache is not None else False
    if (schedule_cache is not None and schedule_cache.get("ops")
            and schedule_cache.get("key") == sched_key):
        out = _replay(r, make_initial, dispatch_super, dispatch_finish,
                      budget_total, budget_step, finish_bucket, speculate,
                      schedule_cache, defer=defer, bump=bump)
        if out is not None:
            schedule_cache["replays"] = schedule_cache.get("replays", 0) + 1
            return out
        schedule_cache["invalidated"] = (
            schedule_cache.get("invalidated", 0) + 1)
    if schedule_cache is not None:
        schedule_cache["serialized"] = schedule_cache.get("serialized", 0) + 1
    rays, state, perm = make_initial()
    ops = []
    m = r
    count = int(_count_active(state.active))
    # compact straight away if most rays miss (all-miss frames skip even
    # that — nothing to march, nothing to sort)
    if count > 0 and _bucket(count, r) < m:
        ops.append(("C", _bucket(count, r), count))
        rays, state, perm = _compact_prefix(m, rays, state, perm)
        m = _bucket(count, r)
    rays, state, perm = _serial_loop(
        r, m, 0, count, rays, state, perm, ops, dispatch_super,
        dispatch_finish, budget_total, budget_step, finish_bucket, speculate)
    if schedule_cache is not None:
        schedule_cache["key"] = sched_key
        schedule_cache["ops"] = ops
    return rays, state, perm


@jax.jit
def _unpermute(perm, color, alpha, best_w, best_pos, best_rgb):
    """Scatter per-slot results back to pixel order (slot i → pixel perm[i])."""
    r = perm.shape[0]
    out_c = jnp.zeros((r, 3), color.dtype).at[perm].set(color)
    out_a = jnp.zeros((r,), alpha.dtype).at[perm].set(alpha)
    out_bw = jnp.zeros((r,), best_w.dtype).at[perm].set(best_w)
    out_bp = jnp.zeros((r, 3), best_pos.dtype).at[perm].set(best_pos)
    out_bc = jnp.zeros((r, 3), best_rgb.dtype).at[perm].set(best_rgb)
    return out_c, out_a, out_bw, out_bp, out_bc


def bucket_sizes(r: int) -> list[int]:
    """All bucket sizes the compacted marcher can dispatch for frame size r:
    {r} ∪ {powers of two in [_MIN_BUCKET, r)} (∪ their 1.5× midpoints when
    _MIDPOINT_BUCKETS), descending."""
    sizes = [r]
    m = _MIN_BUCKET
    while m < r:
        sizes.append(m)
        if _MIDPOINT_BUCKETS and m + m // 2 < r:
            sizes.append(m + m // 2)
        m *= 2
    return sorted(set(sizes), reverse=True)


def warmup_programs(sample_fn, settings: RaymarchSettings, mc, tf, r: int,
                    sample_ctx=None, scale=None, parallel: bool = True,
                    max_workers: int = 8, shadow_vol=None) -> int:
    """Pre-compile the whole bucket-program family for frame size `r`.

    Cold-start is dominated by the SERIAL compilation of the ~2·log2(r/8192)
    distinct (superstep, compact) programs the first frames trigger one by
    one (~230 s measured at 512² through a remote-compile link). Tracing is
    cheap host Python; XLA compilation releases the GIL — so one thread per
    bucket compiles the family concurrently, and real frames then hit the
    jit cache. Executions here are trivial (t_far=0 ⇒ every ray dead).

    Returns the number of bucket sizes warmed.
    """
    from concurrent.futures import ThreadPoolExecutor

    dirn = jnp.zeros((r, 3), jnp.float32).at[:, 2].set(1.0)
    zeros = jnp.zeros((r,), jnp.float32)
    rays = (jnp.zeros((r, 3), jnp.float32), dirn, zeros, zeros)
    light = jnp.asarray(settings.light_dir, jnp.float32)
    sizes = bucket_sizes(r)
    finish_bucket = settings.finish_bucket or _FINISH_BUCKET

    def warm_one(m: int):
        # fresh state/rays per call: the programs donate their buffers
        st = init_ray_state(zeros + 0.0, zeros + 0.0)
        if m <= finish_bucket:
            # budget must be a TRACED scalar like the render-time calls —
            # budget=None is a DIFFERENT jit-cache entry and would leave
            # the real finisher cold (None vs int32 cache separately)
            st, _ = _finish_prefix(sample_fn, settings, m, mc, tf, light,
                                   rays, st, sample_ctx, scale, shadow_vol,
                                   jnp.int32(settings.max_supersteps))
        else:
            st, _ = _superstep_prefix(sample_fn, settings, m, mc, tf, light,
                                      rays, st, sample_ctx, scale,
                                      shadow_vol)
        rr = tuple(x + 0.0 for x in rays)
        _compact_prefix(m, rr, st, jnp.arange(r, dtype=jnp.int32))

    if parallel:
        with ThreadPoolExecutor(max_workers=min(max_workers,
                                                len(sizes))) as ex:
            list(ex.map(warm_one, sizes))
    else:
        for m in sizes:
            warm_one(m)
    st = init_ray_state(zeros, zeros)
    _count_active(st.active)
    _unpermute(jnp.arange(r, dtype=jnp.int32), st.color, st.alpha,
               st.best_w, st.best_pos, st.best_rgb)
    n = len(sizes)
    if settings.shading == "ssh":
        # the deferred shadow pass runs its own bucket family under
        # DIFFERENT static settings — warm it too or the first ssh frame
        # pays the serial cold compile this function exists to avoid
        n += warmup_programs(sample_fn, ssh_shadow_settings(settings), mc,
                             tf, r, sample_ctx=sample_ctx, scale=scale,
                             parallel=parallel, max_workers=max_workers)
    # (no shadow_vol in the SSH transmittance family: its settings use
    # shading="none")
    return n


def raymarch_compacted(
    sample_fn,
    org: jnp.ndarray,  # [R,3] voxel-space ray origins
    dirn: jnp.ndarray,  # [R,3] normalized directions
    t_near: jnp.ndarray,  # [R]
    t_far: jnp.ndarray,  # [R]
    mc,
    tf,
    jitter: jnp.ndarray,  # [R] in [0,1)
    settings: RaymarchSettings,
    light_dir: jnp.ndarray | None = None,
    sample_ctx=None,
    scale=None,  # [3] voxel→world scaling (render/transform.py)
    clip_lower=None,  # [3] voxel-space clip box (for SSH shadow rays)
    clip_upper=None,
    shadow_vol=None,  # [dz,dy,dx] transmittance (shading == "shadow")
    schedule_cache: dict | None = None,  # per-renderer dict for replay
    defer: bool = False,  # deferred replay validation — caller MUST settle
) -> jnp.ndarray:
    """`raymarch` with host-orchestrated bucketed ray compaction.

    Must be called OUTSIDE jit (it reads live-ray counts on the host).
    Semantically identical to raymarch(...); see module docstring. A ray's
    march is independent of its slot position (jitter travels with the
    ray, `_unpermute` undoes the permutation), so the output is
    bit-identical for ANY compaction/replay schedule.

    sample_fn is called as sample_fn(sample_ctx, positions) and must be a
    long-lived callable (it keys the per-bucket program cache); per-frame
    data (network params / volume) goes in sample_ctx, which is traced.
    """
    import dataclasses

    from instantvnr_tpu.utils.math import normalize as _normalize

    r = org.shape[0]
    if settings.tiles > 1:
        # frame tiling: drive each contiguous row band through its own
        # schedule (RaymarchSettings.tiles). Bands reuse the bucket family
        # of an untiled frame of the band size (settings pass down with
        # tiles=1). Deferred-validation pendings are aggregated into the
        # TOP cache so the renderer's settle sees one frame-level verdict;
        # an invalid frame clears every band's recorded schedule.
        t_ = settings.tiles
        band = -(-r // t_)
        sub_settings = dataclasses.replace(settings, tiles=1)
        if (schedule_cache is not None
                and schedule_cache.pop("bump_next", False)):
            for i in range(t_):  # propagate motion tolerance to every band
                schedule_cache.setdefault(f"tile{i}", {})["bump_next"] = True
        outs = []
        pend = []
        subs = []
        for i in range(t_):
            sl = slice(i * band, min((i + 1) * band, r))
            if sl.start >= r:
                break
            sub_cache = (None if schedule_cache is None
                         else schedule_cache.setdefault(f"tile{i}", {}))
            outs.append(raymarch_compacted(
                sample_fn, org[sl], dirn[sl], t_near[sl], t_far[sl], mc, tf,
                jitter[sl], sub_settings, light_dir=light_dir,
                sample_ctx=sample_ctx, scale=scale, clip_lower=clip_lower,
                clip_upper=clip_upper, shadow_vol=shadow_vol,
                schedule_cache=sub_cache, defer=defer))
            if sub_cache is not None and "pending" in sub_cache:
                pend.extend(sub_cache.pop("pending"))
                subs.append(sub_cache)
        if pend:
            schedule_cache["pending"] = pend
            schedule_cache["pending_subs"] = subs
        return jnp.concatenate(outs, axis=0)
    dims = jnp.array(mc.volume_dims, jnp.float32)
    if light_dir is None:
        light_dir = jnp.asarray(settings.light_dir, jnp.float32)
    light_dir = _normalize(light_dir)

    def make_initial():
        # fresh buffers each call: the bucket programs DONATE the
        # ray/state buffers, and the caller's arrays must survive
        rays = tuple(x + 0.0 for x in (org, dirn, t_far, jitter))
        state = init_ray_state(t_near + 0.0, rays[2])
        return rays, state, jnp.arange(r, dtype=jnp.int32)

    def dispatch_super(m, rays, state):
        return _superstep_prefix(sample_fn, settings, m, mc, tf, light_dir,
                                 rays, state, sample_ctx, scale, shadow_vol)

    def dispatch_finish(m, rays, state, budget):
        return _finish_prefix(sample_fn, settings, m, mc, tf, light_dir,
                              rays, state, sample_ctx, scale, shadow_vol,
                              jnp.int32(budget))

    sched_key = (r, dataclasses.astuple(settings), scale is None,
                 shadow_vol is None)
    rays, state, perm = drive_compacted(
        r, make_initial, dispatch_super, dispatch_finish,
        settings.max_supersteps, 1,
        settings.finish_bucket or _FINISH_BUCKET,
        speculate=settings.speculate,
        schedule_cache=schedule_cache if settings.schedule_replay else None,
        sched_key=sched_key, defer=defer)

    color, alpha, bw, bp, bc = _unpermute(
        perm, state.color, state.alpha, state.best_w, state.best_pos,
        state.best_rgb)

    if settings.shading == "ssh":
        # deferred single-shade pass, same as raymarch (in pixel order);
        # the shadow rays are themselves marched with compaction
        def march_shadow(org2, dir2, t0b, t1b, sh_settings, sh_jitter):
            return raymarch_compacted(
                sample_fn, org2, dir2, t0b, t1b, mc, tf, sh_jitter,
                sh_settings, sample_ctx=sample_ctx, scale=scale,
                clip_lower=clip_lower, clip_upper=clip_upper,
                schedule_cache=None if schedule_cache is None
                else schedule_cache.setdefault("ssh", {}))

        color = ssh_deferred_shade(march_shadow, color, alpha, bw, bp, bc,
                                   light_dir, dims, settings, scale,
                                   clip_lower, clip_upper, jitter)

    return jnp.concatenate([color, alpha[:, None]], axis=-1)
