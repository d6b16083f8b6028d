"""Ray-marching volume renderer — bulk-synchronous masked wavefront.

This is the TPU redesign of the reference's three ray-marching strategies
(`core/renderer/method_raymarching.cu`). The CUDA wavefront uses atomics-based
ray compaction with a host sync every iteration (SURVEY.md §3.2); TPUs have
neither device atomicked queues nor cheap host round trips, so the design is:

  superstep loop (lax.while_loop over ALL rays, masked):
    1. EMIT  — a K-slot scan per ray: macrocell DDA with empty-space skipping
       and per-cell quantized adaptive steps emits ≤K sample positions
       (K = n_iters, the reference's VNR_RM_N_ITERS=16).  Pure VPU work:
       gathers + arithmetic, no MXU.
    2. SAMPLE — ONE batched evaluation of sample_fn on all R·K positions.
       For the neural path this is the fused hash-encode+MLP inference —
       big batches that fill the MXU (the analog of the reference's batched
       `NeuralVolume::inference` between wavefront kernels).
    3. COMPOSE — scan over K slots: transfer-function classification,
       opacity correction, front-to-back blending, early termination at
       alpha ≥ 0.9999 (`nearly_one`, instantvnr_types.h:160).

Marching semantics mirror the reference exactly (method_raymarching.cu:263-306):
  - world units = voxels; base step = 1/sampling_rate
  - per-cell step: ss = adaptiveSamplingRate(step, cell_max_opacity),
    quantized so the cell interval divides evenly (sample_size_scaler)
  - adaptiveSamplingRate(s, r) = max(s + 15·s·(|clamp(r,.1,1)−1|)², s)
    (raytracing.h:188-194)
  - empty cells (max opacity ≤ ε) are skipped whole via the DDA
  - one jitter per ray: position = org + lerp(jitter, t.x, t.y)·dir
  - opacity correction: α ← 1−(1−α)^(sampling_rate·Δt) (raytracing.h:166-170)

Differentiability: `fixed_steps=True` swaps the while_loop for a lax.scan of
`max_supersteps` iterations, making the whole image differentiable w.r.t.
network parameters (for rendered-image gradient parity tests).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE, MacroCell
from instantvnr_tpu.config import NEARLY_ONE, env_int
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls

_EPS = 1e-6
# step past a cell boundary when probing the next cell, in t units
_PROBE_EPS = 1e-3


@dataclass(frozen=True)
class RaymarchSettings:
    sampling_rate: float = 1.0  # samples per voxel (api vnrRendererSetVolumeSamplingRate)
    density_scale: float = 1.0
    # sample slots per ray per superstep; the VNR_RM_N_ITERS env override
    # matches the reference knob (method_raymarching.cu:30-40), read at
    # instantiation time
    n_iters: int = field(
        default_factory=lambda: env_int("VNR_RM_N_ITERS", 16))
    max_skips: int = 8  # empty-cell DDA skips per slot (VPU-only work)
    # samples emitted per slot from the CURRENT cell (no new occupancy
    # probe between them): the march trajectory is unchanged (bit-exact,
    # tested), only the superstep chunking differs. MEASURED LOSS on v5e
    # (scratch /tmp sps sweep, r3): 512² K8S1 6.53 / K4S2 5.89 / K8S2
    # 4.36 fps; 768² 2.97 / 1.92 / 2.04 — the SAMPLE phase costs per LANE
    # (masked-invalid lanes still issue their pool gathers), so the probe
    # saving never offsets the wasted lanes where intervals clamp at cell
    # exits. Keep 1 unless sampling becomes free relative to emission.
    samples_per_slot: int = 1
    max_supersteps: int = 192
    shading: str = "none"  # "none" | "gradient" | "ssh"
    shading_scale: float = 0.95  # scivis_shading_scale
    gradient_step_frac: float = 1.0  # grad_step = frac/dims (object.cpp:305)
    light_dir: tuple = (0.7, 0.9, 0.4)  # instantvnr_types.h:148
    ssh_shadow_sampling_scale: float = 2.0  # shadow-pass rate scale
    # opacity-correction exponent override: the SSH shadow pass marches at
    # sampling_rate/scale but corrects with the PRIMARY rate, exactly like
    # the reference (raymarching_transmittance marches at 2·step yet uses
    # self.step_rcp, method_raymarching.cu:365-399). None → sampling_rate.
    correction_sampling_rate: float | None = None
    fixed_steps: bool = False  # True → differentiable scan loop
    # "shadow": per-sample directional-light shadow modulation — the
    # reference's FULL_SHADOW mode (api.h:39, method_optix.cu:208-215:
    # sampleColor = lerp(shadingScale, c, c·transmittance)). The per-sample
    # shadow-ray march is replaced by the precomputed sheared-cumprod
    # shadow volume (render/shadow.py) sampled trilinearly — same
    # transmittance quantity, amortized (oracle-tested in test_shadow.py);
    # callers pass it as `shadow_vol`.
    # host-orchestrated bucketed ray compaction (render/compaction.py) —
    # the TPU analog of the reference wavefront's stream compaction.
    # Only honored by Renderer.render (needs host-side counts, so it can't
    # run under an outer jit); ignored when fixed_steps is set.
    compact: bool = False
    # speculative dispatch depth for the compacted driver: keep up to this
    # many superstep live-counts in flight (copy_to_host_async) and act on
    # them STALE instead of blocking after every dispatch. Live counts only
    # decrease within a frame, so a stale count keeps the bucket ≥ live —
    # always safe; 0 reproduces the serialized schedule exactly. Measured
    # (scratch/dispatch_pipeline.py, v5e through the tunnel): per-dispatch
    # wall 32 ms serialized → 16 ms at depth 1 → 9.5 ms at depth 2; the
    # cost is up to `speculate` extra supersteps at a stale bucket size.
    # MEASURED END-TO-END LOSS at 512² (scratch/speculate_sweep.py:
    # 3.61/3.47/2.69/2.16 fps at depth 0/1/2/3 — delayed compaction keeps
    # supersteps at big buckets); kept for non-compacting workloads.
    speculate: int = 0
    # replay the previous frame's superstep/compaction schedule
    # free-running and validate with async counts afterwards — the
    # progressive-accumulation fast path (compaction._replay). Safe for
    # any scene/camera change: an invalid replay is detected and the
    # frame re-rendered serialized; wavefront output is bit-identical
    # under ANY schedule (per-ray state is slot-independent).
    schedule_replay: bool = True
    # settle the replay validation at the NEXT frame instead of blocking
    # at the end of this one (compaction.settle_pending): the per-frame
    # link round-trip vanishes (measured 6.6 → 7.7 fps @512²); the frame
    # stays provisional until the renderer settles it — on the rare
    # invalid replay the renderer rolls the accumulation back and
    # re-renders that frame serialized with the same key.
    deferred_validation: bool = True
    # compacted-driver frame tiling: split the frame's rays into this many
    # contiguous row bands, each driven through ITS OWN superstep/
    # compaction/replay schedule (compaction.raymarch_compacted). Rays in
    # a band are spatially coherent, so each band's bucket tracks ITS ray
    # population instead of one global bucket holding the frame's longest
    # tail — buckets shrink `tiles`x faster where rays die early. Output
    # is bit-identical for any tiling (per-ray state is slot-independent).
    # Band programs share the bucket family of an untiled frame of the
    # band's size. 1 = off.
    tiles: int = 1
    # run-to-completion threshold override for the compacted driver
    # (None → compaction._FINISH_BUCKET = 32768). Under per-dispatch
    # replay bigger tails amortized link latency (65536 best at
    # 768²·tiles=3, 5.4 vs 5.0 fps); once fused whole-frame execution
    # made dispatch free the optimum moved DOWN to 16384 (6.39 vs 6.14 —
    # less masked-lane compute in the finisher; NOTES_ROUND4 sweeps).
    # 512² keeps the default either way.
    finish_bucket: int | None = None
    # fuse a stable replayed schedule into ONE whole-frame device program
    # (AOT-compiled in the background after the schedule repeats
    # unchanged; compaction._FusedAdapter). Eliminates the per-dispatch
    # link gaps of free-running replay: 512² brick wavefront measured
    # 112 → 66 ms/frame (scratch/megaframe.py). Output and validation
    # semantics are identical to per-dispatch replay.
    fused_replay: bool = True

    def __post_init__(self):
        assert self.shading in ("none", "gradient", "ssh",
                                "shadow"), self.shading
        assert self.tiles >= 1, self.tiles


class _RayState(NamedTuple):
    t: jnp.ndarray  # [R] current position (t.x)
    t_cell_end: jnp.ndarray  # [R] exit t of current cell
    ss: jnp.ndarray  # [R] step size within current cell
    alpha: jnp.ndarray  # [R]
    color: jnp.ndarray  # [R,3]
    active: jnp.ndarray  # [R] bool
    # SINGLE_SHADE_HEURISTIC bookkeeping (method_raymarching.cu:455-467):
    # the highest-contribution sample along the ray, for deferred shading
    best_w: jnp.ndarray  # [R] contribution (1−α)·α_s at the best sample
    best_pos: jnp.ndarray  # [R,3] object-space position of that sample
    best_rgb: jnp.ndarray  # [R,3] its TF color
    # fused-sampling carry (occ_aux path): per-cell aux value (brick slot)
    # and flat cell id of the cell the ray is currently stepping, captured
    # by the emit probe that entered it — persists across supersteps like
    # t_cell_end/ss. Exact in f32 for < 2^24 cells (guarded at ctx build).
    aux_slot: jnp.ndarray  # [R] f32
    aux_cell: jnp.ndarray  # [R] f32


def _cell_exit_t(org, dirn, cell, w: float):
    """t at which the ray leaves `cell` (cells of width w voxels).

    org/dirn: [R,3] voxel-space; cell: [R,3] int32. Axis-parallel directions
    produce +inf (IEEE 1/0) and drop out of the min.
    """
    step_pos = (dirn > 0).astype(jnp.float32)
    boundary = (cell.astype(jnp.float32) + step_pos) * w
    t_ax = (boundary - org) / dirn  # ±inf where dirn == 0
    t_ax = jnp.where(jnp.isfinite(t_ax), t_ax, jnp.inf)
    return jnp.min(t_ax, axis=-1)


def _cell_flat(mc: MacroCell, cell: jnp.ndarray) -> jnp.ndarray:
    """Clamped flat macrocell id (the DDA never leaves the grid in the
    reference; clamping is equivalent at the boundary because t_far
    already bounds the march)."""
    mx, my, mz = mc.dims
    c = jnp.clip(cell, 0, jnp.array([mx - 1, my - 1, mz - 1], jnp.int32))
    return (c[..., 2] * my + c[..., 1]) * mx + c[..., 0]


def _occupancy(mc: MacroCell, cell: jnp.ndarray) -> jnp.ndarray:
    """Gather per-cell max opacity."""
    return mc.max_opacity.reshape(-1)[_cell_flat(mc, cell)]


def _adaptive_rate(step, max_opacity):
    """adaptiveSamplingRate (raytracing.h:188-194)."""
    scale = 15.0 * step
    r = jnp.abs(jnp.clip(max_opacity, 0.1, 1.0) - 1.0)
    return jnp.maximum(step + scale * r * r, step)


def _quantized_step(ss, t0, t1):
    """sample_size_scaler (method_raymarching.cu:263-267): shrink ss so the
    interval divides into an integer number of steps."""
    n = jnp.floor((t1 - t0) / ss).astype(jnp.int32) + 1
    return (t1 - t0) / jnp.maximum(n.astype(jnp.float32), 1.0)


def _emit_samples(org, dirn, t_far, state: _RayState, mc: MacroCell,
                  base_step, n_iters: int, max_skips: int, occ_aux=None,
                  samples_per_slot: int = 1):
    """Phase 1: per-ray K-slot emission scan, S samples per slot.

    Returns (new marching state pieces, t_x [R,K·S], t_y [R,K·S],
    valid [R,K·S], aux_slot [R,K·S], aux_cell [R,K·S]).
    Each slot first advances through up to `max_skips` empty cells (occupancy
    gather + boundary math only), then emits up to `samples_per_slot`
    consecutive sample intervals [t_x, t_y) from the current cell.

    occ_aux: optional [n_cells, 2] rows of (max opacity, aux value). When
    given, the per-probe occupancy gather fetches this ROW instead of the
    scalar (per-row gather cost is flat in width, NOTES_ROUND2), and the
    aux of the emitting cell rides along with each sample — the brick
    cache uses this to skip its per-sample cell→slot LUT gather entirely
    (1 gather/sample instead of 2). occ_aux[:, 0] must equal
    mc.max_opacity flat for emission parity.
    """
    w = float(MACROCELL_SIZE)

    def slot(carry, _):
        t, t_cell_end, ss, aslot, acell = carry

        def skip_body(_, c):
            t, t_cell_end, ss, aslot, acell = c
            need_new = t >= t_cell_end - _EPS
            # probe the cell just past the current position
            p = org + (t + _PROBE_EPS)[:, None] * dirn
            cell = jnp.floor(p / w).astype(jnp.int32)
            cflat = _cell_flat(mc, cell)
            if occ_aux is None:
                occ = mc.max_opacity.reshape(-1)[cflat]
                slot_v = jnp.zeros_like(occ)
            else:
                row = occ_aux[cflat]
                occ, slot_v = row[:, 0], row[:, 1]
            t_exit = jnp.maximum(_cell_exit_t(org, dirn, cell, w), t + _PROBE_EPS)
            empty = occ <= _EPS
            in_range = t < t_far
            # empty cell → jump to its exit; occupied → set up stepping.
            # The cell interval is clamped at the march end exactly like the
            # reference's dda (cell_t1 = min(ray_t0 + t_closest, t_max),
            # dda.h:84) — quantization divides the CLAMPED interval, and no
            # sample ever lands past the clip plane / volume exit.
            enter = need_new & in_range & ~empty
            skip = need_new & in_range & empty
            t_exit_c = jnp.minimum(t_exit, t_far)
            new_ss = _quantized_step(_adaptive_rate(base_step, occ), t,
                                     t_exit_c)
            t = jnp.where(skip, t_exit, t)
            ss = jnp.where(enter, new_ss, ss)
            t_cell_end = jnp.where(enter, t_exit_c, t_cell_end)
            aslot = jnp.where(enter, slot_v, aslot)
            acell = jnp.where(enter, cflat.astype(jnp.float32), acell)
            return (t, t_cell_end, ss, aslot, acell)

        t, t_cell_end, ss, aslot, acell = jax.lax.fori_loop(
            0, max_skips, skip_body, (t, t_cell_end, ss, aslot, acell)
        )
        # emit up to S consecutive sample intervals within the current
        # cell (t_cell_end is already clamped at t_far above); no
        # occupancy probe between them — intervals past the cell exit are
        # invalid and re-emitted by the next slot's probe
        txs, tys, vs = [], [], []
        for _ in range(samples_per_slot):
            t_y = jnp.minimum(t + ss, t_cell_end)
            valid = (t_y > t + _EPS) & (t < t_far) & (t_cell_end > t)
            txs.append(t)
            tys.append(t_y)
            vs.append(valid)
            t = jnp.where(valid, t_y, t)
        s_stack = [jnp.stack(x, axis=-1) for x in (txs, tys, vs)]  # [R,S]
        aux_s = [jnp.repeat(a[:, None], samples_per_slot, axis=1)
                 for a in (aslot, acell)]
        return ((t, t_cell_end, ss, aslot, acell),
                tuple(s_stack) + tuple(aux_s))

    carry0 = (state.t, state.t_cell_end, state.ss, state.aux_slot,
              state.aux_cell)
    (t, t_cell_end, ss, aslot, acell), (txs, tys, valids, aslots, acells) = \
        jax.lax.scan(slot, carry0, None, length=n_iters)
    # scan stacks along axis 0 → [K, R, S]; fold to [R, K·S] keeping
    # front-to-back order (slot-major, then sample-within-slot)
    def fold(x):
        return jnp.moveaxis(x, 0, 1).reshape(x.shape[1], -1)

    return ((t, t_cell_end, ss, aslot, acell), fold(txs), fold(tys),
            fold(valids), fold(aslots), fold(acells))


def _compose(values, t_x, t_y, valid, state_alpha, state_color,
             tf: TransferFunction, sampling_rate, density_scale,
             rgb_override=None, track_best=None, pos_obj=None):
    """Phase 3: front-to-back blend over the K slots (scan).

    values: [R, K] sampled data values; rgb_override: optional [R, K, 3]
    shaded colors to use instead of the TF color (gradient shading).
    track_best: optional (best_w, best_pos, best_rgb) carried argmax state
    for SSH (requires pos_obj [R, K, 3]); returns it updated.
    """
    # control-point classification: pure VPU math, measured 5× cheaper
    # than the LUT gather on v5e (43.5 → 8.8 ms / 2M samples,
    # scratch/superstep_phases.py); falls back to the LUT past 64 segments
    rgb_tf, alpha_s = classify_controls(tf, values)  # [R,K,3], [R,K]
    rgb = rgb_tf if rgb_override is None else rgb_override
    dt = t_y - t_x
    # opacity correction (raytracing.h:166-170) + density scale
    alpha_s = 1.0 - jnp.power(jnp.maximum(1.0 - alpha_s, 0.0),
                              sampling_rate * dt * density_scale)
    alpha_s = jnp.where(valid, alpha_s, 0.0)

    def slot(carry, xs):
        acc_a, acc_c, bw, bp, bc = carry
        a_k, rgb_k, rgbtf_k, pos_k = xs
        live = acc_a < NEARLY_ONE
        tr = jnp.where(live, 1.0 - acc_a, 0.0)
        if track_best is not None:
            w = tr * a_k  # contribution (method_raymarching.cu:462)
            better = w > bw
            bw = jnp.where(better, w, bw)
            bp = jnp.where(better[:, None], pos_k, bp)
            bc = jnp.where(better[:, None], rgbtf_k, bc)
        acc_c = acc_c + tr[:, None] * rgb_k * a_k[:, None]
        acc_a = acc_a + tr * a_k
        return (acc_a, acc_c, bw, bp, bc), None

    if track_best is None:
        r = values.shape[0]
        track_best = (jnp.zeros((r,)), jnp.zeros((r, 3)), jnp.zeros((r, 3)))
    if pos_obj is None:
        pos_obj = jnp.zeros(values.shape + (3,))
    (alpha, color, bw, bp, bc), _ = jax.lax.scan(
        slot,
        (state_alpha, state_color) + tuple(track_best),
        (jnp.moveaxis(alpha_s, 1, 0), jnp.moveaxis(rgb, 1, 0),
         jnp.moveaxis(rgb_tf, 1, 0), jnp.moveaxis(pos_obj, 1, 0)),
    )
    return alpha, color, (bw, bp, bc)


def init_ray_state(t_near: jnp.ndarray, t_far: jnp.ndarray) -> _RayState:
    """Fresh marching state for a batch of rays ([R] t ranges)."""
    r = t_near.shape[0]
    return _RayState(
        t=t_near,
        # forces cell entry on first slot; `+ 0.0` keeps this a distinct
        # buffer from `t` (the compaction driver donates the whole state,
        # and aliased leaves would be donated twice)
        t_cell_end=t_near + 0.0,
        ss=jnp.full((r,), jnp.inf, jnp.float32),
        alpha=jnp.zeros((r,), jnp.float32),
        color=jnp.zeros((r, 3), jnp.float32),
        active=t_near < t_far,
        best_w=jnp.zeros((r,), jnp.float32),
        best_pos=jnp.zeros((r, 3), jnp.float32),
        best_rgb=jnp.zeros((r, 3), jnp.float32),
        aux_slot=jnp.zeros((r,), jnp.float32),
        aux_cell=jnp.zeros((r,), jnp.float32),
    )


def _superstep(sample_fn, org, dirn, t_far, jitter, mc: MacroCell,
               tf: TransferFunction, settings: "RaymarchSettings",
               light_dir, state: _RayState, scale=None,
               shadow_vol=None, occ_aux=None, fused_fn=None) -> _RayState:
    """One bulk-synchronous superstep: EMIT → SAMPLE → COMPOSE.

    Shared by the in-jit loops of `raymarch` and the host-orchestrated
    compaction driver (render/compaction.py), which runs it on shrinking
    active-ray prefixes.

    scale: optional [3] voxel→world scaling (render/transform.py). When set,
    `dirn` is the UNNORMALIZED voxel-space direction and shading quantities
    are mapped back to world space (view = S·dirn, normal = grad/(dims·S) —
    the diagonal xfmNormal of method_raymarching.cu:441/1085).

    occ_aux + fused_fn: fused sampling (see _emit_samples). fused_fn is
    called as fused_fn(pos [N,3], slot [N], cellflat [N]) for the primary
    samples of the none/ssh/shadow shadings; gradient probes cross cell
    walls so gradient shading keeps the plain sample_fn."""
    r = org.shape[0]
    k = settings.n_iters * settings.samples_per_slot
    dims = jnp.array(mc.volume_dims, jnp.float32)
    base_step = 1.0 / settings.sampling_rate
    grad_step = settings.gradient_step_frac / dims  # object units

    (t, t_cell_end, ss, aslot, acell), t_x, t_y, valid, sl_k, cf_k = \
        _emit_samples(
            org, dirn, t_far, state, mc, base_step,
            settings.n_iters, settings.max_skips, occ_aux=occ_aux,
            samples_per_slot=settings.samples_per_slot,
        )
    use_fused = occ_aux is not None and fused_fn is not None

    def _sample_primary(pos_flat):
        if use_fused:
            return fused_fn(pos_flat, sl_k.reshape(-1), cf_k.reshape(-1))
        return sample_fn(pos_flat)
    valid = valid & state.active[:, None]
    # sample position: lerp(jitter, t.x, t.y) (method_raymarching.cu:431)
    t_s = t_x + jitter[:, None] * (t_y - t_x)
    pos_v = org[:, None, :] + t_s[..., None] * dirn[:, None, :]  # [R,K,3]
    pos_obj = pos_v / dims  # voxel → object space

    if settings.shading == "gradient":
        # forward-difference gradient needs 3 extra sample batches
        # (raytracing.h:112-130, with the boundary flip)
        stp = jnp.broadcast_to(grad_step, pos_obj.shape)
        stp = jnp.where(pos_obj + stp > 1.0 - _EPS, -stp, stp)
        offsets = jnp.stack(
            [
                jnp.stack([stp[..., 0], jnp.zeros_like(stp[..., 0]),
                           jnp.zeros_like(stp[..., 0])], -1),
                jnp.stack([jnp.zeros_like(stp[..., 1]), stp[..., 1],
                           jnp.zeros_like(stp[..., 1])], -1),
                jnp.stack([jnp.zeros_like(stp[..., 2]),
                           jnp.zeros_like(stp[..., 2]), stp[..., 2]], -1),
            ],
            axis=0,
        )  # [3,R,K,3]
        # primary samples ride the fused path (same cell as the probe);
        # the ±step probes cross cell walls, so they keep the plain
        # sampler — 7 gathers per shaded sample instead of 8
        values = _sample_primary(pos_obj.reshape(-1, 3)).reshape(r, k)
        probe_pos = (pos_obj[None] + offsets)  # [3,R,K,3]
        probe_vals = sample_fn(probe_pos.reshape(-1, 3)).reshape(3, r, k)
        grad = jnp.stack(
            [(probe_vals[ax] - values) / stp[..., ax] for ax in range(3)],
            axis=-1,
        )  # [R,K,3] object-space gradient
        if scale is None:
            shade_dir = dirn
            normal = -grad
        else:
            # world-space shading under anisotropic scaling: view dir back
            # through S, normal through the inverse-transpose (diagonal →
            # divide by dims·scale)
            from instantvnr_tpu.utils.math import normalize as _nrm

            shade_dir = _nrm(dirn * scale)
            normal = -grad / (dims * scale)
        rgb_tf, _ = classify_controls(tf, values)
        shaded = _shade_scivis(shade_dir[:, None, :], normal, rgb_tf,
                               light_dir=light_dir)
        rgb_override = (
            settings.shading_scale * shaded
            + (1.0 - settings.shading_scale) * rgb_tf
        )
    elif settings.shading == "shadow":
        # FULL_SHADOW (method_optix.cu:208-215): modulate the TF color by
        # the directional-light transmittance at the sample —
        # lerp(shadingScale, c, c·shadow) = c·((1−s) + s·shadow)
        from instantvnr_tpu.ops.trilinear import sample_volume

        values = _sample_primary(pos_obj.reshape(-1, 3)).reshape(r, k)
        sh = sample_volume(shadow_vol, pos_obj.reshape(-1, 3)).reshape(r, k)
        sh = jnp.clip(sh, 0.0, 1.0)
        rgb_tf, _ = classify_controls(tf, values)
        s_ = settings.shading_scale
        rgb_override = rgb_tf * ((1.0 - s_) + s_ * sh)[..., None]
    else:
        values = _sample_primary(pos_obj.reshape(-1, 3)).reshape(r, k)
        rgb_override = None

    track = ((state.best_w, state.best_pos, state.best_rgb)
             if settings.shading == "ssh" else None)
    alpha, color, best = _compose(
        values, t_x, t_y, valid, state.alpha, state.color, tf,
        settings.correction_sampling_rate or settings.sampling_rate,
        settings.density_scale, rgb_override,
        track_best=track, pos_obj=pos_obj,
    )
    if settings.shading != "ssh":
        best = (state.best_w, state.best_pos, state.best_rgb)
    active = state.active & (t < t_far) & (alpha < NEARLY_ONE)
    return _RayState(t=t, t_cell_end=t_cell_end, ss=ss, alpha=alpha,
                     color=color, active=active,
                     best_w=best[0], best_pos=best[1], best_rgb=best[2],
                     aux_slot=aslot, aux_cell=acell)


def raymarch(
    sample_fn: Callable[[jnp.ndarray], jnp.ndarray],
    org: jnp.ndarray,  # [R,3] voxel-space ray origins
    dirn: jnp.ndarray,  # [R,3] normalized directions
    t_near: jnp.ndarray,  # [R]
    t_far: jnp.ndarray,  # [R]
    mc: MacroCell,
    tf: TransferFunction,
    jitter: jnp.ndarray,  # [R] in [0,1)
    settings: RaymarchSettings,
    light_dir: jnp.ndarray | None = None,  # [3], already view-flipped
    scale=None,  # [3] voxel→world scaling (render/transform.py)
    clip_lower=None,  # [3] voxel-space clip box (api.h:146)
    clip_upper=None,
    shadow_vol=None,  # [dz,dy,dx] transmittance (shading == "shadow")
) -> jnp.ndarray:
    """March rays through the volume; returns rgba [R,4].

    sample_fn maps OBJECT-space positions [N,3] in [0,1]³ → values [N].
    Positions handed to it follow the reference's neural-mode convention
    (raw object coords; the GT path applies its own cell-centered remap
    inside sample_fn via ops.trilinear.sample_volume).

    light_dir: the directional light for gradient/SSH shading. The caller
    (render/renderer.py) flips it against the camera view per frame
    (renderer.cpp:98-100); when None, settings.light_dir is used unflipped.

    scale/clip_lower/clip_upper: anisotropic scaling + clipping box. The
    caller is responsible for clipping the PRIMARY rays' [t_near, t_far] to
    the clip box (render/renderer.py does); here they only shape the
    deferred SSH shadow rays, whose box intersection the reference also
    takes against the clip box (it overwrites DeviceVolume::bbox,
    object.cpp:386-391).
    """
    from instantvnr_tpu.utils.math import normalize as _normalize

    dims = jnp.array(mc.volume_dims, jnp.float32)
    if light_dir is None:
        light_dir = jnp.asarray(settings.light_dir, jnp.float32)
    light_dir = _normalize(light_dir)

    state = init_ray_state(t_near, t_far)

    def superstep(state: _RayState) -> _RayState:
        return _superstep(sample_fn, org, dirn, t_far, jitter, mc, tf,
                          settings, light_dir, state, scale=scale,
                          shadow_vol=shadow_vol)

    if settings.fixed_steps:
        def scan_body(st, _):
            return superstep(st), None

        state, _ = jax.lax.scan(scan_body, state, None,
                                length=settings.max_supersteps)
    else:
        def cond(carry):
            st, i = carry
            return jnp.any(st.active) & (i < settings.max_supersteps)

        def body(carry):
            st, i = carry
            return superstep(st), i + 1

        state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))

    if settings.shading == "ssh":
        def march_shadow(org2, dir2, t0b, t1b, sh_settings, sh_jitter):
            return raymarch(sample_fn, org2, dir2, t0b, t1b, mc, tf,
                            sh_jitter, sh_settings, scale=scale,
                            clip_lower=clip_lower, clip_upper=clip_upper)

        color = ssh_deferred_shade(
            march_shadow, state.color, state.alpha, state.best_w,
            state.best_pos, state.best_rgb, light_dir, dims, settings,
            scale, clip_lower, clip_upper, jitter)
        state = state._replace(color=color)

    return jnp.concatenate([state.color, state.alpha[:, None]], axis=-1)


def ssh_shadow_settings(settings: RaymarchSettings) -> RaymarchSettings:
    """Settings for the deferred SSH shadow pass: march at the scaled-down
    rate but opacity-correct with the PRIMARY rate (the reference's
    raymarching_transmittance, method_raymarching.cu:365-399)."""
    from dataclasses import replace

    return replace(
        settings,
        sampling_rate=(settings.sampling_rate
                       / settings.ssh_shadow_sampling_scale),
        correction_sampling_rate=settings.sampling_rate,
        shading="none",
        compact=False,
    )


def ssh_deferred_shade(march_shadow, color, alpha, best_w, best_pos,
                       best_rgb, light_dir, dims, settings: RaymarchSettings,
                       scale, clip_lower, clip_upper, jitter):
    """Deferred single-shade pass (method_raymarching.cu:469-484): march a
    shadow ray from each ray's highest-contribution sample toward the light
    and blend the shaded color by its transmittance. Shared by the in-jit
    marcher and the compaction driver (march_shadow runs the actual march).
    """
    from instantvnr_tpu.utils.math import ray_box_intersect

    org2 = best_pos * dims  # object → voxel space
    light_v = light_dir if scale is None else light_dir / scale
    dir2 = jnp.broadcast_to(light_v[None, :], org2.shape)
    box_lo = jnp.zeros(3) if clip_lower is None else clip_lower
    box_hi = dims if clip_upper is None else clip_upper
    _, t1b, hitb = ray_box_intersect(org2, dir2, box_lo, box_hi)
    has_best = best_w > 0.0
    t1b = jnp.where(hitb & has_best, jnp.maximum(t1b, 0.0), 0.0)
    # fresh jitter for the transmittance march — the reference redraws its
    # RNG (rng.get_floats(), method_raymarching.cu:378); a multiplicative
    # hash of the primary jitter decorrelates without threading a key
    sh_jitter = jnp.mod(jitter * 16807.0 + 0.37, 1.0)
    rgba_sh = march_shadow(org2, dir2, jnp.zeros_like(t1b), t1b,
                           ssh_shadow_settings(settings), sh_jitter)
    transmittance = 1.0 - rgba_sh[:, 3]
    shaded = best_rgb * alpha[:, None] * transmittance[:, None]
    s_ = settings.shading_scale
    return jnp.where(has_best[:, None],
                     (1.0 - s_) * color + s_ * shaded, color)


def _shade_scivis(ray_dir, normal, albedo,
                  light_dir=(-1.0, 0.0, 0.0),
                  light_diffuse=(1.0, 1.0, 1.0),
                  mat_ambient=0.6, mat_diffuse=0.9, mat_specular=0.4,
                  mat_shininess=40.0):
    """shade_scivis_light (raytracing.h:224-246) blended 50/50 with the
    simple headlight (shade_simple_light, :215-222) as the reference does."""
    nn = jnp.sum(normal * normal, axis=-1, keepdims=True)
    has_n = nn > 1e-6
    n = normal / jnp.sqrt(jnp.maximum(nn, 1e-20))
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    v = -ray_dir
    cos_nl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)
    h = l + v
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
    cos_nh = jnp.maximum(jnp.sum(n * h, axis=-1, keepdims=True), 0.0)
    diffuse = jnp.asarray(light_diffuse, jnp.float32)
    color = mat_ambient * albedo
    color = color + jnp.where(
        cos_nl > 0,
        mat_diffuse * cos_nl * albedo * diffuse
        + mat_specular * jnp.power(cos_nh, mat_shininess) * diffuse,
        0.0,
    )
    color = jnp.where(has_n, color, 0.0)
    # shade_simple_light
    cos_vn = jnp.abs(jnp.sum(-ray_dir * n, axis=-1, keepdims=True))
    simple = jnp.where(has_n, albedo * (0.2 + 0.8 * cos_vn), 0.0)
    return 0.5 * simple + 0.5 * color
