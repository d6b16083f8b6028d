"""Benchmark: interactive neural volume rendering at 512².

Mirrors the reference's headline benchmark (`apps/batch_renderer.cpp:196-238`:
768² frames, 5 warmup, per-frame fps; README.md:24 claims 10–60 fps on an
RTX 3090) on the driver's north-star config: vorts-like 128³ volume, default
model schema, 512² frame. Baseline for vs_baseline is 10 fps (the
reference's interactive floor; its tuned wavefront tops out at 7.2 fps on
the in-code N_ITERS table, method_raymarching.cu:43-49).

Stage hygiene (VERDICT r2 item 4): every stage warms ITS OWN programs
before its timed section, and the overlapped wavefront warmup thread is
joined before any other stage is timed — no stage's number includes another
stage's compile. Cold-start costs are reported separately (warmup s, first
frame s); apps/vnr_precompile.py pre-populates the persistent cache so a
fresh process starts warm.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
"secondary" object: brick/exact wavefront fps (the sample-streaming
mode-5 flagship: brick = macrocell-guided decoded-brick cache, exact =
per-sample network evaluation), slab fps (512/768/shaded/512³), compacted
path tracing (decoded AND neural), isosurface, training Msamples/s at the
bench schema (2^14) and the untouched reference schema (2^19) — each also
under the paired-corner hash variant (4 rows/hashed level instead of 8,
with its own exact-wavefront fps and 1000-step protocol PSNR for quality
parity) — PSNR, SSIM, the reference-protocol 1000-step PSNR, and
compression at 128³ and 512³. Extra context lines go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeated bench runs (and the driver's) skip the
# remote-compile round trips, which dominate cold runs through the tunnel
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    # block_until_ready does not reliably block through the device tunnel;
    # force a scalar readback (the one implementation lives in utils)
    from instantvnr_tpu.utils.profiling import sync

    return sync(x)


def _time_frames(r, frames: int, warm: int = 3) -> float:
    for _ in range(warm):
        r.render()
    _sync(r._frame)
    t0 = time.time()
    for _ in range(frames):
        r.render()
    _sync(r._frame)
    return frames / (time.time() - t0)


def _warm_fused(r, frames: int = 4):
    """Record + stabilize the schedule, block for the background fused
    whole-frame compile (persistently cached after the first bench run on
    a machine), then prime the settle pipeline — so _time_frames measures
    the fused steady state (compaction.fused_frame)."""
    from instantvnr_tpu.render.compaction import wait_fused_compiles

    t0 = time.time()
    for _attempt in range(3):
        for _ in range(frames):
            r.render()
        _sync(r._frame)
        wait_fused_compiles()
        if r._sched_cache.get("fused_frames", 0):
            break  # engaged (later attempts: bucket schedule drifted)
    dt = time.time() - t0
    if dt > 1.0:
        log(f"fused whole-frame compile: {dt:.1f}s (background)")
    for _ in range(r._fused_depth + 1):
        r.render()
    _sync(r._frame)


def main(report=None):
    if report is None:
        report = {}
    import dataclasses

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    from instantvnr_tpu.models.metrics import psnr_vs, ssim_arrays, decode_volume
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    size = 512
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    # Reference default schema (example-model.json) with the hash table
    # capped at 2^14/level FOR THE TRAIN+RENDER PIPELINE below: XLA's
    # scatter-add (the only scatter TPU v5e offers) scales badly in table
    # size while 128^3 PSNR barely moves (53.2 -> 51.7 dB, target >30). The
    # untouched 2^19 reference schema is measured separately below.
    cfg = ModelConfig()
    cfg = dataclasses.replace(
        cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
    field = NeuralField.from_config(cfg)

    # compression (README.md:24 claims 10-1000×): fp16 parameter payload vs
    # raw f32 grid, at the bench volume AND a 512³ volume (the reference's
    # ratios come from large volumes; 128³ under-sells by construction)
    report["compression"] = dims[0] ** 3 * 4 / (field.n_params * 2)
    report["compression_512"] = 512 ** 3 * 4 / (field.n_params * 2)
    log(f"compression: {report['compression']:.1f}x @128^3, "
        f"{report['compression_512']:.0f}x @512^3 "
        f"({field.n_params} params fp16 vs raw f32)")

    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)

    from instantvnr_tpu.render.camera import Camera

    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    state = create_train_state(jax.random.PRNGKey(0), field)

    # ---- exact neural wavefront, built early: its bucket-family compile
    # overlaps the training stages on a cold cache (program shapes don't
    # depend on trained values). The thread is JOINED before any other
    # stage is timed.
    rw, warm_thread, warm_err = None, None, []
    try:
        from instantvnr_tpu.models.network import render_params
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import Renderer, make_neural_sample_fn

        # n_iters=8 + fused: the r5 exact sweep (scratch/exact_sweep_r5.py,
        # midpoint ladder on) measured n4 1.083 / n8 1.197 / n8-fused
        # 1.222 fps — the exact path is superstep-granularity sensitive
        rw = Renderer(size, size, mc, tf, make_neural_sample_fn(field),
                      sample_ctx=render_params(state.params, field),
                      settings=RaymarchSettings(n_iters=8, compact=True))
        rw.set_camera(cam)
        t_warm = time.time()

        def _warm():
            try:
                nb = rw.warmup()
                log(f"exact-wavefront warmup ({nb} buckets, parallel, "
                    f"overlapped with training): {time.time() - t_warm:.1f}s")
            except Exception as e:  # noqa: BLE001
                warm_err.append(e)

        import threading

        warm_thread = threading.Thread(target=_warm, daemon=True)
        warm_thread.start()
    except Exception as e:  # noqa: BLE001
        log(f"wavefront setup failed: {e!r}")

    # ---- training (the reference trains in chunks of 10, batch_trainer) --
    t0 = time.time()
    n_steps, batch = 150, 1 << 16
    for _ in range(n_steps // 10):
        state = train_steps(field, vol.data, state, 10, batch)
    _ = float(state.loss)
    dt_train = time.time() - t0
    log(f"train {n_steps}x{batch} (hash 2^14): {dt_train:.1f}s wall "
        "(compile/warmup-dominated on a cold cache; steady-state "
        "throughput is the next line)")

    # timed training throughput (post-compile)
    t0 = time.time()
    for _ in range(10):
        state = train_steps(field, vol.data, state, 10, batch)
    _ = float(state.loss)
    dt = time.time() - t0
    report["train_msps"] = 100 * batch / dt / 1e6
    log(f"train throughput (hash 2^14): {report['train_msps']:.2f} Msamples/s")

    # join the overlapped warmup BEFORE timing anything else (stage hygiene)
    if warm_thread is not None:
        warm_thread.join()

    # train to the 1000-step protocol point (batch_trainer.cpp:42) before
    # measuring quality: the EARLY curve is non-monotonic — loss spikes
    # put the step-250 PSNR anywhere in 43-54 dB across numerics-identical
    # runs (measured r5, NOTES_ROUND5) — while the 1000-step point is
    # stable. The render stages below inherit the better-trained params.
    for _ in range(75):
        state = train_steps(field, vol.data, state, 10, batch)
    _ = float(state.loss)

    log("computing PSNR + SSIM (at the 1000-step protocol point)...")
    p = float(psnr_vs(field, state.params, vol.data))
    report["psnr"] = p
    decoded_for_ssim = decode_volume(field, state.params, dims)
    report["ssim"] = float(ssim_arrays(decoded_for_ssim, vol.data))
    del decoded_for_ssim
    log(f"PSNR: {p:.2f} dB   SSIM: {report['ssim']:.4f}")

    # untouched reference schema (2^19, example-model.json): throughput
    try:
        cfg19 = ModelConfig()
        field19 = NeuralField.from_config(cfg19)
        state19 = create_train_state(jax.random.PRNGKey(0), field19)
        state19 = train_steps(field19, vol.data, state19, 5, batch)
        _ = float(state19.loss)
        t0 = time.time()
        state19 = train_steps(field19, vol.data, state19, 5, batch)
        _ = float(state19.loss)
        dt19 = time.time() - t0
        report["train_msps_full"] = 5 * batch / dt19 / 1e6
        log(f"train throughput (hash 2^19, reference schema): "
            f"{report['train_msps_full']:.2f} Msamples/s")
        # MFU-style statement vs the measured hardware ceiling, RE-MEASURED
        # r5 (VERDICT r4 #1): the bf16-precast fused gather with real corner
        # indices costs ~6 ns/row at the 2^19 footprint (scratch/
        # split_final.py: 23.8 ms for 2^16 x 64 rows; round 1's 13 ns/row
        # figure predates the precast + real-index locality), so the
        # training FORWARD alone cannot exceed 1/(rows x 6 ns) samples/s.
        # The step's measured composition (NOTES_ROUND5): fwd gather ~24,
        # bwd scatter+splat ~50, MLP 2.5, sampling+Adam ~8 ms at B=2^16 —
        # i.e. the step sits near its fwd+bwd component floor; the bound %
        # below is vs the (unreachable) gather-only forward.
        row_ns = 6.0
        rows19 = 8 * field19.spec.n_levels
        bound19 = 1e3 / (rows19 * row_ns)  # Msamples/s
        report["train_bound_msps"] = bound19
        report["train_bound_pct"] = 100 * report["train_msps_full"] / bound19
        log(f"  forward-gather bound ({rows19} rows/sample x {row_ns:.0f} "
            f"ns, re-measured r5): {bound19:.2f} Msamples/s -> full step "
            f"runs at {report['train_bound_pct']:.0f}% of the gather-only "
            f"bound (remainder: backward scatter — the measured v5e "
            f"scatter floor — + Adam)")

        # reference-protocol run: 1000 steps (batch_trainer.cpp:42) at the
        # untouched schema, PSNR+SSIM after (VERDICT r2: first-class, not
        # notes). MEDIAN OF 3 SEEDS (r5): the converged PSNR at 2^19
        # collision pressure is seed-chaotic — measured spread 51.8-55.5 dB
        # across 4 seeds with oracle-verified gradients (NOTES_ROUND5) —
        # so a single draw is ±2 dB noise, not a quality signal.
        t0 = time.time()
        for _ in range(99):
            state19 = train_steps(field19, vol.data, state19, 10, batch)
        _ = float(state19.loss)
        psnrs = [float(psnr_vs(field19, state19.params, vol.data))]
        d19 = decode_volume(field19, state19.params, dims)
        report["ssim_1000_ref"] = float(ssim_arrays(d19, vol.data))
        del d19
        for seed in (1, 2):
            st_s = create_train_state(jax.random.PRNGKey(seed), field19)
            for _ in range(100):
                st_s = train_steps(field19, vol.data, st_s, 10, batch)
            _ = float(st_s.loss)
            psnrs.append(float(psnr_vs(field19, st_s.params, vol.data)))
            del st_s
        psnrs.sort()
        report["psnr_1000_ref"] = psnrs[1]  # median of 3
        report["psnr_1000_ref_spread"] = psnrs[-1] - psnrs[0]
        log(f"reference protocol (1000 steps @2^19, 3 seeds): "
            f"PSNR median {report['psnr_1000_ref']:.2f} dB "
            f"(runs: {', '.join(f'{p:.2f}' for p in psnrs)}), "
            f"SSIM {report['ssim_1000_ref']:.4f} "
            f"({time.time() - t0:.0f}s)")
        del state19, field19
    except Exception as e:  # noqa: BLE001 — keep the bench alive
        log(f"2^19 stage failed: {e!r}")

    # ---- paired-corner hash variant (native schema option) ---------------
    # Hashed levels cost 4 pair-row gathers instead of 8 corner rows
    # (ops/hash_encoding.py paired section) — the gather-wall lever for
    # training AND exact-network streaming. Measured alongside the tcnn
    # schema; quality parity at the same 1000-step protocol.
    paired_state = None
    try:
        cfgp = dataclasses.replace(
            cfg, encoding=dataclasses.replace(cfg.encoding,
                                              hash_variant="paired"))
        fieldp = NeuralField.from_config(cfgp)
        paired_state = create_train_state(jax.random.PRNGKey(0), fieldp)
        for _ in range(15):
            paired_state = train_steps(fieldp, vol.data, paired_state, 10,
                                       batch)
        _ = float(paired_state.loss)
        t0 = time.time()
        for _ in range(10):
            paired_state = train_steps(fieldp, vol.data, paired_state, 10,
                                       batch)
        _ = float(paired_state.loss)
        report["train_msps_paired14"] = 100 * batch / (time.time() - t0) / 1e6
        log(f"train throughput (hash 2^14, paired): "
            f"{report['train_msps_paired14']:.2f} Msamples/s")

        cfg19p = dataclasses.replace(
            ModelConfig(), encoding=dataclasses.replace(
                ModelConfig().encoding, hash_variant="paired"))
        field19p = NeuralField.from_config(cfg19p)
        st19p = create_train_state(jax.random.PRNGKey(0), field19p)
        # warm with the SAME step count as the timed call: train_steps
        # jits per scan length, so a 10-step warmup would leave the
        # 5-step program to compile INSIDE the timed region (observed:
        # 0.013 "Msamples/s" that was really a ~25 s remote compile)
        st19p = train_steps(field19p, vol.data, st19p, 5, batch)
        st19p = train_steps(field19p, vol.data, st19p, 5, batch)
        _ = float(st19p.loss)
        t0 = time.time()
        st19p = train_steps(field19p, vol.data, st19p, 5, batch)
        _ = float(st19p.loss)
        report["train_msps_paired19"] = 5 * batch / (time.time() - t0) / 1e6
        log(f"train throughput (hash 2^19, paired): "
            f"{report['train_msps_paired19']:.2f} Msamples/s")
        sp = field19p.spec
        # paired's FORWARD gathers narrow per-corner rows (8/level, same as
        # tcnn — the pair win is the halved backward scatter), so the
        # forward bound uses 8 rows/level at the re-measured 6 ns/row
        rows_p = 8 * sp.n_levels
        bound_p = 1e3 / (rows_p * 6.0)
        report["train_bound_pct_paired"] = (
            100 * report["train_msps_paired19"] / bound_p)
        log(f"  paired forward-gather bound ({rows_p} rows/sample): "
            f"{bound_p:.2f} Msamples/s -> "
            f"{report['train_bound_pct_paired']:.0f}% of bound")
        # same 1000-step protocol as the tcnn schema above → PSNR parity
        t0 = time.time()
        for _ in range(98):
            st19p = train_steps(field19p, vol.data, st19p, 10, batch)
        _ = float(st19p.loss)
        report["psnr_1000_paired"] = float(psnr_vs(field19p, st19p.params,
                                                   vol.data))
        log(f"paired protocol (1000 steps @2^19): "
            f"PSNR {report['psnr_1000_paired']:.2f} dB "
            f"({time.time() - t0:.0f}s)")
        del st19p, field19p
    except Exception as e:  # noqa: BLE001
        log(f"paired stage failed: {e!r}")

    # ---- flagship mode 5a: brick-cache sample streaming ------------------
    # (macrocell-guided decoded-brick pool, render/brickcache.py — the
    # TPU-native sample-streaming fast path; round-3 redesign)
    brick_frame = None
    exact_frame = None
    try:
        from instantvnr_tpu.render.brickcache import (
            brick_sample_fn,
            build_brick_cache,
        )

        t0 = time.time()
        # f16 pool on the exact-convention lattice — the facade's auto
        # default (f16: 105.8 dB vs f32, half the gathered bytes; exact
        # lattice: the mode-5 field, +6 dB vs the exact render at the
        # same cost — NOTES_ROUND4)
        ctx = build_brick_cache(field, state.params, mc, dilate=1,
                                dtype=jnp.float16, convention="exact")
        _sync(ctx["packed"].astype(jnp.float32))
        log(f"brick cache build: {time.time() - t0:.2f}s "
            f"({ctx['packed'].nbytes / 1e6:.0f} MB f16)")
        bset = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
        rb = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                      settings=bset)
        rb.set_camera(cam)
        t0 = time.time()
        rb.warmup()
        log(f"brick-wavefront warmup: {time.time() - t0:.1f}s")
        t0 = time.time()
        rb.render(); _sync(rb._frame)
        log(f"brick-wavefront first frame: {time.time() - t0:.2f}s")
        _warm_fused(rb)
        report["brick_fps"] = _time_frames(rb, 8, warm=0)
        log(f"brick wavefront {size}x{size} (fused frames: "
            f"{rb._sched_cache.get('fused_frames', 0)}): "
            f"{report['brick_fps']:.3f} fps")
        # matched-jitter protocol: align the key chain before every
        # comparison frame — two different jitter draws alone differ by
        # ~37 dB (measured), which would swamp the field-quality signal
        rb._key = jax.random.PRNGKey(123)
        rb.reset_accumulation()
        rb.render()
        brick_frame = np.asarray(rb._frame)
        del rb
        # orbiting camera: per-frame camera rebind — the interactive drag
        # pattern (schedule replay revalidates per frame; vnr_cmd_render
        # --orbit analog)
        import math

        import dataclasses as _dc

        # fused stays ON for the orbit: executables key on the STRIPPED
        # (kind, bucket) schedule, which is camera-independent, so one
        # executable serves the whole orbit once the sequence stabilizes
        # (r4 third session: 5.4 per-dispatch → 9.25 fused)
        rbo = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                       settings=bset)

        def _orbit(i, n=64):
            a = 2 * math.pi * i / n
            rr = 2.2 * dims[0]
            return Camera(eye=(rr * math.sin(a), 0.15 * dims[1],
                               -rr * math.cos(a)),
                          center=(0, 0, 0), up=(0, 1, 0), fovy=45)

        from instantvnr_tpu.render.compaction import wait_fused_compiles

        rbo.set_camera(_orbit(0))
        rbo.warmup()
        for i in range(12):  # warm lap: record + let fused compiles land
            rbo.set_camera(_orbit(i))
            rbo.render()
        _sync(rbo._frame)
        wait_fused_compiles()
        for i in range(12, 16):
            rbo.set_camera(_orbit(i))
            rbo.render()
        _sync(rbo._frame)
        t0 = time.time()
        for i in range(16, 24):
            rbo.set_camera(_orbit(i))
            rbo.render()
        _sync(rbo._frame)
        report["brick_orbit_fps"] = 8 / (time.time() - t0)
        log(f"brick wavefront {size}x{size} ORBIT (fused "
            f"{rbo._sched_cache.get('fused_frames', 0)}, invalidated "
            f"{rbo._sched_cache.get('invalidated', 0)}): "
            f"{report['brick_orbit_fps']:.3f} fps")
        del rbo
        # the reference's own benchmark frame size, streaming mode —
        # 3-band frame tiling + 64k tail finisher (the facade defaults at
        # ≥480k rays; bit-identical scheduling — NOTES_ROUND4 sweeps)
        rb768 = Renderer(768, 768, mc, tf, brick_sample_fn, sample_ctx=ctx,
                         settings=_dc.replace(bset, tiles=3,
                                              finish_bucket=16384))
        rb768.set_camera(cam)
        rb768.warmup()
        _warm_fused(rb768)
        report["brick_fps_768"] = _time_frames(rb768, 6, warm=0)
        log(f"brick wavefront 768x768 (tiles=3, fused frames: "
            f"{rb768._sched_cache.get('fused_frames', 0)}): "
            f"{report['brick_fps_768']:.3f} fps")
        del rb768
    except Exception as e:  # noqa: BLE001
        log(f"brick wavefront stage failed: {e!r}")

    # ---- flagship mode 5b: exact sample streaming (per-sample network
    # evaluation — the reference's literal mode-5 semantics) ---------------
    try:
        if rw is None:
            raise RuntimeError("wavefront renderer setup failed earlier")
        if warm_err:
            raise warm_err[0]
        rw.set_sample_ctx(render_params(state.params, field))  # no retrace
        t0 = time.time()
        rw.render()
        _sync(rw._frame)
        log(f"exact-wavefront first frame: {time.time() - t0:.1f}s")
        _warm_fused(rw)  # n8-fused measured best (scratch/exact_sweep_r5.py)
        report["wavefront_fps"] = _time_frames(rw, 3, warm=0)
        log(f"exact neural wavefront {size}x{size}: "
            f"{report['wavefront_fps']:.3f} fps")
        if brick_frame is not None:
            rw._key = jax.random.PRNGKey(123)  # matched-jitter protocol
            rw.reset_accumulation()
            rw.render()
            exact_frame = np.asarray(rw._frame)
            mse = float(np.mean((brick_frame - exact_frame) ** 2))
            report["brick_vs_exact_psnr"] = 10 * np.log10(1.0 / max(mse, 1e-12))
            log(f"brick-vs-exact frame PSNR: "
                f"{report['brick_vs_exact_psnr']:.1f} dB")
        del rw
    except Exception as e:  # noqa: BLE001
        log(f"exact wavefront measurement failed: {e!r}")

    # ---- hq (2x-supersampled) brick pool: the "hq" streaming-cache
    # policy — nested-lattice decode cuts trilinear error ~h² vs the
    # exact network (the closest interactive point to the reference's
    # literal mode-5 quality; README quality note)
    try:
        t0 = time.time()
        ctx_hq = build_brick_cache(field, state.params, mc, dilate=1,
                                   dtype=jnp.float16, supersample=2,
                                   convention="exact")
        _sync(ctx_hq["packed"][0].astype(jnp.float32))
        log(f"hq brick cache build: {time.time() - t0:.2f}s "
            f"({ctx_hq['packed'].nbytes / 1e6:.0f} MB f16 2x)")
        rhq = Renderer(size, size, mc, tf, brick_sample_fn,
                       sample_ctx=ctx_hq,
                       settings=RaymarchSettings(n_iters=8, max_skips=1,
                                                 compact=True))
        rhq.set_camera(cam)
        rhq.warmup()
        _warm_fused(rhq)
        report["brick_hq_fps"] = _time_frames(rhq, 8, warm=0)
        log(f"hq brick wavefront {size}x{size} (2x pool): "
            f"{report['brick_hq_fps']:.3f} fps")
        if exact_frame is not None:
            rhq._key = jax.random.PRNGKey(123)  # matched-jitter protocol
            rhq.reset_accumulation()
            rhq.render()
            hq_frame = np.asarray(rhq._frame)
            mse = float(np.mean((hq_frame - exact_frame) ** 2))
            report["hq_vs_exact_psnr"] = 10 * np.log10(1.0 / max(mse, 1e-12))
            log(f"hq-vs-exact frame PSNR: "
                f"{report['hq_vs_exact_psnr']:.1f} dB "
                f"(1x pool: {report.get('brick_vs_exact_psnr', 0):.1f})")
        del rhq, ctx_hq
    except Exception as e:  # noqa: BLE001
        log(f"hq brick wavefront stage failed: {e!r}")

    # exact streaming with the PAIRED schema: same mode-5 semantics, ~2x
    # fewer gather rows/sample at the bench schema (1 dense + 7 hashed:
    # 57 -> 29 packed rows)
    try:
        if paired_state is None:
            raise RuntimeError("paired training stage failed earlier")
        # n8 per the r5 exact sweep (paired n4 1.012 / n8 1.175 fps);
        # fused off — this stage's number documents the paired-forward
        # null result, one whole-frame compile isn't worth it
        rwp = Renderer(size, size, mc, tf, make_neural_sample_fn(fieldp),
                       sample_ctx=render_params(paired_state.params, fieldp),
                       settings=RaymarchSettings(n_iters=8, compact=True,
                                                 fused_replay=False))
        rwp.set_camera(cam)
        t0 = time.time()
        rwp.warmup()
        log(f"paired-wavefront warmup: {time.time() - t0:.1f}s")
        t0 = time.time()
        rwp.render()
        _sync(rwp._frame)
        log(f"paired-wavefront first frame: {time.time() - t0:.1f}s")
        report["wavefront_fps_paired"] = _time_frames(rwp, 3, warm=0)
        log(f"exact neural wavefront {size}x{size} (paired): "
            f"{report['wavefront_fps_paired']:.3f} fps")
        del rwp
    except Exception as e:  # noqa: BLE001
        log(f"paired exact wavefront failed: {e!r}")

    # ---- interactive pipeline: progressive neural decode + slab render ---
    from instantvnr_tpu.render.decoded import DecodedRenderer
    from instantvnr_tpu.render.slabmarch import SlabSettings

    r = DecodedRenderer(size, size, mc, tf, dims, field=field,
                        params=state.params, settings=SlabSettings())
    r.set_camera(cam)
    t0 = time.time()
    r.decode_all()
    _sync(r.decoded)
    log(f"full decode {dims}: {time.time()-t0:.2f}s "
        f"({r.n_blobs} blobs; progressive per-frame decoding available)")

    report["fps"] = _time_frames(r, 20, warm=5)  # batch_renderer.cpp:199
    report["metric"] = (f"neural decode+slab-render fps @ {size}x{size} "
                        f"(vorts 128^3, hash 2^14)")
    log(f"render {size}x{size}: {report['fps']:.2f} fps, "
        f"{report['fps'] * size * size / 1e6:.1f} Mrays/s")

    # gradient-shaded variant (mode 4-style shading of the same grid)
    try:
        rsh = DecodedRenderer(size, size, mc, tf, dims, field=field,
                              params=state.params,
                              settings=SlabSettings(shading="gradient"),
                              initial_volume=r.decoded)
        rsh.set_camera(cam)
        report["fps_shaded"] = _time_frames(rsh, 10, warm=3)
        log(f"render shaded {size}x{size}: {report['fps_shaded']:.2f} fps")
        del rsh
    except Exception as e:  # noqa: BLE001
        log(f"shaded stage failed: {e!r}")

    # the reference's own benchmark frame size (batch_renderer.cpp:199)
    try:
        r768 = DecodedRenderer(768, 768, mc, tf, dims, field=field,
                               params=state.params, settings=SlabSettings(),
                               initial_volume=r.decoded)
        r768.set_camera(cam)
        report["fps_768"] = _time_frames(r768, 10, warm=3)
        log(f"render 768x768: {report['fps_768']:.2f} fps")
        del r768
    except Exception as e:  # noqa: BLE001
        log(f"768 stage failed: {e!r}")

    # first-hit isosurface of the decoded network (render/isosurf.py)
    try:
        from instantvnr_tpu.render.isosurf import IsoRenderer

        ri = IsoRenderer(size, size, r.decoded, tf, isovalue=0.5)
        ri.set_camera(cam)
        report["iso_fps"] = _time_frames(ri, 10, warm=3)
        log(f"isosurface {size}x{size}: {report['iso_fps']:.2f} fps")
        del ri
    except Exception as e:  # noqa: BLE001
        log(f"isosurface stage failed: {e!r}")

    # progressive path tracing, host-orchestrated bucketed compaction
    # (round 3; paths die exponentially — method_pathtracing.cu RR)
    try:
        from instantvnr_tpu.render.pathtrace import (
            PathTraceRenderer,
            PathTraceSettings,
        )

        rpt = PathTraceRenderer(size, size, mc, tf, r.decoded,
                                settings=PathTraceSettings(compact=True))
        rpt.set_camera(cam)
        t0 = time.time()
        rpt.warmup()
        log(f"pathtrace warmup: {time.time() - t0:.1f}s")
        _warm_fused(rpt)
        log(f"pathtrace fused frames: "
            f"{rpt._sched_cache.get('fused_frames', 0)}")
        report["pt_fps"] = _time_frames(rpt, 10, warm=3)
        log(f"pathtrace {size}x{size}: {report['pt_fps']:.2f} fps")
        del rpt
    except Exception as e:  # noqa: BLE001
        log(f"pathtrace stage failed: {e!r}")

    # neural path tracing: brick-cache sampling inside the tracking loop
    # (reference PATHTRACING_SAMPLE_STREAMING)
    try:
        from instantvnr_tpu.render.brickcache import brick_sample_fn as _bfn

        rptn = PathTraceRenderer(size, size, mc, tf, ctx, sample_fn=_bfn,
                                 settings=PathTraceSettings(compact=True))
        rptn.set_camera(cam)
        rptn.warmup()
        _warm_fused(rptn)
        log(f"pathtrace neural fused frames: "
            f"{rptn._sched_cache.get('fused_frames', 0)}")
        report["pt_neural_fps"] = _time_frames(rptn, 10, warm=3)
        log(f"pathtrace neural {size}x{size}: "
            f"{report['pt_neural_fps']:.2f} fps")
        del rptn
    except Exception as e:  # noqa: BLE001
        log(f"neural pathtrace stage failed: {e!r}")

    # ---- 512³ volume: large-scale slab fps (round-1 stage restored) ------
    try:
        dims5 = (512, 512, 512)
        vol5 = synthetic_volume(dims5, kind="vorts")
        mc5 = mcmod.build(vol5.data, dims5, tf)
        r5 = DecodedRenderer(size, size, mc5, tf, dims5,
                             settings=SlabSettings(),
                             initial_volume=vol5.data)
        r5.set_camera(Camera(eye=(0.15 * 512, 0.1 * 512, -2.0 * 512),
                             center=(0, 0, 0), up=(0, 1, 0), fovy=45))
        report["fps_512cube"] = _time_frames(r5, 10, warm=3)
        log(f"render 512x512 of 512^3: {report['fps_512cube']:.2f} fps")
        del r5
    except Exception as e:  # noqa: BLE001
        log(f"512^3 stage failed: {e!r}")
        vol5 = mc5 = None

    # ---- 512³ brick wavefront: the streaming cache's headline use case ---
    # (VERDICT r4 #4a: the memory-gated pool + wavefront at the scale the
    # design exists for — pool memory + fps, not just the 128³ bench scene)
    try:
        if vol5 is None:
            raise RuntimeError("512^3 volume unavailable")
        from instantvnr_tpu.render.brickcache import (
            brick_cache_bytes,
            brick_sample_fn,
            build_brick_cache,
        )

        # brief training so the pool decodes a real field of this volume
        cfg5 = dataclasses.replace(
            cfg, encoding=dataclasses.replace(cfg.encoding,
                                              log2_hashmap_size=14))
        field5 = NeuralField.from_config(cfg5)
        st5 = create_train_state(jax.random.PRNGKey(0), field5)
        for _ in range(10):
            st5 = train_steps(field5, vol5.data, st5, 10, 1 << 16)
        _ = float(st5.loss)
        pool_mb = brick_cache_bytes(mc5, dilate=1, dtype=jnp.float16) / 2**20
        t0 = time.time()
        ctx5 = build_brick_cache(field5, st5.params, mc5, dilate=1,
                                 dtype=jnp.float16, convention="exact")
        _sync(ctx5["packed"][:1].astype(jnp.float32))
        log(f"512^3 brick pool: {pool_mb:.0f} MB f16, "
            f"decode+pack {time.time() - t0:.1f}s")
        report["pool_mb_512cube"] = pool_mb
        from instantvnr_tpu.render.renderer import Renderer as _WfR

        rb5 = _WfR(size, size, mc5, tf, brick_sample_fn, sample_ctx=ctx5,
                   settings=RaymarchSettings(n_iters=8, max_skips=1,
                                             compact=True))
        rb5.set_camera(Camera(eye=(0.15 * 512, 0.1 * 512, -2.0 * 512),
                              center=(0, 0, 0), up=(0, 1, 0), fovy=45))
        t0 = time.time()
        rb5.warmup()
        log(f"512^3 wavefront warmup: {time.time() - t0:.1f}s")
        _warm_fused(rb5)
        report["brick_fps_512cube"] = _time_frames(rb5, 10, warm=3)
        log(f"brick wavefront 512x512 of 512^3: "
            f"{report['brick_fps_512cube']:.2f} fps "
            f"(pool {pool_mb:.0f} MB)")
        del rb5, ctx5, st5, vol5, mc5
    except Exception as e:  # noqa: BLE001
        log(f"512^3 wavefront stage failed: {e!r}")

    # ---- out-of-core training on a multi-GB file (VERDICT r4 #4b) --------
    # The terascale flagship: native threaded loader streaming random
    # blocks from disk while the device trains — measured samples/s and %
    # of the in-core number at the same schema/batch.
    try:
        import os

        from instantvnr_tpu.config import VolumeDesc
        from instantvnr_tpu.data.outofcore import OutOfCoreSampler
        from instantvnr_tpu.models.trainer import train_out_of_core

        n_side = 1024  # 1024³ f32 = 4.3 GB — never resident in memory
        path = f"/tmp/vnr_ooc_bench_{n_side}.raw"
        nbytes = n_side ** 3 * 4
        if not (os.path.exists(path) and os.path.getsize(path) == nbytes):
            t0 = time.time()
            yy, xx = np.meshgrid(np.linspace(0, 1, n_side),
                                 np.linspace(0, 1, n_side), indexing="ij")
            with open(path + ".tmp", "wb") as f:
                for iz in range(n_side):
                    zc = iz / (n_side - 1)
                    slab = (0.5 + 0.5 * np.sin(9 * xx + 5 * zc)
                            * np.cos(7 * yy - 3 * zc)
                            * np.exp(-((xx - .5) ** 2 + (yy - .5) ** 2
                                       + (zc - .5) ** 2) * 4)
                            ).astype(np.float32)
                    f.write(slab.tobytes())
            os.replace(path + ".tmp", path)
            log(f"generated {path} ({nbytes / 2**30:.1f} GiB, "
                f"{time.time() - t0:.0f}s)")
        desc = VolumeDesc(filename=path, dims=(n_side,) * 3, dtype="FLOAT",
                          value_range=(0.0, 1.0))
        sampler = OutOfCoreSampler(desc, block_y=32, block_z=32,
                                   n_threads=4)
        log(f"OOC loader: native={sampler.is_native}, "
            f"{sampler.n_resident} resident blocks")
        sampler.wait_ready(min(8, sampler.n_resident), timeout=120)
        fo = NeuralField.from_config(cfg)  # same 2^14 schema as in-core
        sto = create_train_state(jax.random.PRNGKey(3), fo)
        sto = train_out_of_core(fo, sampler, sto, 5, batch)  # compile+warm
        _ = float(sto.loss)
        n_timed = 20
        t0 = time.time()
        sto = train_out_of_core(fo, sampler, sto, n_timed, batch)
        _ = float(sto.loss)
        dt = time.time() - t0
        report["ooc_msps"] = n_timed * batch / dt / 1e6
        if "train_msps" in report:
            report["ooc_vs_incore_pct"] = (100 * report["ooc_msps"]
                                           / report["train_msps"])
        log(f"out-of-core training (1024^3, 4.3 GiB, native loader): "
            f"{report['ooc_msps']:.2f} Msamples/s"
            + (f" = {report['ooc_vs_incore_pct']:.0f}% of in-core"
               if "ooc_vs_incore_pct" in report else ""))
        del sampler, sto
    except Exception as e:  # noqa: BLE001
        log(f"out-of-core stage failed: {e!r}")

    _emit_line(_json_line(report))


def _json_line(report):
    """Assemble the ONE driver-facing JSON line from whatever stages ran."""
    secondary = {}
    pairs = [
        ("brick_fps", "brick_wavefront_fps_512"),
        ("brick_orbit_fps", "brick_wavefront_orbit_fps_512"),
        ("brick_fps_768", "brick_wavefront_fps_768"),
        ("wavefront_fps", "neural_wavefront_fps_512"),
        ("brick_vs_exact_psnr", "brick_vs_exact_frame_psnr_db"),
        ("brick_hq_fps", "brick_wavefront_hq_fps_512"),
        ("hq_vs_exact_psnr", "hq_vs_exact_frame_psnr_db"),
        ("train_msps", "train_msamples_per_s_hash14"),
        ("train_msps_full", "train_msamples_per_s_hash19_ref_schema"),
        ("train_msps_paired14", "train_msamples_per_s_hash14_paired"),
        ("train_msps_paired19", "train_msamples_per_s_hash19_paired"),
        ("wavefront_fps_paired", "neural_wavefront_fps_512_paired"),
        ("psnr_1000_paired", "psnr_db_1000steps_paired_schema"),
        ("fps_768", "slab_fps_768"),
        ("fps_shaded", "slab_fps_512_shaded"),
        ("fps_512cube", "slab_fps_512_of_512cube"),
        ("brick_fps_512cube", "brick_wavefront_fps_512_of_512cube"),
        ("pool_mb_512cube", "brick_pool_mb_512cube"),
        ("ooc_msps", "ooc_train_msamples_per_s"),
        ("ooc_vs_incore_pct", "ooc_vs_incore_pct"),
        ("iso_fps", "isosurface_fps_512"),
        ("pt_fps", "pathtrace_fps_512"),
        ("pt_neural_fps", "pathtrace_neural_fps_512"),
        ("psnr", "psnr_db"),
        ("ssim", "ssim"),
        ("psnr_1000_ref", "psnr_db_1000steps_ref_schema"),
        ("psnr_1000_ref_spread", "psnr_db_1000steps_seed_spread"),
        ("ssim_1000_ref", "ssim_1000steps_ref_schema"),
        ("compression", "compression_x_fp16_params_128cube"),
        ("compression_512", "compression_x_fp16_params_512cube"),
    ]
    for key, name in pairs:
        if key in report:
            secondary[name] = round(report[key], 4 if "ssim" in name else 3)
    # derived per-chip rays/s (BASELINE names rays/s/chip as the metric) +
    # the gather-bound MFU statement
    for key, name, px in (
            ("fps", "rays_per_s_slab_512", 512),
            ("fps_768", "rays_per_s_slab_768", 768),
            ("brick_fps", "rays_per_s_brick_wavefront_512", 512),
            ("brick_fps_768", "rays_per_s_brick_wavefront_768", 768),
            ("wavefront_fps", "rays_per_s_exact_wavefront_512", 512)):
        if key in report:
            secondary[name] = round(report[key] * px * px, 0)
    for key, name in (("train_bound_pct", "samples_per_s_bound_pct"),
                      ("train_bound_pct_paired",
                       "samples_per_s_bound_pct_paired"),
                      ("train_bound_msps", "samples_per_s_gather_bound_m")):
        if key in report:
            secondary[name] = round(report[key], 1)
    return {
        "metric": report.get(
            "metric", "neural decode+slab-render fps @ 512x512 (hash 2^14)"),
        "value": round(report.get("fps", 0.0), 3),
        "unit": "fps",
        "vs_baseline": round(report.get("fps", 0.0) / 10.0, 3),
        "secondary": secondary,
    }


import threading as _threading

_EMIT_LOCK = _threading.Lock()
_EMITTED = False


def _emit_line(line: dict) -> None:
    """Print the ONE driver-facing JSON line, at most once per process
    (the watchdog and the main thread may race to emit)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(line), flush=True)


def _emit_best_effort(report):
    """Emit ONE JSON line from whatever stages completed."""
    if "fps" in report:
        _emit_line(_json_line(report))
    elif "train_msps" in report:
        line = _json_line(report)
        line["metric"] = "training samples/s (render stage failed)"
        line["value"] = round(report["train_msps"] * 1e6, 0)
        line["unit"] = "samples/s"
        line["vs_baseline"] = 0.0
        _emit_line(line)
    else:
        return False
    return True


def main_safe():
    """Best-effort wrapper: if a later stage dies (the tunneled TPU can
    drop mid-run), still emit ONE JSON line with the last good metric.

    A watchdog covers the worst tunnel failure: device calls that HANG
    rather than raise (observed: trivial matmuls block >1 h when the link
    wedges). Threads can't cancel a blocked PJRT call, so after
    VNR_BENCH_WATCHDOG seconds (default 45 min) the watchdog prints the
    best-effort line and hard-exits."""
    import os
    import threading
    import traceback

    report = {}
    done = threading.Event()

    def _watchdog():
        try:
            budget = float(os.environ.get("VNR_BENCH_WATCHDOG", "2700"))
        except ValueError:
            log("WATCHDOG: malformed VNR_BENCH_WATCHDOG; using 2700s")
            budget = 2700.0
        if not done.wait(budget):
            log(f"WATCHDOG: bench exceeded {budget:.0f}s (wedged device "
                "link?); emitting best-effort metrics")
            if not _emit_best_effort(report):
                _emit_line({
                    "metric": "bench watchdog: no stage completed "
                              "(device link wedged)",
                    "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
                })
            # exit 0 so the driver still records the emitted line
            os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    try:
        main(report)
    except Exception:
        traceback.print_exc(file=sys.stderr)
        if not _emit_best_effort(report):
            raise
    finally:
        done.set()


if __name__ == "__main__":
    main_safe()
