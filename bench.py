"""Benchmark: interactive neural volume rendering at 512².

Mirrors the reference's headline benchmark (`apps/batch_renderer.cpp:196-238`:
768² frames, 5 warmup, per-frame fps; README.md:24 claims 10–60 fps on an
RTX 3090) on the driver's north-star config: vorts-like 128³ volume, default
model schema, 512² frame, sample-streaming neural rendering with macrocell
skipping. Baseline for vs_baseline is 10 fps (the reference's interactive
floor; its tuned wavefront tops out at 7.2 fps on the in-code N_ITERS table,
method_raymarching.cu:43-49).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus a
"secondary" object carrying the reference protocol's other numbers
(batch_renderer.cpp:196-238 reports per-frame fps AND training samples/s):
neural-wavefront fps (network inference inside the ray-march loop, the
reference's mode-5 flagship), training Msamples/s at both the benchmarked
hash schema (2^14 — see note below) and the untouched reference schema
(2^19, example-model.json), and PSNR. Extra context lines go to stderr.
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


def main(report=None):
    if report is None:
        report = {}
    import dataclasses

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    from instantvnr_tpu.models.metrics import psnr_vs
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    size = 512
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    # Reference default schema (example-model.json) with the hash table
    # capped at 2^14/level FOR THE TRAIN+RENDER PIPELINE below: XLA's
    # scatter-add (the only scatter TPU v5e offers) scales badly in table
    # size (281 ms/step at 2^16 vs 85 ms at 2^14) while 128^3 PSNR barely
    # moves (53.2 -> 51.7 dB, target >30). The untouched 2^19 reference
    # schema is measured separately below and reported in "secondary".
    cfg = ModelConfig()
    cfg = dataclasses.replace(
        cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
    field = NeuralField.from_config(cfg)

    # compression ratio (README.md:24 claims 10-1000×): raw f32 grid vs the
    # fp16 checkpoint parameter payload of the benchmarked schema
    raw_bytes = dims[0] * dims[1] * dims[2] * 4
    report["compression"] = raw_bytes / (field.n_params * 2)
    log(f"compression: {report['compression']:.1f}x "
        f"({field.n_params} params fp16 vs {raw_bytes} B raw f32)")

    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)

    from instantvnr_tpu.render.camera import Camera

    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    state = create_train_state(jax.random.PRNGKey(0), field)

    # ---- flagship mode 5 renderer: sample-streaming neural wavefront ----
    # Built BEFORE training and warmed in a background thread while the
    # training stages run: program shapes don't depend on the trained
    # values, so the bucket-family compile overlaps training on a cold
    # cache (compile is the dominant cold cost through a remote link).
    rw, warm_thread, warm_err = None, None, []
    try:
        from instantvnr_tpu.models.network import render_params
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import Renderer, make_neural_sample_fn

        rw = Renderer(size, size, mc, tf, make_neural_sample_fn(field),
                      sample_ctx=render_params(state.params, field),
                      settings=RaymarchSettings(n_iters=4, compact=True))
        rw.set_camera(cam)
        t_warm = time.time()

        def _warm():
            try:
                nb = rw.warmup()
                log(f"wavefront warmup ({nb} buckets, parallel, overlapped "
                    f"with training): {time.time() - t_warm:.1f}s")
            except Exception as e:  # noqa: BLE001
                warm_err.append(e)

        import threading

        warm_thread = threading.Thread(target=_warm, daemon=True)
        warm_thread.start()
    except Exception as e:  # noqa: BLE001
        log(f"wavefront setup failed: {e!r}")

    # short pretrain so the rendered content is real (vnr_cmd_train analog)
    t0 = time.time()
    n_steps, batch = 150, 1 << 16
    # chunks of 10 steps, the reference's training pattern (batch_trainer.cpp:97)
    for _ in range(n_steps // 10):
        state = train_steps(field, vol.data, state, 10, batch)
    _ = float(state.loss)  # forced host sync (tunnel block_until_ready lies)
    dt_train = time.time() - t0
    log(f"train {n_steps}x{batch} (hash 2^14): {dt_train:.1f}s "
        f"({n_steps * batch / dt_train / 1e6:.1f} Msamples/s incl. compile)")

    # timed training throughput (post-compile)
    t0 = time.time()
    for _ in range(10):
        state = train_steps(field, vol.data, state, 10, batch)
    _ = float(state.loss)
    dt = time.time() - t0
    report["train_msps"] = 100 * batch / dt / 1e6
    log(f"train throughput (hash 2^14): {report['train_msps']:.2f} Msamples/s")

    log("computing PSNR...")
    p = float(psnr_vs(field, state.params, vol.data))
    report["psnr"] = p
    log(f"PSNR: {p:.2f} dB")

    # untouched reference schema (2^19, example-model.json): measured, not
    # silently downgraded (VERDICT r1). Fresh state; a few timed steps.
    try:
        cfg19 = ModelConfig()
        field19 = NeuralField.from_config(cfg19)
        state19 = create_train_state(jax.random.PRNGKey(0), field19)
        # n_steps is a static arg — warm with the SAME chunk size as the
        # timed call or the timing measures compilation
        state19 = train_steps(field19, vol.data, state19, 5, batch)
        _ = float(state19.loss)
        t0 = time.time()
        state19 = train_steps(field19, vol.data, state19, 5, batch)
        _ = float(state19.loss)
        dt19 = time.time() - t0
        report["train_msps_full"] = 5 * batch / dt19 / 1e6
        log(f"train throughput (hash 2^19, reference schema): "
            f"{report['train_msps_full']:.2f} Msamples/s")
        del state19, field19
    except Exception as e:  # noqa: BLE001 — keep the bench alive
        log(f"2^19 training measurement failed: {e!r}")

    # ---- flagship mode 5: sample-streaming neural wavefront ----
    # (network inference inside the march loop, method_raymarching.cu:687-973;
    # TPU-native scheduling: host-orchestrated bucketed ray compaction,
    # render/compaction.py; warmup overlapped with training above)
    try:
        if rw is None:
            raise RuntimeError("wavefront renderer setup failed earlier")
        if warm_thread is not None:
            warm_thread.join()
        if warm_err:
            raise warm_err[0]
        rw.set_sample_ctx(render_params(state.params, field))  # no retrace
        t0 = time.time()
        rw.render()
        _ = float(rw._frame.ravel()[0])
        log(f"wavefront first frame: {time.time() - t0:.1f}s")
        t0 = time.time()
        wf_frames = 3
        for _ in range(wf_frames):
            rw.render()
        _ = float(rw._frame.ravel()[0])
        wf_fps = wf_frames / (time.time() - t0)
        report["wavefront_fps"] = wf_fps
        log(f"neural wavefront {size}x{size}: {wf_fps:.3f} fps")
        del rw
    except Exception as e:  # noqa: BLE001
        log(f"wavefront measurement failed: {e!r}")

    # ---- interactive pipeline: progressive neural decode + slab render ----
    # (the reference's DECODING mode, rebuilt MXU-native, render/slabmarch.py;
    # skip structure = the GT-derived macrocell, matching the reference's
    # set_external aliasing of the ground-truth macrocell)
    from instantvnr_tpu.render.decoded import DecodedRenderer
    from instantvnr_tpu.render.slabmarch import SlabSettings

    r = DecodedRenderer(size, size, mc, tf, dims, field=field,
                        params=state.params, settings=SlabSettings())
    r.set_camera(cam)
    t0 = time.time()
    r.decode_all()
    _ = float(r.decoded.ravel()[0])
    log(f"full decode {dims}: {time.time()-t0:.2f}s "
        f"({r.n_blobs} blobs; progressive per-frame decoding available)")

    warmup = 5  # batch_renderer.cpp:199
    frames = 20
    for _ in range(warmup):
        r.render()
    _ = float(r._frame.ravel()[0])
    t0 = time.time()
    for _ in range(frames):
        r.render()
    _ = float(r._frame.ravel()[0])
    dt = time.time() - t0
    fps = frames / dt
    report["fps"] = fps
    report["metric"] = (f"neural decode+slab-render fps @ {size}x{size} "
                        f"(vorts 128^3, hash 2^14)")
    rays_per_s = fps * size * size
    log(f"render {size}x{size}: {fps:.2f} fps, {rays_per_s/1e6:.1f} Mrays/s")

    # gradient-shaded variant (mode 4/SCIVIS-style shading of the same grid)
    try:
        rsh = DecodedRenderer(size, size, mc, tf, dims, field=field,
                              params=state.params,
                              settings=SlabSettings(shading="gradient"),
                              initial_volume=r.decoded)
        rsh.set_camera(cam)
        for _ in range(3):
            rsh.render()
        _ = float(rsh._frame.ravel()[0])
        t0 = time.time()
        for _ in range(10):
            rsh.render()
        _ = float(rsh._frame.ravel()[0])
        report["fps_shaded"] = 10 / (time.time() - t0)
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
        for _ in range(3):
            r768.render()
        _ = float(r768._frame.ravel()[0])
        t0 = time.time()
        for _ in range(10):
            r768.render()
        _ = float(r768._frame.ravel()[0])
        report["fps_768"] = 10 / (time.time() - t0)
        log(f"render 768x768: {report['fps_768']:.2f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"768 stage failed: {e!r}")

    # first-hit isosurface of the decoded network (the int_isosurface app's
    # interactive viewing, render/isosurf.py slab sweep)
    try:
        from instantvnr_tpu.render.isosurf import IsoRenderer

        ri = IsoRenderer(size, size, r.decoded, tf, isovalue=0.5)
        ri.set_camera(cam)
        for _ in range(3):
            ri.render()
        _ = float(ri._frame.ravel()[0])
        t0 = time.time()
        for _ in range(10):
            ri.render()
        _ = float(ri._frame.ravel()[0])
        report["iso_fps"] = 10 / (time.time() - t0)
        log(f"isosurface {size}x{size}: {report['iso_fps']:.2f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"isosurface stage failed: {e!r}")

    # progressive path tracing of the decoded grid (MethodPathTracing,
    # method_pathtracing.cu; per-accumulation-frame fps)
    try:
        from instantvnr_tpu.render.pathtrace import PathTraceRenderer

        rpt = PathTraceRenderer(size, size, mc, tf, r.decoded)
        rpt.set_camera(cam)
        for _ in range(3):
            rpt.render()
        _ = float(rpt._frame.ravel()[0])
        t0 = time.time()
        for _ in range(10):
            rpt.render()
        _ = float(rpt._frame.ravel()[0])
        report["pt_fps"] = 10 / (time.time() - t0)
        log(f"pathtrace {size}x{size}: {report['pt_fps']:.2f} fps")
        del rpt
    except Exception as e:  # noqa: BLE001
        log(f"pathtrace stage failed: {e!r}")

    _emit_line(_json_line(report))


def _json_line(report):
    """Assemble the ONE driver-facing JSON line from whatever stages ran."""
    secondary = {}
    if "wavefront_fps" in report:
        secondary["neural_wavefront_fps_512"] = round(report["wavefront_fps"], 3)
    if "train_msps" in report:
        secondary["train_msamples_per_s_hash14"] = round(report["train_msps"], 3)
    if "train_msps_full" in report:
        secondary["train_msamples_per_s_hash19_ref_schema"] = round(
            report["train_msps_full"], 3)
    if "fps_768" in report:
        secondary["slab_fps_768"] = round(report["fps_768"], 3)
    if "fps_shaded" in report:
        secondary["slab_fps_512_shaded"] = round(report["fps_shaded"], 3)
    if "iso_fps" in report:
        secondary["isosurface_fps_512"] = round(report["iso_fps"], 3)
    if "pt_fps" in report:
        secondary["pathtrace_fps_512"] = round(report["pt_fps"], 3)
    if "psnr" in report:
        secondary["psnr_db"] = round(report["psnr"], 2)
    if "compression" in report:
        secondary["compression_x_fp16_params"] = round(report["compression"], 1)
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
