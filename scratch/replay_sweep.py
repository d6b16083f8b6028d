"""Measure schedule replay (compaction._replay) on the real TPU:
wavefront (brick cache, 512²/768²) and path tracer (decoded, 512²),
replay off vs on.

Replay dispatches the previous frame's superstep/compaction schedule
free-running (~2 ms/dispatch, scratch/dispatch_pipeline.py) and validates
with async counts — one link round-trip per frame instead of one per
dispatch.

Run: cd /root/repo && timeout 3000 python scratch/replay_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(x.ravel()[0])


def main():
    import dataclasses

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import (NeuralField, create_train_state,
                                       train_steps)
    from instantvnr_tpu.render.brickcache import (brick_sample_fn,
                                                  build_brick_cache)
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.pathtrace import (PathTraceRenderer,
                                                 PathTraceSettings)
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import Renderer
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    cfg = ModelConfig()
    cfg = dataclasses.replace(
        cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
    field = NeuralField.from_config(cfg)
    state = create_train_state(jax.random.PRNGKey(0), field)
    for _ in range(10):
        state = train_steps(field, vol.data, state, 10, 1 << 16)
    _ = float(state.loss)
    ctx = build_brick_cache(field, state.params, mc, dilate=1)
    _ = sync(ctx["packed"])
    log("scene ready")

    base = {}
    for size in (512, 768):
        for replay in (False, True):
            s = RaymarchSettings(n_iters=8, max_skips=1, compact=True,
                                 schedule_replay=replay)
            r = Renderer(size, size, mc, tf, brick_sample_fn,
                         sample_ctx=ctx, settings=s)
            r.set_camera(cam)
            r.warmup()
            for _ in range(2):
                r.render()
            sync(r._frame)
            t0 = time.time()
            n = 8
            for _ in range(n):
                r.render()
            sync(r._frame)
            fps = n / (time.time() - t0)
            stats = dict(r._sched_cache)
            stats.pop("ops", None)
            stats.pop("ssh", None)
            stats.pop("key", None)
            r.reset_accumulation()
            r.render()
            f = np.asarray(r._frame)
            if not replay:
                base[size] = f
            drift = float(np.abs(f - base[size]).max())
            log(f"wavefront brick {size} replay={replay}: {fps:.2f} fps "
                f"{stats} max|Δ|={drift:.2e}")
            del r

    for replay in (False, True):
        s = PathTraceSettings(compact=True, schedule_replay=replay)
        r = PathTraceRenderer(512, 512, mc, tf, vol.data, settings=s)
        r.set_camera(cam)
        r.warmup()
        for _ in range(2):
            r.render()
        sync(r._frame)
        t0 = time.time()
        n = 8
        for _ in range(n):
            r.render()
        sync(r._frame)
        fps = n / (time.time() - t0)
        stats = dict(r._sched_cache)
        stats.pop("ops", None)
        stats.pop("key", None)
        log(f"pathtrace decoded 512 replay={replay}: {fps:.2f} fps {stats}")
        del r

    # neural PT (brick ctx)
    for replay in (False, True):
        s = PathTraceSettings(compact=True, schedule_replay=replay)
        r = PathTraceRenderer(512, 512, mc, tf, ctx,
                              sample_fn=brick_sample_fn, settings=s)
        r.set_camera(cam)
        r.warmup()
        for _ in range(2):
            r.render()
        sync(r._frame)
        t0 = time.time()
        n = 8
        for _ in range(n):
            r.render()
        sync(r._frame)
        fps = n / (time.time() - t0)
        log(f"pathtrace neural 512 replay={replay}: {fps:.2f} fps")
        del r


if __name__ == "__main__":
    main()
