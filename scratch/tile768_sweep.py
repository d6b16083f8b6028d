"""Round-4 768² wavefront sweep: frame tiling (RaymarchSettings.tiles) +
finish-bucket re-sweep at the reference's own bench resolution
(batch_renderer.cpp:199; VERDICT r3 next #1 — target ≥5 fps @768²).

Run: cd /root/repo && timeout 3000 python scratch/tile768_sweep.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(x.ravel()[0])


def main():
    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import (NeuralField, create_train_state,
                                       train_steps)
    from instantvnr_tpu.render.brickcache import (brick_sample_fn,
                                                  build_brick_cache)
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import Renderer
    from instantvnr_tpu.utils.tfn import bake_transfer_function
    import instantvnr_tpu.render.compaction as comp

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

    def run(name, size, settings, frames=8, finish=None):
        old = comp._FINISH_BUCKET
        if finish is not None:
            comp._FINISH_BUCKET = finish
        try:
            r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                         settings=settings)
            r.set_camera(cam)
            t0 = time.time()
            r.warmup()
            wu = time.time() - t0
            for _ in range(3):
                r.render()
            sync(r._frame)
            t0 = time.time()
            for _ in range(frames):
                r.render()
            sync(r._frame)
            fps = frames / (time.time() - t0)
            log(f"{name}: {fps:.3f} fps  (warmup {wu:.1f}s)")
            del r
            return fps
        finally:
            comp._FINISH_BUCKET = old

    base = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    run("768 T1 (current)", 768, base, frames=5)
    run("768 T2", 768, dataclasses.replace(base, tiles=2), frames=5)
    run("768 T4", 768, dataclasses.replace(base, tiles=4), frames=5)
    run("768 T8", 768, dataclasses.replace(base, tiles=8), frames=5)
    run("768 T4 fin64k", 768, dataclasses.replace(base, tiles=4), frames=5,
        finish=65536)
    run("768 T1 fin64k", 768, base, frames=5, finish=65536)
    run("512 T1 (current)", 512, base)
    run("512 T2", 512, dataclasses.replace(base, tiles=2))
    run("512 T4", 512, dataclasses.replace(base, tiles=4))


if __name__ == "__main__":
    main()
