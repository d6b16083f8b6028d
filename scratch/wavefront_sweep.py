"""Sweep wavefront emit parameters with cheap (brick-cache) sampling.

Round-3 finding: GT-trilinear wavefront = 0.99 fps @512² vs neural 0.79 —
the EMIT phase (max_skips occupancy probes per slot per superstep: 8×4=32
gathers/ray/superstep at the round-2 defaults) dominates, not the neural
sample. Cost model per emitted sample ≈ (max_skips probe gathers + sample
gathers) × 13 ns. Sweep K (n_iters) × max_skips with the brick cache
(2 gathers/sample) and GT (8/sample) to find the fast config.

Run: cd /root/repo && timeout 3600 python scratch/wavefront_sweep.py
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
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import Renderer, reference_sample_fn
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    size = 512
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
    log("scene + cache ready")

    def run(name, sample_fn, c, k, skips, compact=True, frames=3):
        r = Renderer(size, size, mc, tf, sample_fn, sample_ctx=c,
                     settings=RaymarchSettings(n_iters=k, max_skips=skips,
                                               compact=compact))
        r.set_camera(cam)
        t0 = time.time()
        r.warmup()
        warm = time.time() - t0
        r.render(); sync(r._frame)
        t0 = time.time()
        for _ in range(frames):
            r.render()
        sync(r._frame)
        fps = frames / (time.time() - t0)
        log(f"{name:32s} K={k:2d} skips={skips} compact={int(compact)}: "
            f"{fps:6.3f} fps  (warmup {warm:.0f}s)")
        del r
        return fps

    # brick-cache sweep
    for k, skips in [(4, 8), (4, 2), (4, 1), (8, 1), (16, 1), (16, 2),
                     (32, 1)]:
        run("brick wavefront", brick_sample_fn, ctx, k, skips)

    # best-guess config without compaction (single jit while_loop)
    run("brick wavefront", brick_sample_fn, ctx, 16, 1, compact=False)

    # GT at the winning shape for comparison
    run("GT wavefront", reference_sample_fn, vol.data, 16, 1)


if __name__ == "__main__":
    main()
