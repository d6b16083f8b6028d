"""End-to-end wavefront fps after round-3 optimizations (brick cache,
classify_controls, packed compaction, tail finisher). Also measures the
exact-neural wavefront at its best config and the brick-vs-exact quality.

Run: cd /root/repo && timeout 3000 python scratch/wavefront_final.py
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
    from instantvnr_tpu.models.network import render_params
    from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import Renderer, make_neural_sample_fn
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

    def run(name, size, sample_fn, c, settings, frames=6):
        r = Renderer(size, size, mc, tf, sample_fn, sample_ctx=c,
                     settings=settings)
        r.set_camera(cam)
        t0 = time.time()
        r.warmup()
        log(f"{name}: warmup {time.time()-t0:.1f}s")
        t0 = time.time()
        r.render(); sync(r._frame)
        log(f"{name}: first frame {time.time()-t0:.2f}s")
        t0 = time.time()
        for _ in range(frames):
            r.render()
        sync(r._frame)
        fps = frames / (time.time() - t0)
        log(f"{name}: {fps:.3f} fps")
        r.reset_accumulation()
        r.render()
        frame = np.asarray(r._frame)
        del r
        return fps, frame

    brick = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    _, fb = run("brick 512", 512, brick_sample_fn, ctx, brick)
    run("brick 768", 768, brick_sample_fn, ctx, brick)
    # gradient-shaded brick
    run("brick 512 gradient", 512, brick_sample_fn, ctx,
        dataclasses.replace(brick, shading="gradient"))

    exact4 = RaymarchSettings(n_iters=4, compact=True)
    _, fe = run("exact 512 (K=4/s=8)", 512, make_neural_sample_fn(field),
                render_params(state.params, field), exact4, frames=3)
    mse = float(np.mean((fb - fe) ** 2))
    log(f"brick-vs-exact frame PSNR: {10*np.log10(1.0/max(mse,1e-12)):.1f} dB")


if __name__ == "__main__":
    main()
