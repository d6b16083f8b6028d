"""Measure the compacted wavefront's machinery ceiling on the real TPU.

Question (round 3): the neural wavefront runs 0.82 fps @512² and is
sample-phase-bound (~64 table rows/sample). If samples were nearly free,
how fast would the SAME compacted wavefront go? Drive it with the GT
trilinear sample_fn (8 gathers/sample) — an upper bound for any
cache-based sample_fn (brick cache = 2 gathers/sample).

Run: cd /root/repo && timeout 3000 python scratch/wavefront_ceiling.py
"""
import os
import sys
import time

# scripts live in scratch/ → sys.path[0] is scratch/, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    from instantvnr_tpu.models.network import render_params
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import (
        Renderer, make_neural_sample_fn, reference_sample_fn)
    from instantvnr_tpu.utils.tfn import bake_transfer_function
    import dataclasses

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
    t0 = time.time()
    for _ in range(15):
        state = train_steps(field, vol.data, state, 10, 1 << 16)
    _ = float(state.loss)
    log(f"train 150 steps: {time.time()-t0:.1f}s")

    def run(name, sample_fn, ctx, frames=4):
        r = Renderer(size, size, mc, tf, sample_fn, sample_ctx=ctx,
                     settings=RaymarchSettings(n_iters=4, compact=True))
        r.set_camera(cam)
        t0 = time.time()
        nb = r.warmup()
        log(f"{name}: warmup {nb} buckets {time.time()-t0:.1f}s")
        t0 = time.time()
        r.render(); sync(r._frame)
        log(f"{name}: first frame {time.time()-t0:.2f}s")
        t0 = time.time()
        for _ in range(frames):
            r.render()
        sync(r._frame)
        fps = frames / (time.time() - t0)
        log(f"{name}: {fps:.3f} fps @{size}")
        r.reset_accumulation()
        r.render()
        frame = np.asarray(r._frame)
        del r
        return fps, frame

    import numpy as np

    # A: GT-trilinear wavefront (the machinery ceiling)
    run("GT-trilinear wavefront", reference_sample_fn, vol.data)

    # B: neural wavefront (the current 0.82 fps config)
    _, f_exact = run("neural wavefront", make_neural_sample_fn(field),
                     render_params(state.params, field))

    # C: brick-cache wavefront (round-3 candidate)
    from instantvnr_tpu.render.brickcache import (
        brick_sample_fn, build_brick_cache, occupied_cells)

    t0 = time.time()
    ctx = build_brick_cache(field, state.params, mc, dilate=1)
    _ = sync(ctx["packed"])
    n_occ = int(occupied_cells(mc, dilate=1).size)
    log(f"brick cache: {n_occ} bricks, built in {time.time()-t0:.2f}s "
        f"({ctx['packed'].nbytes/1e6:.0f} MB packed)")
    t0 = time.time()
    ctx = build_brick_cache(field, state.params, mc, dilate=1)
    _ = sync(ctx["packed"])
    log(f"brick cache rebuild (warm): {time.time()-t0:.2f}s")

    _, f_brick = run("brick-cache wavefront", brick_sample_fn, ctx)

    # quality: PSNR of the brick frame vs the exact neural frame
    mse = float(np.mean((f_brick - f_exact) ** 2))
    log(f"brick-vs-exact frame PSNR: {10*np.log10(1.0/max(mse,1e-12)):.1f} dB")


if __name__ == "__main__":
    main()
