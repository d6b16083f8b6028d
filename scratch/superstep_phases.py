"""Phase-level breakdown of one wavefront superstep (brick sampling).

Where do the remaining ~480 ms/frame go at the best sweep config
(K=8, max_skips=1, compact)? Times each phase as its own jit at fixed
bucket sizes, plus an instrumented compacted frame (superstep count,
bucket trajectory, per-superstep wall time).

Run: cd /root/repo && timeout 3000 python scratch/superstep_phases.py
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


def bench(fn, *args, n=6):
    fn(*args)  # compile
    r = fn(*args)
    sync(r if isinstance(r, jnp.ndarray) else jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(r if isinstance(r, jnp.ndarray) else jax.tree_util.tree_leaves(r)[0])
    return (time.time() - t0) / n


def main():
    import dataclasses
    from functools import partial

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    import importlib

    rm = importlib.import_module("instantvnr_tpu.render.raymarch")
    from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings, init_ray_state
    from instantvnr_tpu.render.renderer import Renderer, _frame_rays
    from instantvnr_tpu.utils.tfn import bake_transfer_function, classify
    from instantvnr_tpu.utils.tfn import classify_controls

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
    for _ in range(5):
        state = train_steps(field, vol.data, state, 10, 1 << 16)
    _ = float(state.loss)
    ctx = build_brick_cache(field, state.params, mc, dilate=1)
    _ = sync(ctx["packed"])
    log("scene ready")

    settings = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    k = settings.n_iters
    m = 256 * 1024
    key = jax.random.PRNGKey(1)
    org = jax.random.uniform(key, (m, 3), minval=0.0, maxval=128.0)
    dirn = jax.random.normal(jax.random.PRNGKey(2), (m, 3))
    dirn = dirn / jnp.linalg.norm(dirn, axis=-1, keepdims=True)
    t_far = jnp.full((m,), 200.0)
    jitter = jax.random.uniform(jax.random.PRNGKey(3), (m,))
    st = init_ray_state(jnp.zeros((m,)), t_far)

    # A: emit only
    @jax.jit
    def emit_only(st):
        (t, tce, ss), tx, ty, valid = rm._emit_samples(
            org, dirn, t_far, st, mc, 1.0, k, settings.max_skips)
        return tx.sum() + ty.sum()

    log(f"emit only ({k} slots x {settings.max_skips} skips): "
        f"{bench(emit_only, st)*1e3:.1f} ms @m={m}")

    # B: brick sampling only (m*k coherent-ish positions)
    pos = jax.random.uniform(jax.random.PRNGKey(4), (m * k, 3))

    @jax.jit
    def sample_only(pos):
        return brick_sample_fn(ctx, pos).sum()

    log(f"brick sample only ({m*k} pts): {bench(sample_only, pos)*1e3:.1f} ms")

    # C: classify only
    vals = jax.random.uniform(jax.random.PRNGKey(5), (m, k))

    @jax.jit
    def classify_only(v):
        rgb, a = classify(tf, v)
        return rgb.sum() + a.sum()

    log(f"classify (LUT) ({m*k} pts): {bench(classify_only, vals)*1e3:.1f} ms")

    @jax.jit
    def classify_ctrl_only(v):
        rgb, a = classify_controls(tf, v)
        return rgb.sum() + a.sum()

    log(f"classify (controls) ({m*k} pts): "
        f"{bench(classify_ctrl_only, vals)*1e3:.1f} ms")

    # D: full superstep
    @jax.jit
    def full_step(st):
        s2 = rm._superstep(partial(brick_sample_fn, ctx), org, dirn, t_far,
                           jitter, mc, tf, settings,
                           jnp.asarray(settings.light_dir), st)
        return s2.color.sum()

    log(f"full superstep: {bench(full_step, st)*1e3:.1f} ms @m={m}")

    # E: instrumented compacted frame (bucket trajectory)
    from instantvnr_tpu.render.compaction import (
        _bucket, _compact_prefix, _superstep_prefix, warmup_programs)
    from instantvnr_tpu.render.renderer import make_neural_sample_fn
    from instantvnr_tpu.render.transform import default_transform

    r = size * size
    warmup_programs(brick_sample_fn, settings, mc, tf, r, sample_ctx=ctx)
    xform = default_transform(jnp.array(dims, jnp.float32))
    cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
                  jnp.asarray(cam.center, jnp.float32),
                  jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
    org_f, dirn_f, t0_f, t1_f, light, lo, hi = _frame_rays(
        size, size, cam_arrays, jnp.array(dims, jnp.float32),
        jnp.asarray(settings.light_dir, jnp.float32), xform)
    jit_f = jax.random.uniform(jax.random.PRNGKey(9), (r,))

    # time one compaction at full size
    rays0 = tuple(x + 0.0 for x in (org_f, dirn_f, t1_f, jit_f))
    st0 = init_ray_state(t0_f + 0.0, rays0[2])
    st0, _ = _superstep_prefix(brick_sample_fn, settings, r, mc, tf, light,
                               rays0, st0, ctx, None)
    t0 = time.time()
    rays0, st0, p0 = _compact_prefix(r, rays0, st0,
                                     jnp.arange(r, dtype=jnp.int32))
    sync(st0.t)
    log(f"compact @m={r}: {(time.time()-t0)*1e3:.1f} ms (incl 1 dispatch)")

    for trial in range(2):
        rays = tuple(x + 0.0 for x in (org_f, dirn_f, t1_f, jit_f))
        state_f = init_ray_state(t0_f + 0.0, rays[2])
        perm = jnp.arange(r, dtype=jnp.int32)
        mloc = r
        count = int(jnp.sum(state_f.active.astype(jnp.int32)))
        steps = 0
        t_frame = time.time()
        traj = []
        while count > 0 and steps < settings.max_supersteps:
            if _bucket(count, r) < mloc:
                rays, state_f, perm = _compact_prefix(mloc, rays, state_f, perm)
                mloc = _bucket(count, r)
            t0 = time.time()
            state_f, n_live = _superstep_prefix(
                brick_sample_fn, settings, mloc, mc, tf, light, rays,
                state_f, ctx, None)
            count = int(n_live)
            steps += 1
            traj.append((mloc, count, (time.time() - t0) * 1e3))
        if trial == 1:
            log(f"frame: {steps} supersteps, {time.time()-t_frame:.3f}s")
            for i, (mm, cc, dt) in enumerate(traj):
                log(f"  step {i:3d}: bucket {mm:7d} live {cc:7d} {dt:7.1f} ms")


if __name__ == "__main__":
    main()
