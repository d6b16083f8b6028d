"""Phase split of one brick-wavefront superstep at the 768²/tiles=3 band
size (196608 rays) with the f16 pool — where does the next fps come from?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def bench(fn, *args, n=6):
    fn(*args)
    sync(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    sync(jax.tree_util.tree_leaves(r)[0])
    return (time.time() - t0) / n


def main():
    import dataclasses
    from functools import partial
    import importlib

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps

    rm = importlib.import_module("instantvnr_tpu.render.raymarch")
    from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
    from instantvnr_tpu.render.raymarch import RaymarchSettings, init_ray_state
    from instantvnr_tpu.utils.tfn import bake_transfer_function, classify

    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cfg = ModelConfig()
    cfg = dataclasses.replace(
        cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
    field = NeuralField.from_config(cfg)
    state = create_train_state(jax.random.PRNGKey(0), field)
    for _ in range(5):
        state = train_steps(field, vol.data, state, 10, 1 << 16)
    _ = float(state.loss)
    ctx = build_brick_cache(field, state.params, mc, dilate=1,
                            dtype=jnp.float16)
    _ = sync(ctx["packed"].astype(jnp.float32))
    log(f"pool: {ctx['packed'].shape} {ctx['packed'].dtype} "
        f"{ctx['packed'].nbytes/1e6:.0f} MB")

    settings = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    k = settings.n_iters
    for m in (196608, 65536):
        key = jax.random.PRNGKey(1)
        org = jax.random.uniform(key, (m, 3), minval=0.0, maxval=128.0)
        dirn = jax.random.normal(jax.random.PRNGKey(2), (m, 3))
        dirn = dirn / jnp.linalg.norm(dirn, axis=-1, keepdims=True)
        t_far = jnp.full((m,), 200.0)
        jitter = jax.random.uniform(jax.random.PRNGKey(3), (m,))
        st = init_ray_state(jnp.zeros((m,)), t_far)

        @jax.jit
        def emit_only(st):
            _carry, tx, ty, valid, aslots, acells = rm._emit_samples(
                org, dirn, t_far, st, mc, 1.0, k, settings.max_skips)
            return tx.sum() + ty.sum()

        pos = jax.random.uniform(jax.random.PRNGKey(4), (m * k, 3))

        @jax.jit
        def sample_only(pos):
            return brick_sample_fn(ctx, pos).sum()

        vals = jax.random.uniform(jax.random.PRNGKey(5), (m, k))

        @jax.jit
        def classify_only(v):
            rgb, a = classify(tf, v)
            return rgb.sum() + a.sum()

        @jax.jit
        def full_step(st):
            s2 = rm._superstep(partial(brick_sample_fn, ctx), org, dirn,
                               t_far, jitter, mc, tf, settings,
                               jnp.asarray(settings.light_dir), st)
            return s2.color.sum()

        e = bench(emit_only, st) * 1e3
        s = bench(sample_only, pos) * 1e3
        c = bench(classify_only, vals) * 1e3
        f = bench(full_step, st) * 1e3
        log(f"m={m}: emit {e:.1f}  sample {s:.1f}  classify {c:.1f}  "
            f"full {f:.1f} ms  (sum-parts {e+s+c:.1f})")


if __name__ == "__main__":
    main()
