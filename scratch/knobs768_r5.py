"""768² knob re-sweep under the midpoint ladder (tiles × finisher).
Run: python scratch/knobs768_r5.py [A|B]  (split across runs to bound
per-process compile pileup)."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(x.ravel()[0])


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
    from instantvnr_tpu.render.compaction import (wait_fused_compiles,
                                                  _MIDPOINT_BUCKETS)

    log(f"midpoint buckets: {_MIDPOINT_BUCKETS}")
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
    ctx = build_brick_cache(field, state.params, mc, dilate=1,
                            dtype=jnp.float16, convention="exact")
    _ = sync(ctx["packed"][:1].astype(jnp.float32))
    log("scene ready")

    def run(name, settings, frames_n=8):
        r = Renderer(768, 768, mc, tf, brick_sample_fn, sample_ctx=ctx,
                     settings=settings)
        r.set_camera(cam)
        t0 = time.time(); r.warmup(); wu = time.time() - t0
        t0 = time.time()
        for _attempt in range(3):
            for _ in range(4): r.render()
            sync(r._frame)
            wait_fused_compiles()
            if r._sched_cache.get("fused_frames", 0):
                break
        fc = time.time() - t0
        if not r._sched_cache.get("fused_frames", 0):
            log(f"{name}: WARNING fused never engaged")
        for _ in range(r._fused_depth + 1): r.render()
        sync(r._frame)
        t0 = time.time()
        for _ in range(frames_n): r.render()
        sync(r._frame)
        fps = frames_n / (time.time() - t0)
        log(f"{name}: {fps:.3f} fps (wu {wu:.0f}s, fc {fc:.0f}s)")
        del r
        return fps

    base = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "A"
    if which == "A":
        run("T3 fin16k (cur)", dataclasses.replace(
            base, tiles=3, finish_bucket=16384))
        run("T2 fin16k", dataclasses.replace(
            base, tiles=2, finish_bucket=16384))
        run("T1 fin16k", dataclasses.replace(
            base, tiles=1, finish_bucket=16384))
    else:
        run("T3 fin32k", dataclasses.replace(
            base, tiles=3, finish_bucket=32768))
        run("T3 fin8k", dataclasses.replace(
            base, tiles=3, finish_bucket=8192))
        run("T4 fin16k", dataclasses.replace(
            base, tiles=4, finish_bucket=16384))


if __name__ == "__main__":
    main()
