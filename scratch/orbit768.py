"""768² MOTION path (ADVICE r4 api.py:788): an orbiting camera forces
schedule re-records/serialized frames — does the 16k tail finisher (tuned
in fused steady-state) hurt there vs the old 64k one-shot?
Run: python scratch/orbit768.py [16384|65536]"""
import dataclasses, math, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(x.ravel()[0])


def main():
    fin = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
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
    from instantvnr_tpu.render.compaction import wait_fused_compiles

    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
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
    _ = sync(ctx["packed"].astype(jnp.float32))
    log("scene ready")

    def orbit_cam(i, n=64):
        a = 2 * math.pi * i / n
        rr = 2.2 * dims[0]
        return Camera(eye=(rr * math.sin(a), 0.15 * dims[1],
                           -rr * math.cos(a)),
                      center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    settings = RaymarchSettings(n_iters=8, max_skips=1, compact=True,
                                tiles=3, finish_bucket=fin)
    r = Renderer(768, 768, mc, tf, brick_sample_fn, sample_ctx=ctx,
                 settings=settings)
    r.set_camera(orbit_cam(0))
    t0 = time.time(); r.warmup(); log(f"warmup {time.time()-t0:.0f}s")
    # warm lap: schedules record per camera; fused may engage if bucket
    # sequences repeat
    for i in range(12):
        r.set_camera(orbit_cam(i))
        r.render()
    sync(r._frame)
    wait_fused_compiles()
    for i in range(12, 16):
        r.set_camera(orbit_cam(i))
        r.render()
    sync(r._frame)
    t0 = time.time()
    for i in range(16, 32):
        r.set_camera(orbit_cam(i))
        r.render()
    sync(r._frame)
    fps = 16 / (time.time() - t0)
    log(f"768 orbit fin={fin}: {fps:.3f} fps (fused "
        f"{r._sched_cache.get('fused_frames', 0)}, serialized "
        f"{r._sched_cache.get('serialized', 0)}, replays "
        f"{r._sched_cache.get('replays', 0)}, invalidated "
        f"{r._sched_cache.get('invalidated', 0)})")


if __name__ == "__main__":
    main()
