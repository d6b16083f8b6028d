"""Final 768² squeeze: skips/tiles/finish variants on T4+f16."""
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
    from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
    from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
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
    ctx16 = build_brick_cache(field, state.params, mc, dilate=1,
                              dtype=jnp.float16)
    _ = sync(ctx16["packed"].astype(jnp.float32))
    log("scene ready")

    def run(name, size, settings, frames_n=6, finish=None):
        old = comp._FINISH_BUCKET
        if finish: comp._FINISH_BUCKET = finish
        try:
            r = Renderer(size, size, mc, tf, brick_sample_fn,
                         sample_ctx=ctx16, settings=settings)
            r.set_camera(cam)
            t0 = time.time(); r.warmup(); wu = time.time() - t0
            for _ in range(3): r.render()
            sync(r._frame)
            t0 = time.time()
            for _ in range(frames_n): r.render()
            sync(r._frame)
            log(f"{name}: {frames_n/(time.time()-t0):.3f} fps (wu {wu:.0f}s)")
            del r
        finally:
            comp._FINISH_BUCKET = old

    base = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    t4 = dataclasses.replace(base, tiles=4)
    run("768 T4 (ref)", 768, t4, frames_n=5)
    run("768 T4 s2", 768, dataclasses.replace(t4, max_skips=2), frames_n=5)
    run("768 T6", 768, dataclasses.replace(base, tiles=6), frames_n=5)
    run("768 T4 fin64k", 768, t4, frames_n=5, finish=65536)
    run("768 T3", 768, dataclasses.replace(base, tiles=3), frames_n=5)
    run("512 T1 s2", 512, dataclasses.replace(base, max_skips=2))
if __name__ == "__main__":
    main()
