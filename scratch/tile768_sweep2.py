"""768² round 2: f16 pool + K variations on top of T4 tiling."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
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
    ctx32 = build_brick_cache(field, state.params, mc, dilate=1)
    ctx16 = build_brick_cache(field, state.params, mc, dilate=1,
                              dtype=jnp.float16)
    _ = sync(ctx32["packed"]); _ = sync(ctx16["packed"].astype(jnp.float32))
    log("scene ready")

    frames = {}
    def run(name, size, settings, ctx, frames_n=6, keep=None):
        r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                     settings=settings)
        r.set_camera(cam)
        t0 = time.time(); r.warmup(); wu = time.time() - t0
        for _ in range(3): r.render()
        sync(r._frame)
        t0 = time.time()
        for _ in range(frames_n): r.render()
        sync(r._frame)
        fps = frames_n / (time.time() - t0)
        log(f"{name}: {fps:.3f} fps (warmup {wu:.0f}s)")
        if keep:
            r.reset_accumulation(); r.render()
            frames[keep] = np.asarray(r._frame).copy()
        del r
        return fps

    base = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
    t4 = dataclasses.replace(base, tiles=4)
    run("768 T4 f32 (ref)", 768, t4, ctx32, frames_n=5)
    run("768 T4 f16", 768, t4, ctx16, frames_n=5)
    run("768 T4 f16 K4", 768, dataclasses.replace(t4, n_iters=4), ctx16, frames_n=5)
    run("768 T4 f16 K12", 768, dataclasses.replace(t4, n_iters=12), ctx16, frames_n=5)
    run("768 T1 f16", 768, base, ctx16, frames_n=5)
    run("512 T1 f32 (ref)", 512, base, ctx32, keep="f32")
    run("512 T1 f16", 512, base, ctx16, keep="f16")
    mse = float(np.mean((frames["f32"] - frames["f16"]) ** 2))
    log(f"512 f16-vs-f32 frame PSNR: {10*np.log10(1.0/max(mse,1e-12)):.1f} dB")

if __name__ == "__main__":
    main()
