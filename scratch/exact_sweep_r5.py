"""Exact-semantics neural wavefront re-base (VERDICT r4 #3): n_iters /
finisher sweep under the midpoint ladder, tcnn + paired schemas @512².
Run: python scratch/exact_sweep_r5.py"""
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
    from instantvnr_tpu.models.network import render_params
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.raymarch import RaymarchSettings
    from instantvnr_tpu.render.renderer import (Renderer,
                                                make_neural_sample_fn)
    from instantvnr_tpu.utils.tfn import bake_transfer_function
    from instantvnr_tpu.render.compaction import _MIDPOINT_BUCKETS

    log(f"midpoint buckets: {_MIDPOINT_BUCKETS}")
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    fields = {}
    for variant in ("tcnn", "paired"):
        cfg = ModelConfig()
        cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
            cfg.encoding, log2_hashmap_size=14, hash_variant=variant))
        field = NeuralField.from_config(cfg)
        st = create_train_state(jax.random.PRNGKey(0), field)
        for _ in range(5):
            st = train_steps(field, vol.data, st, 10, 1 << 16)
        _ = float(st.loss)
        fields[variant] = (field, render_params(st.params, field))
    log("scene ready")

    def run(name, variant, settings, frames_n=3):
        field, ctx = fields[variant]
        r = Renderer(512, 512, mc, tf, make_neural_sample_fn(field),
                     sample_ctx=ctx, settings=settings)
        r.set_camera(cam)
        t0 = time.time(); r.warmup(); wu = time.time() - t0
        r.render(); sync(r._frame)
        t0 = time.time()
        for _ in range(frames_n):
            r.render()
        sync(r._frame)
        fps = frames_n / (time.time() - t0)
        log(f"{name}: {fps:.3f} fps (wu {wu:.0f}s)")
        del r
        return fps

    base = RaymarchSettings(compact=True, fused_replay=False)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tcnn"):
        run("tcnn n4 (bench cur)", "tcnn",
            dataclasses.replace(base, n_iters=4))
        run("tcnn n8", "tcnn", dataclasses.replace(base, n_iters=8))
        run("tcnn n8 fin8k", "tcnn",
            dataclasses.replace(base, n_iters=8, finish_bucket=8192))
    if which in ("all", "paired"):
        run("paired n4 (bench cur)", "paired",
            dataclasses.replace(base, n_iters=4))
        run("paired n8", "paired", dataclasses.replace(base, n_iters=8))
    if which in ("all", "fused"):
        # fused whole-frame for the exact path (the ~1 s of compute still
        # spends ~7 dispatches; fusing frees ~10-20 ms — marginal, measure)
        from instantvnr_tpu.render.compaction import wait_fused_compiles

        field, ctx = fields["tcnn"]
        r = Renderer(512, 512, mc, tf, make_neural_sample_fn(field),
                     sample_ctx=ctx,
                     settings=dataclasses.replace(base, n_iters=8,
                                                  fused_replay=True))
        r.set_camera(cam)
        r.warmup()
        for _a in range(3):
            for _ in range(3):
                r.render()
            sync(r._frame)
            wait_fused_compiles()
            if r._sched_cache.get("fused_frames", 0):
                break
        t0 = time.time()
        for _ in range(3):
            r.render()
        sync(r._frame)
        log(f"tcnn n8 FUSED: {3 / (time.time() - t0):.3f} fps (fused "
            f"{r._sched_cache.get('fused_frames', 0)})")


if __name__ == "__main__":
    main()
