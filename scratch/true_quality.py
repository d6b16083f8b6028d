"""Matched-jitter brick/hq vs exact frame PSNR @512^2 (true field quality)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
from instantvnr_tpu.models.network import render_params
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.raymarch import RaymarchSettings
from instantvnr_tpu.render.renderer import Renderer, make_neural_sample_fn
from instantvnr_tpu.render.brickcache import build_brick_cache, brick_sample_fn
from instantvnr_tpu.utils.tfn import bake_transfer_function
from instantvnr_tpu.utils.profiling import sync as _sync

size = 512
dims = (128, 128, 128)
vol = synthetic_volume(dims, kind="vorts")
cfg = ModelConfig()
cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
field = NeuralField.from_config(cfg)
tf = bake_transfer_function(TransferFunctionConfig())
mc = mcmod.build(vol.data, vol.dims, tf)
cam = Camera(eye=(0.15*dims[0], 0.1*dims[1], -2.0*dims[2]), center=(0,0,0), up=(0,1,0), fovy=45)
state = create_train_state(jax.random.PRNGKey(0), field)
for _ in range(10):
    state = train_steps(field, vol.data, state, 10, 1 << 16)
_ = float(state.loss)
print("trained", flush=True)

def one_frame(r):
    r._key = jax.random.PRNGKey(123)
    r.reset_accumulation()
    r.render()
    return np.asarray(r.mapframe())

frames = {}
rw = Renderer(size, size, mc, tf, make_neural_sample_fn(field),
              sample_ctx=render_params(state.params, field),
              settings=RaymarchSettings(n_iters=4, compact=True, fused_replay=False))
rw.set_camera(cam)
rw.warmup()
frames["exact"] = one_frame(rw)
print("exact frame done", flush=True)
del rw
for name, kw in (("f16", dict(dtype=jnp.float16)),
                 ("ex1x", dict(dtype=jnp.float16, convention="exact")),
                 ("ex2x", dict(dtype=jnp.float16, supersample=2, convention="exact")),
                 ("ex3x", dict(dtype=jnp.float16, supersample=3, convention="exact"))):
    try:
        ctx = build_brick_cache(field, state.params, mc, dilate=1, **kw)
        _sync(ctx["packed"][0].astype(jnp.float32))
        r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                     settings=RaymarchSettings(n_iters=8, max_skips=1, compact=True,
                                               fused_replay=False))
        r.set_camera(cam)
        r.warmup()
        frames[name] = one_frame(r)
        mse = float(np.mean((frames[name] - frames["exact"])**2))
        print(f"{name}-vs-exact: {10*np.log10(1/max(mse,1e-12)):.1f} dB "
              f"({ctx['packed'].nbytes/1e6:.0f} MB)", flush=True)
        del r, ctx
    except Exception as e:
        print(f"{name} failed: {e!r}", flush=True)
