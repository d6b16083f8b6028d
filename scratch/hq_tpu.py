"""hq (2x) pool fps + PSNR vs 1x at 512^2 on the real chip."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.raymarch import RaymarchSettings
from instantvnr_tpu.render.renderer import Renderer
from instantvnr_tpu.render.brickcache import build_brick_cache, brick_sample_fn
from instantvnr_tpu.utils.tfn import bake_transfer_function
from instantvnr_tpu.utils.profiling import sync as _sync
from instantvnr_tpu.render.compaction import wait_fused_compiles
import dataclasses

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

frames = {}
for name, ss in (("1x", 1), ("hq2x", 2)):
    t0 = time.time()
    ctx = build_brick_cache(field, state.params, mc, dilate=1,
                            dtype=jnp.float16, supersample=ss)
    _sync(ctx["packed"][0].astype(jnp.float32))
    print(f"{name} build {time.time()-t0:.1f}s  {ctx['packed'].nbytes/1e6:.0f} MB", flush=True)
    r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                 settings=RaymarchSettings(n_iters=8, max_skips=1, compact=True))
    r.set_camera(cam)
    r.warmup()
    t0 = time.time()
    for att in range(3):
        for _ in range(4):
            r.render()
        _sync(r._frame)
        wait_fused_compiles()
        if r._sched_cache.get("fused_frames", 0):
            break
    print(f"{name} fused warm {time.time()-t0:.1f}s", flush=True)
    for _ in range(4):
        r.render()
    _sync(r._frame)
    t0 = time.time()
    n = 10
    for _ in range(n):
        r.render()
    _sync(r._frame)
    print(f"{name}: {n/(time.time()-t0):.2f} fps (fused={r._sched_cache.get('fused_frames',0)})", flush=True)
    r.reset_accumulation()
    r.render()
    frames[name] = np.asarray(r.mapframe())
    del r, ctx

d = frames["1x"] - frames["hq2x"]
mse = float(np.mean(d*d))
print(f"1x-vs-hq frame PSNR {10*np.log10(1.0/max(mse,1e-12)):.1f} dB")
