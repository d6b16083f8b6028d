"""fps + quality ceiling check for halved sampling: brick wavefront at
sampling_rate 1.0 vs 0.5 (512 and 768), PSNR of each vs a rate-4 GT-grid
frame — the upper bound of what preintegrated classification could win."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps
from instantvnr_tpu.render.brickcache import brick_sample_fn, build_brick_cache
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.raymarch import RaymarchSettings
from instantvnr_tpu.render.renderer import Renderer
from instantvnr_tpu.utils.tfn import bake_transfer_function


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
ctx = build_brick_cache(field, state.params, mc, dilate=1, dtype=jnp.float16)
_ = float(ctx["packed"].astype(jnp.float32).ravel()[0])
log("scene ready")


def frame_and_fps(size, rate, n=5, tiles=1, fb=None):
    s = RaymarchSettings(n_iters=8, max_skips=1, compact=True,
                         sampling_rate=rate, tiles=tiles, finish_bucket=fb)
    r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                 settings=s)
    r.set_camera(cam)
    r.warmup()
    r.render(); fr = np.asarray(r.mapframe())
    t0 = time.time()
    for _ in range(n):
        r.render()
    r.mapframe()
    return fr, n / (time.time() - t0)


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


gt512, _ = frame_and_fps(512, 4.0, n=1)
for rate in (1.0, 0.5):
    fr, fps = frame_and_fps(512, rate)
    log(f"512 rate={rate}: {fps:.2f} fps, PSNR vs rate-4 {psnr(fr, gt512):.1f} dB")
for rate in (1.0, 0.5):
    fr, fps = frame_and_fps(768, rate, tiles=3, fb=65536)
    log(f"768 rate={rate}: {fps:.2f} fps")
