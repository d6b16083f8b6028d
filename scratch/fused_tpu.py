"""Integrated fused-schedule path on real TPU: 512² + 768² brick wavefront."""
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
from instantvnr_tpu.render.compaction import wait_fused_compiles
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

for size, tiles, fb in ((512, 1, None), (768, 3, 65536)):
    s = RaymarchSettings(n_iters=8, max_skips=1, compact=True, tiles=tiles,
                         finish_bucket=fb)
    r = Renderer(size, size, mc, tf, brick_sample_fn, sample_ctx=ctx,
                 settings=s)
    r.set_camera(cam)
    r.warmup()
    for _ in range(4):
        r.render()
    r.mapframe()
    t0 = time.time()
    ok = wait_fused_compiles()
    log(f"{size}: fused compile wait {time.time()-t0:.1f}s ok={ok}")
    r.render(); r.mapframe()  # first fused frame
    t0 = time.time()
    n = 8
    for _ in range(n):
        r.render()
    r.mapframe()
    fps = n / (time.time() - t0)
    sc = r._sched_cache
    stats = {k: sc.get(k, 0) for k in ("replays", "fused_frames",
                                       "serialized", "invalidated")}
    if tiles > 1:
        stats["tile0"] = {k: sc.get("tile0", {}).get(k, 0)
                          for k in ("replays", "fused_frames")}
    log(f"{size}x{size} (tiles={tiles}): {fps:.2f} fps  {stats}")
