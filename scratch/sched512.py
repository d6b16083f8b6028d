"""What does a replayed 512² brick-wavefront frame actually dispatch?
Prints the recorded ops schedule + serialized per-dispatch wall times."""
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

s = RaymarchSettings(n_iters=8, max_skips=1, compact=True)
r = Renderer(512, 512, mc, tf, brick_sample_fn, sample_ctx=ctx, settings=s)
r.set_camera(cam)
r.warmup()
for i in range(4):
    t0 = time.time()
    r.render()
    r.mapframe()
    log(f"frame {i}: {(time.time()-t0)*1e3:.1f} ms")
sc = r._schedule_cache if hasattr(r, "_schedule_cache") else None
if sc is None:
    for name in dir(r):
        if "sched" in name.lower():
            sc = getattr(r, name); break
ops = sc.get("ops") if isinstance(sc, dict) else None
log("schedule:", ops)
log("stats:", {k: v for k, v in (sc or {}).items()
               if k in ("replays", "serialized", "invalidated")})

# serialized per-dispatch timing: fresh renderer without replay
s2 = dataclasses.replace(s, schedule_replay=False, deferred_validation=False)
r2 = Renderer(512, 512, mc, tf, brick_sample_fn, sample_ctx=ctx, settings=s2)
r2.set_camera(cam)
r2.warmup()
import instantvnr_tpu.render.compaction as comp
orig_super = comp._superstep_prefix
orig_finish = comp._finish_prefix
orig_compact = comp._compact_prefix
rows = []
def wrap(name, f):
    def g(*a, **k):
        t0 = time.time()
        out = f(*a, **k)
        if name != "C":
            # force completion of this dispatch for honest per-step time
            cnt = out[1]
            _ = int(cnt)
        rows.append((name, a[2] if name != "C" else a[0],
                     (time.time() - t0) * 1e3))
        return out
    return g
comp._superstep_prefix = wrap("S", orig_super)
comp._finish_prefix = wrap("F", orig_finish)
comp._compact_prefix = wrap("C", orig_compact)
try:
    r2.render(); r2.mapframe()
finally:
    comp._superstep_prefix = orig_super
    comp._finish_prefix = orig_finish
    comp._compact_prefix = orig_compact
tot = sum(t for _, _, t in rows)
log(f"serialized frame: {len(rows)} dispatches, {tot:.1f} ms synced total")
for n, m, t in rows:
    log(f"  {n} m={m:7d} {t:7.1f} ms")
