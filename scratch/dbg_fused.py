"""Debug: eager _fused_body vs per-dispatch replay on the CPU test scene."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from functools import partial

import instantvnr_tpu.render.compaction as comp
comp._MIN_BUCKET = 256
comp._FINISH_BUCKET = 512

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import Camera, RaymarchSettings, Renderer, reference_sample_fn
from instantvnr_tpu.utils.tfn import bake_transfer_function

vol = synthetic_volume((32, 32, 32), kind="sphere")
tf = bake_transfer_function(TransferFunctionConfig())
mc = mcmod.build(vol.data, vol.dims, tf)
cam = Camera.default_for_dims(vol.dims)

r = Renderer(48, 48, mc, tf, reference_sample_fn, sample_ctx=vol.data,
             settings=RaymarchSettings(compact=True, fused_replay=False),
             seed=5)
r.set_camera(cam)
for _ in range(3):
    r.render()
r._settle()
ops = tuple(r._sched_cache["ops"])
print("ops:", ops)

# frame 4 the per-dispatch way, capturing the rgba
import instantvnr_tpu.render.renderer as rmod
key = r._key
_, sub = jax.random.split(key)
cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
              jnp.asarray(cam.center, jnp.float32),
              jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
rgba_ref = r._compacted_rgba(cam_arrays, sub, dict(r._sched_cache), False)
rgba_ref = np.asarray(rgba_ref)

# same frame via eager _fused_body
from instantvnr_tpu.render.renderer import _frame_rays
from instantvnr_tpu.render.raymarch import init_ray_state
from instantvnr_tpu.render.transform import clip_bounds

dims = jnp.array(mc.volume_dims, jnp.float32)
org, dirn, t0, t1, light, lo, hi = _frame_rays(
    48, 48, cam_arrays, dims,
    jnp.asarray(r.settings.light_dir, jnp.float32), r.transform)
jitter = jax.random.uniform(sub, (org.shape[0],), jnp.float32)
rays = tuple(x + 0.0 for x in (org, dirn, t1, jitter))
state = init_ray_state(t0 + 0.0, rays[2])
perm = jnp.arange(org.shape[0], dtype=jnp.int32)
from instantvnr_tpu.utils.math import normalize
light_n = normalize(jnp.asarray(r.settings.light_dir, jnp.float32))
view = normalize(cam_arrays[1] - cam_arrays[0])
light_n = jnp.where(jnp.dot(view, light_n) > 0, -light_n, light_n)

rays, state, perm, counts = comp._fused_body(
    reference_sample_fn, r.settings, ops, r.settings.max_supersteps, 1,
    mc, tf, light_n, rays, state, perm, vol.data, r.transform.scale, None)
print("counts:", np.asarray(counts))
color, alpha, bw, bp, bc = comp._unpermute(
    perm, state.color, state.alpha, state.best_w, state.best_pos,
    state.best_rgb)
rgba_fused = np.asarray(jnp.concatenate([color, alpha[:, None]], axis=-1))
diff = np.abs(rgba_fused - rgba_ref)
print("mismatch:", (diff > 0).sum(), "max", diff.max())
bad = np.argwhere(diff.max(-1) > 0).ravel()
print("first bad pixels:", bad[:10])
if len(bad):
    i = bad[0]
    print("ref:", rgba_ref[i], "fused:", rgba_fused[i])
