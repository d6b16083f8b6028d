import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
from test_brickcache import _scene
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.raymarch import RaymarchSettings
from instantvnr_tpu.render.renderer import Renderer
from instantvnr_tpu.render.brickcache import build_brick_cache, brick_sample_fn

vol, tf, mc, field, state = _scene(dims=(64,64,64), train=200)
ctx = build_brick_cache(field, state.params, mc, dilate=1)
r = Renderer(128, 128, mc, tf, brick_sample_fn, sample_ctx=ctx,
             settings=RaymarchSettings(n_iters=8, max_skips=1, compact=True))
r.set_camera(Camera(eye=(0.15*64, 0.1*64, -2.0*64), center=(0,0,0), up=(0,1,0), fovy=45))
fs = []
for _ in range(2):
    r.reset_accumulation()
    r.render()
    fs.append(np.asarray(r.mapframe()))
mse = float(np.mean((fs[0]-fs[1])**2))
print(f"same renderer, two jitter draws: {10*np.log10(1/max(mse,1e-12)):.1f} dB")
# matched keys: fresh renderer same seed -> first frames identical?
r2 = Renderer(128, 128, mc, tf, brick_sample_fn, sample_ctx=ctx,
              settings=RaymarchSettings(n_iters=8, max_skips=1, compact=True))
r2.set_camera(r.camera)
r._key = jax.random.PRNGKey(123); r.reset_accumulation(); r.render()
a = np.asarray(r.mapframe())
r2._key = jax.random.PRNGKey(123); r2.reset_accumulation(); r2.render()
b = np.asarray(r2.mapframe())
mse = float(np.mean((a-b)**2))
print(f"matched keys across renderers: {10*np.log10(1/max(mse,1e-12)):.1f} dB")
