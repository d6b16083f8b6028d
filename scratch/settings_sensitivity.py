import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo/tests")
from test_brickcache import _scene
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.raymarch import RaymarchSettings
from instantvnr_tpu.render.renderer import Renderer, make_neural_sample_fn, reference_sample_fn
from instantvnr_tpu.models.network import render_params
from instantvnr_tpu.models.metrics import decode_volume
from instantvnr_tpu.render.brickcache import build_brick_cache, brick_sample_fn

vol, tf, mc, field, state = _scene(dims=(64,64,64), train=200)
cam = Camera(eye=(0.15*64, 0.1*64, -2.0*64), center=(0,0,0), up=(0,1,0), fovy=45)

def one_frame(r):
    r._key = jax.random.PRNGKey(123)
    r.reset_accumulation()
    r.render()
    return np.asarray(r.mapframe())

def psnr(a, b):
    mse = float(np.mean((a-b)**2))
    return 10*np.log10(1/max(mse,1e-12))

S = 128
fr = {}
for name, fn, ctx, st in (
    ("exact_n4", make_neural_sample_fn(field), render_params(state.params, field),
     RaymarchSettings(n_iters=4, compact=True, fused_replay=False)),
    ("exact_n8s1", make_neural_sample_fn(field), render_params(state.params, field),
     RaymarchSettings(n_iters=8, max_skips=1, compact=True, fused_replay=False)),
    ("brick_n8s1", brick_sample_fn, build_brick_cache(field, state.params, mc, dilate=1),
     RaymarchSettings(n_iters=8, max_skips=1, compact=True, fused_replay=False)),
    ("hq3x_n8s1", brick_sample_fn, build_brick_cache(field, state.params, mc, dilate=1, supersample=3),
     RaymarchSettings(n_iters=8, max_skips=1, compact=True, fused_replay=False)),
    ("decoded_n8s1", reference_sample_fn,
     decode_volume(field, state.params, tuple(int(d) for d in mc.volume_dims)),
     RaymarchSettings(n_iters=8, max_skips=1, compact=True, fused_replay=False)),
):
    r = Renderer(S, S, mc, tf, fn, sample_ctx=ctx, settings=st)
    r.set_camera(cam)
    fr[name] = one_frame(r)
    del r

print("exact_n4  vs exact_n8s1:", f"{psnr(fr['exact_n4'], fr['exact_n8s1']):.1f} dB")
print("brick     vs exact_n8s1:", f"{psnr(fr['brick_n8s1'], fr['exact_n8s1']):.1f} dB")
print("hq3x      vs exact_n8s1:", f"{psnr(fr['hq3x_n8s1'], fr['exact_n8s1']):.1f} dB")
print("brick     vs decoded   :", f"{psnr(fr['brick_n8s1'], fr['decoded_n8s1']):.1f} dB")
print("decoded   vs exact_n8s1:", f"{psnr(fr['decoded_n8s1'], fr['exact_n8s1']):.1f} dB")
