import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo/tests")
from test_brickcache import _scene
from instantvnr_tpu.render.brickcache import (build_brick_cache,
    brick_sample_fn, occupied_cells)
from instantvnr_tpu.models.network import network_apply, render_params
from instantvnr_tpu.render.renderer import make_neural_sample_fn

vol, tf, mc, field, state = _scene(dims=(64,64,64), train=200)
dims = tuple(int(d) for d in mc.volume_dims)
occ = occupied_cells(mc, dilate=0)
rng = np.random.default_rng(11)
mx, my, _ = (int(d) for d in mc.dims)
pick = occ[rng.integers(0, occ.size, 4096)]
cx, cy, cz = pick % mx, (pick // mx) % my, pick // (mx * my)
base = np.stack([cx, cy, cz], -1).astype(np.float32) * 16.0
pos_v = base + rng.random((4096, 3), np.float32) * 16.0
p = jnp.asarray(pos_v) / jnp.asarray([float(d) for d in dims])

exact_fn = make_neural_sample_fn(field)
want = np.asarray(exact_fn(render_params(state.params, field), p))
for ss in (1, 3):
    ctx = build_brick_cache(field, state.params, mc, dilate=1, supersample=ss)
    got = np.asarray(brick_sample_fn(ctx, p))
    mse = np.mean((got - want)**2)
    print(f"ss={ss} point PSNR vs exact-fn: {10*np.log10(1/max(mse,1e-30)):.1f} dB")
# where is the residual at ss=3? top-8 worst points
ctx = build_brick_cache(field, state.params, mc, dilate=1, supersample=3)
got = np.asarray(brick_sample_fn(ctx, p))
err = np.abs(got - want)
idx = np.argsort(err)[-8:]
for i in idx:
    print(f"  p={np.asarray(p)[i]}, pool={got[i]:.4f}, exact={want[i]:.4f}, err={err[i]:.4f}")
