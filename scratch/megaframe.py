"""Fuse a recorded 512² wavefront schedule into ONE device program and
time it vs the per-dispatch replay (8.67 fps = ~115 ms/frame)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
from functools import partial
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
from instantvnr_tpu.render.raymarch import RaymarchSettings, init_ray_state, _superstep
from instantvnr_tpu.render.compaction import _fused_sampling
from instantvnr_tpu.render.renderer import Renderer, _frame_rays
from instantvnr_tpu.render.transform import default_transform
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

settings = RaymarchSettings(n_iters=8, max_skips=1, compact=True)

# baseline: replayed frames, no mapframe (bench style)
r = Renderer(512, 512, mc, tf, brick_sample_fn, sample_ctx=ctx,
             settings=settings)
r.set_camera(cam)
r.warmup()
r.render(); r.mapframe()
for _ in range(2):
    r.render()
r.mapframe()
t0 = time.time()
n = 6
for _ in range(n):
    r.render()
r.mapframe()
log(f"replay baseline: {(time.time()-t0)/n*1e3:.1f} ms/frame")

# the recorded schedule (from scratch/sched512.py)
SCHED = [('S', 262144), ('C', 131072), ('S', 131072), ('C', 65536),
         ('S', 65536), ('C', 16384), ('F', 16384)]
log("using schedule:", SCHED)

R = 512 * 512
xform = default_transform(jnp.array(dims, jnp.float32))
cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
              jnp.asarray(cam.center, jnp.float32),
              jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
org_f, dirn_f, t0_f, t1_f, light, lo, hi = _frame_rays(
    512, 512, cam_arrays, jnp.array(dims, jnp.float32),
    jnp.asarray(settings.light_dir, jnp.float32), xform)
jit_f = jax.random.uniform(jax.random.PRNGKey(9), (R,))

occ_aux, fused_fn = _fused_sampling(brick_sample_fn, ctx)
fn = partial(brick_sample_fn, ctx)


def compact_to(m, rays, st, perm):
    """Inline of compaction._compact_prefix logic (jit-safe)."""
    active = st.active[:m]
    live = active.astype(jnp.int32)
    n_live = jnp.sum(live)
    pos_live = jnp.cumsum(live) - 1
    pos_dead = n_live + jnp.cumsum(1 - live) - 1
    dest = jnp.where(active, pos_live, pos_dead)
    iota = jnp.arange(m, dtype=jnp.int32)
    order = jnp.zeros((m,), jnp.int32).at[dest].set(iota)
    leaves, treedef = jax.tree_util.tree_flatten((rays, st, perm))
    cols = [l[:m].reshape(m, -1).astype(jnp.float32) for l in leaves]
    widths = [c.shape[1] for c in cols]
    packed = jnp.concatenate(cols, axis=1)
    packed = jnp.take(packed, order, axis=0)
    out, off = [], 0
    for l, w_ in zip(leaves, widths):
        c = packed[:, off:off + w_].astype(l.dtype).reshape(l[:m].shape)
        out.append(l.at[:m].set(c))
        off += w_
    return jax.tree_util.tree_unflatten(treedef, out)


def sub_step(m, rays, st):
    org, dirn, t_far, jit = rays
    pre = jax.tree_util.tree_map(lambda a: a[:m], st)
    sub = _superstep(fn, org[:m], dirn[:m], t_far[:m], jit[:m], mc, tf,
                     settings, light, pre, occ_aux=occ_aux,
                     fused_fn=fused_fn)
    return jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice(
            full, part, (0,) * full.ndim), st, sub)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def megaframe(rays, st, perm):
    counts = []
    m_cur = R
    for op in SCHED:
        if op[0] == "S":
            m_cur = op[1]
            st = sub_step(m_cur, rays, st)
            counts.append(jnp.sum(st.active[:m_cur].astype(jnp.int32)))
        elif op[0] == "C":
            rays, st, perm = compact_to(m_cur, rays, st, perm)
            m_cur = op[1]
        else:  # F
            m = op[1]
            org, dirn, t_far, jit = rays
            pre = jax.tree_util.tree_map(lambda a: a[:m], st)

            def cond(c):
                s_, i = c
                return jnp.any(s_.active) & (i < 192)

            def body(c):
                s_, i = c
                s_ = _superstep(fn, org[:m], dirn[:m], t_far[:m], jit[:m],
                                mc, tf, settings, light, s_,
                                occ_aux=occ_aux, fused_fn=fused_fn)
                return s_, i + 1

            sub, _ = jax.lax.while_loop(cond, body,
                                        (pre, jnp.int32(0)))
            st = jax.tree_util.tree_map(
                lambda full, part: jax.lax.dynamic_update_slice(
                    full, part, (0,) * full.ndim), st, sub)
    return rays, st, perm, jnp.stack(counts)


def fresh():
    rays = tuple(x + 0.0 for x in (org_f, dirn_f, t1_f, jit_f))
    st = init_ray_state(t0_f + 0.0, rays[2])
    return rays, st, jnp.arange(R, dtype=jnp.int32)


rays, st, perm = fresh()
t0 = time.time()
rays, st, perm, counts = megaframe(rays, st, perm)
_ = float(st.alpha.ravel()[0])
log(f"megaframe compile+run: {time.time()-t0:.1f} s; counts {np.asarray(counts)}")
for trial in range(2):
    t0 = time.time()
    n = 6
    for _ in range(n):
        rays, st, perm = fresh()
        rays, st, perm, counts = megaframe(rays, st, perm)
    _ = float(st.alpha.ravel()[0])
    log(f"megaframe: {(time.time()-t0)/n*1e3:.1f} ms/frame (incl fresh())")
