"""Per-dense-level backward cost: separable splat vs plain scatter-add.
The r5 composition run showed dense splats cost 45.3 ms of the 2^19
backward — more than all five hashed pair-scatters (27.9 ms)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField
from instantvnr_tpu.ops import hash_encoding as he

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))

def first_leaf(r):
    return jax.tree_util.tree_leaves(r)[0]

def timeit(name, f, *a, n=10):
    r = f(*a); _ = float(first_leaf(r).ravel()[0])
    t0 = time.time()
    for _i in range(n):
        r = f(*a)
    _ = float(first_leaf(r).ravel()[0])
    print(f"{name}: {(time.time()-t0)/n*1e3:6.1f} ms", flush=True)

cfg = ModelConfig()
field = NeuralField.from_config(cfg)
spec = field.spec
g = jax.random.uniform(jax.random.PRNGKey(6), (B, spec.n_features),
                       jnp.float32)
dense_lvls = [l for l in range(spec.n_levels) if spec.level_is_dense[l]]
f_ = spec.n_features

for l in dense_lvls:
    size, res = spec.level_sizes[l], spec.resolutions[l]
    print(f"level {l}: res {res} size {size}", flush=True)
    timeit(f"  splat  l{l}", jax.jit(
        lambda c, gg, l=l: he._dense_level_grad_splat(spec, l, c, gg).sum()),
        coords, g)

    def scat(c, gg, l=l, size=size, f16=False):
        idx, w = he._dense_level_corners(spec, l, c)
        upd = (w[..., None] * gg[:, None, :]).reshape(-1, f_)
        acc = jnp.float16 if f16 else jnp.float32
        t = jnp.zeros((size, f_), acc)
        return t.at[idx.reshape(-1)].add(upd.astype(acc)).astype(
            jnp.float32).sum()

    timeit(f"  scat32 l{l}", jax.jit(lambda c, gg, l=l: scat(c, gg, l)),
           coords, g)
    timeit(f"  scat16 l{l}", jax.jit(
        lambda c, gg, l=l: scat(c, gg, l, f16=True)), coords, g)
