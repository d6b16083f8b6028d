"""2^19-paired backward composition: dense splats vs hashed pair-scatters,
plus a sort+segment-sum alternative for one hashed level."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
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
cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
    cfg.encoding, hash_variant="paired"))
field = NeuralField.from_config(cfg)
spec = field.spec
st = create_train_state(jax.random.PRNGKey(0), field)
g = jax.random.uniform(jax.random.PRNGKey(6),
                       (B, spec.n_levels, spec.n_features), jnp.float32)
dense_lvls = [l for l in range(spec.n_levels) if spec.level_is_dense[l]]
hashed_lvls = [l for l in range(spec.n_levels) if not spec.level_is_dense[l]]
print("dense", dense_lvls, "hashed", hashed_lvls, flush=True)
f_ = spec.n_features

def dense_only(c, gg):
    out = 0.
    for l in dense_lvls:
        out = out + he._dense_level_grad_splat(spec, l, c, gg[:, l, :]).sum()
    return out

def hashed_only(c, gg):
    out = 0.
    for l in hashed_lvls:
        rows, w2 = he._paired_level_rows(spec, l, c)
        upd = (w2[..., None] * gg[:, l, None, None, :])
        size = spec.level_sizes[l]
        t = jnp.zeros((size // 2, 2 * f_), jnp.float16)
        t = t.at[rows.reshape(-1)].add(upd.reshape(-1, 2 * f_).astype(jnp.float16))
        out = out + t.astype(jnp.float32).sum()
    return out

def hashed_sortseg(c, gg):
    out = 0.
    for l in hashed_lvls:
        rows, w2 = he._paired_level_rows(spec, l, c)
        upd = (w2[..., None] * gg[:, l, None, None, :]).reshape(-1, 2 * f_)
        size = spec.level_sizes[l]
        k = rows.reshape(-1)
        sk, sidx = jax.lax.sort_key_val(k, jnp.arange(k.shape[0], jnp.int32))
        su = upd[sidx]
        t = jax.ops.segment_sum(su, sk, num_segments=size // 2)
        out = out + t.sum()
    return out

timeit("dense splats only   ", jax.jit(dense_only), coords, g)
timeit("hashed pair-scatters", jax.jit(hashed_only), coords, g)
timeit("hashed sort+segsum  ", jax.jit(hashed_sortseg), coords, g)
