"""Is the coords-cotangent vjp really DCE'd in the full loss graph?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.ops import hash_encoding as he
from instantvnr_tpu.ops.mlp import mlp_apply

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))
targets = jax.random.uniform(jax.random.PRNGKey(3), (B, 1))

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
cdt = jnp.dtype(field.cfg.compute_dtype)

# a splat encode whose bwd returns ZERO coords cotangent (no vjp_c at all)
make = he._make_paired_splat_encode
import types
def make_nocoord(spec, compute_dtype):
    enc = make(spec, compute_dtype)
    # rebuild with patched bwd: copy of _make_paired_splat_encode minus vjp_c
    dense_lvls = [l for l in range(spec.n_levels) if spec.level_is_dense[l]]
    hashed_lvls = [l for l in range(spec.n_levels)
                   if not spec.level_is_dense[l]]
    f_ = spec.n_features

    @jax.custom_vjp
    def encode(table, coords):
        return he.hash_encode_paired(table, coords, spec, compute_dtype)

    def fwd(table, coords):
        return encode(table, coords), (table, coords)

    def bwd(res_, g):
        table, coords = res_
        b = coords.shape[0]
        g = g.astype(jnp.float32).reshape(b, spec.n_levels, f_)
        parts = [None] * spec.n_levels
        for l in dense_lvls:
            parts[l] = he._dense_level_grad_splat(spec, l, coords, g[:, l, :])
        for l in hashed_lvls:
            rows, w2 = he._paired_level_rows(spec, l, coords)
            upd = (w2[..., None] * g[:, l, None, None, :])
            size = spec.level_sizes[l]
            acc_dt = (jnp.float16 if size >= (1 << 17) else jnp.float32)
            t = jnp.zeros((size // 2, 2 * f_), acc_dt)
            t = t.at[rows.reshape(-1)].add(
                upd.reshape(-1, 2 * f_).astype(acc_dt))
            parts[l] = t.astype(jnp.float32).reshape(size, f_)
        return (jnp.concatenate(parts, 0).astype(table.dtype),
                jnp.zeros_like(coords))

    encode.defvjp(fwd, bwd)
    return encode

enc_nc = make_nocoord(spec, cdt)

def loss_nc(p):
    feats = enc_nc(p["table"], coords)
    pred = mlp_apply(p["mlp"], feats, field.cfg.network, compute_dtype=cdt)
    return jnp.mean(jnp.abs(pred - targets))

fb = jax.jit(jax.grad(loss_nc))
timeit("loss-f+b NO-coordgrad", fb, st.params)
