"""What is the 22 ms between enc-f+b and loss-f+b at 2^19-paired?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.models.trainer import make_loss_fn
from instantvnr_tpu.ops.mlp import mlp_apply
from instantvnr_tpu.ops.hash_encoding import hash_encode_splat

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
st = create_train_state(jax.random.PRNGKey(0), field)
feats = jax.random.uniform(jax.random.PRNGKey(5), (B, field.spec.n_output_dims))
lf = make_loss_fn(field)

# MLP-only fwd+bwd on fixed features
mlpb = jax.jit(jax.grad(lambda m: jnp.mean(jnp.abs(
    mlp_apply(m, feats, field.cfg.network,
              compute_dtype=jnp.dtype(field.cfg.compute_dtype)) - targets))))
timeit("mlp-only f+b      ", mlpb, st.params["mlp"])

# loss grad wrt TABLE only (mlp weights constant)
tb = jax.jit(jax.grad(lambda t: lf({"table": t, "mlp": st.params["mlp"]},
                                   coords, targets)))
timeit("loss-f+b table-only", tb, st.params["table"])

# full loss grad (reference point, = 99 ms in step_breakdown19)
fb = jax.jit(jax.grad(lambda p: lf(p, coords, targets)))
timeit("loss-f+b full      ", fb, st.params)

# encode f+b with MLP-shaped cotangent (bf16 g, not ones)
g = jax.random.uniform(jax.random.PRNGKey(6),
                       (B, field.spec.n_output_dims)).astype(jnp.bfloat16)
encg = jax.jit(lambda t, c: jax.vjp(
    lambda tt: hash_encode_splat(tt, c, field.spec,
        compute_dtype=jnp.dtype(field.cfg.compute_dtype)), t)[1](g)[0])
timeit("enc vjp(g bf16)    ", encg, st.params["table"], coords)
