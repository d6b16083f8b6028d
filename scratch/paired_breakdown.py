"""Where does the 2^19 step go? fwd-only vs fwd+bwd, tcnn vs paired."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.models.network import network_apply
from instantvnr_tpu.ops.hash_encoding import hash_encode_splat

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))

def first_leaf(r):
    return jax.tree_util.tree_leaves(r)[0]

def timeit(f, *a):
    r = f(*a); _ = float(first_leaf(r).ravel()[0])
    t0 = time.time()
    for _i in range(10):
        r = f(*a)
    _ = float(first_leaf(r).ravel()[0])
    return (time.time() - t0) / 10 * 1e3

for variant in ("tcnn", "paired"):
    cfg = ModelConfig()
    cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
        cfg.encoding, hash_variant=variant))
    field = NeuralField.from_config(cfg)
    st = create_train_state(jax.random.PRNGKey(0), field)
    enc = jax.jit(lambda t, c: hash_encode_splat(t, c, field.spec).sum())
    print(f"{variant} enc-fwd   {timeit(enc, st.params['table'], coords):.1f} ms", flush=True)
    encb = jax.jit(jax.grad(lambda t, c: hash_encode_splat(t, c, field.spec).sum()))
    print(f"{variant} enc-f+b   {timeit(encb, st.params['table'], coords):.1f} ms", flush=True)
    full = jax.jit(jax.grad(lambda p, c: network_apply(p, c, field).sum()))
    print(f"{variant} full f+b  {timeit(full, st.params, coords):.1f} ms", flush=True)
