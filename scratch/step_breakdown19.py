"""2^19-paired train-step composition: enc fwd / enc f+b / loss f+b / full."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.models.network import network_apply
from instantvnr_tpu.models.trainer import train_steps, make_loss_fn
from instantvnr_tpu.ops.hash_encoding import hash_encode_splat

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))
targets = jax.random.uniform(jax.random.PRNGKey(3), (B, 1))
vol = jax.random.uniform(jax.random.PRNGKey(4), (64, 64, 64))

def first_leaf(r):
    return jax.tree_util.tree_leaves(r)[0]

def timeit(name, f, *a, n=10):
    r = f(*a); _ = float(first_leaf(r).ravel()[0])
    t0 = time.time()
    for _i in range(n):
        r = f(*a)
    _ = float(first_leaf(r).ravel()[0])
    print(f"{name}: {(time.time()-t0)/n*1e3:6.1f} ms", flush=True)

for variant in ("paired", "tcnn"):
    cfg = ModelConfig()
    cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
        cfg.encoding, hash_variant=variant))
    field = NeuralField.from_config(cfg)
    st = create_train_state(jax.random.PRNGKey(0), field)
    print(f"--- {variant} 2^{cfg.encoding.log2_hashmap_size}", flush=True)
    enc = jax.jit(lambda t, c: hash_encode_splat(t, c, field.spec).sum())
    timeit(f"{variant} enc-fwd ", enc, st.params["table"], coords)
    encb = jax.jit(jax.grad(
        lambda t, c: hash_encode_splat(t, c, field.spec).sum()))
    timeit(f"{variant} enc-f+b ", encb, st.params["table"], coords)
    lf = make_loss_fn(field)
    lossb = jax.jit(jax.grad(lambda p: lf(p, coords, targets)))
    timeit(f"{variant} loss-f+b", lossb, st.params)
    def steps5(s):
        return train_steps(field, vol, s, 5)
    r = steps5(st); _ = float(r.loss)
    t0 = time.time()
    r = steps5(r); _ = float(r.loss)
    print(f"{variant} full-step: {(time.time()-t0)/5*1e3:6.1f} ms", flush=True)
