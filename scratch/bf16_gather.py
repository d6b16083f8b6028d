"""Training-forward gather with the table cast to bf16 BEFORE the gather:
bit-identical output when compute_dtype=bf16 (the cast commutes with the
gather), half the gathered bytes. Plus per-level split variant."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.ops.hash_encoding import corner_indices_and_weights

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))
cfg = ModelConfig()
field = NeuralField.from_config(cfg)
spec = field.spec
st = create_train_state(jax.random.PRNGKey(0), field)
table = st.params["table"]

def bench(name, f, *a):
    r = f(*a); _ = float(jnp.asarray(r).ravel()[0])
    t0 = time.time()
    for _ in range(10):
        r = f(*a)
    _ = float(jnp.asarray(r).ravel()[0])
    print(f"{name}: {(time.time()-t0)/10*1e3:6.1f} ms", flush=True)

def enc_current(t, c):
    idx, w = corner_indices_and_weights(spec, c)
    f = t[idx].astype(jnp.bfloat16) * w.astype(jnp.bfloat16)[..., None]
    return f.sum()

def enc_pre_bf16(t, c):
    idx, w = corner_indices_and_weights(spec, c)
    tb = t.astype(jnp.bfloat16)
    f = tb[idx] * w.astype(jnp.bfloat16)[..., None]
    return f.sum()

def enc_pre_bf16_perlvl(t, c):
    idx, w = corner_indices_and_weights(spec, c)
    tb = t.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    out = 0.
    iw = idx.reshape(B, spec.n_levels, 8)
    for l in range(spec.n_levels):
        o, s = spec.level_offsets[l], spec.level_sizes[l]
        sub = jax.lax.dynamic_slice_in_dim(tb, o, s)
        f = sub[iw[:, l] - o] * wb[:, l*8:(l+1)*8, None]
        out = out + f.sum()
    return out

bench("fused f32-table (current)", jax.jit(enc_current), table, coords)
bench("fused bf16-pre-cast      ", jax.jit(enc_pre_bf16), table, coords)
bench("perlvl bf16-pre-cast     ", jax.jit(enc_pre_bf16_perlvl), table, coords)
