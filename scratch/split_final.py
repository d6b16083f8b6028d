"""Definitive per-level split-gather conclusion (VERDICT r4 #1).

Variants the r4 precast_fwd.py run did NOT cover, all at the 2^19 schema
with REAL corner indices: pre-cast outside the jit, slice-then-cast, and
genuinely separate per-level tables (no dynamic_slice at all).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig, EncodingConfig
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.ops.hash_encoding import corner_indices_and_weights

B = 1 << 16
coords = jax.random.uniform(jax.random.PRNGKey(2), (B, 3))


def bench(name, f, *a, n=10):
    r = f(*a); _ = float(jnp.asarray(r).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    _ = float(jnp.asarray(r).ravel()[0])
    print(f"{name}: {(time.time()-t0)/n*1e3:6.1f} ms", flush=True)


cfg = ModelConfig(encoding=EncodingConfig(log2_hashmap_size=19))
field = NeuralField.from_config(cfg)
spec = field.spec
st = create_train_state(jax.random.PRNGKey(0), field)
table = st.params["table"]
table_bf = table.astype(jnp.bfloat16)
lvl_tabs = [jax.lax.dynamic_slice_in_dim(table, o, s)
            for o, s in zip(spec.level_offsets, spec.level_sizes)]
lvl_tabs = [jax.device_put(t) for t in lvl_tabs]
lvl_tabs_bf = [t.astype(jnp.bfloat16) for t in lvl_tabs]
print(f"schema 2^19: [{table.shape[0]}, 8] {table.nbytes/2**20:.0f} MB f32",
      flush=True)


def enc_fused_pre(t, c):
    idx, w = corner_indices_and_weights(spec, c)
    f = t.astype(jnp.bfloat16)[idx] * w.astype(jnp.bfloat16)[..., None]
    return f.sum()


def enc_fused_precast_arg(tb, c):  # table already bf16 (cast outside jit)
    idx, w = corner_indices_and_weights(spec, c)
    f = tb[idx] * w.astype(jnp.bfloat16)[..., None]
    return f.sum()


def enc_perlvl_precast_arg(tb, c):  # bf16 arg, per-level dynamic_slice
    idx, w = corner_indices_and_weights(spec, c)
    wb = w.astype(jnp.bfloat16)
    iw = idx.reshape(B, spec.n_levels, 8)
    out = 0.
    for l in range(spec.n_levels):
        o, s = spec.level_offsets[l], spec.level_sizes[l]
        sub = jax.lax.dynamic_slice_in_dim(tb, o, s)
        out = out + (sub[iw[:, l] - o] * wb[:, l*8:(l+1)*8, None]).sum()
    return out


def enc_perlvl_slicecast(t, c):  # f32 arg, slice THEN cast each level
    idx, w = corner_indices_and_weights(spec, c)
    wb = w.astype(jnp.bfloat16)
    iw = idx.reshape(B, spec.n_levels, 8)
    out = 0.
    for l in range(spec.n_levels):
        o, s = spec.level_offsets[l], spec.level_sizes[l]
        sub = jax.lax.dynamic_slice_in_dim(t, o, s).astype(jnp.bfloat16)
        out = out + (sub[iw[:, l] - o] * wb[:, l*8:(l+1)*8, None]).sum()
    return out


def enc_septabs(c, *tabs):  # separate per-level arrays, no slicing
    idx, w = corner_indices_and_weights(spec, c)
    dt = tabs[0].dtype
    wb = w.astype(dt)
    iw = idx.reshape(B, spec.n_levels, 8)
    out = 0.
    for l in range(spec.n_levels):
        o = spec.level_offsets[l]
        out = out + (tabs[l][iw[:, l] - o] * wb[:, l*8:(l+1)*8, None]).sum()
    return out


bench("fused bf16-in-jit (r4 best)", jax.jit(enc_fused_pre), table, coords)
bench("fused bf16-arg             ", jax.jit(enc_fused_precast_arg), table_bf, coords)
bench("perlvl bf16-arg slice      ", jax.jit(enc_perlvl_precast_arg), table_bf, coords)
bench("perlvl f32 slice-then-cast ", jax.jit(enc_perlvl_slicecast), table, coords)
bench("septabs f32                ", jax.jit(enc_septabs), coords, *lvl_tabs)
bench("septabs bf16               ", jax.jit(enc_septabs), coords, *lvl_tabs_bf)
