"""Training-forward gather with the table pre-cast to compute dtype
(bf16) BEFORE the gather — bit-identical output (cast commutes with
gather), half the gathered bytes — plus the per-level split variant,
at BOTH bench schemas, encode-only and full train step."""
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


for log2 in (14, 19):
    cfg = ModelConfig(encoding=EncodingConfig(log2_hashmap_size=log2))
    field = NeuralField.from_config(cfg)
    spec = field.spec
    st = create_train_state(jax.random.PRNGKey(0), field)
    table = st.params["table"]
    mb = table.nbytes / 2**20
    print(f"--- schema 2^{log2}: [{table.shape[0]}, {table.shape[1]}] "
          f"{mb:.0f} MB f32", flush=True)

    def enc_cur(t, c):
        idx, w = corner_indices_and_weights(spec, c)
        f = t[idx].astype(jnp.bfloat16) * w.astype(jnp.bfloat16)[..., None]
        return f.sum()

    def enc_pre(t, c):
        idx, w = corner_indices_and_weights(spec, c)
        f = t.astype(jnp.bfloat16)[idx] * w.astype(jnp.bfloat16)[..., None]
        return f.sum()

    def enc_pre_lvl(t, c):
        idx, w = corner_indices_and_weights(spec, c)
        tb = t.astype(jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        iw = idx.reshape(B, spec.n_levels, 8)
        out = 0.
        for l in range(spec.n_levels):
            o, s = spec.level_offsets[l], spec.level_sizes[l]
            sub = jax.lax.dynamic_slice_in_dim(tb, o, s)
            f = sub[iw[:, l] - o] * wb[:, l*8:(l+1)*8, None]
            out = out + f.sum()
        return out

    def enc_f32_lvl(t, c):
        idx, w = corner_indices_and_weights(spec, c)
        iw = idx.reshape(B, spec.n_levels, 8)
        out = 0.
        for l in range(spec.n_levels):
            o, s = spec.level_offsets[l], spec.level_sizes[l]
            sub = jax.lax.dynamic_slice_in_dim(t, o, s)
            f = (sub[iw[:, l] - o].astype(jnp.bfloat16)
                 * w.astype(jnp.bfloat16)[:, l*8:(l+1)*8, None])
            out = out + f.sum()
        return out

    bench("fused f32 (current)", jax.jit(enc_cur), table, coords)
    bench("fused bf16-pre     ", jax.jit(enc_pre), table, coords)
    bench("perlvl bf16-pre    ", jax.jit(enc_pre_lvl), table, coords)
    bench("perlvl f32         ", jax.jit(enc_f32_lvl), table, coords)
