"""Per-level vs fused gathers at the 2^19 schema — footprint effect."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
B = 1 << 16
key = jax.random.PRNGKey(0)

def bench(name, f, *a):
    _ = float(f(*a))
    t0 = time.time()
    for _ in range(10):
        r = f(*a)
    _ = float(r)
    print(f"{name}: {(time.time()-t0)/10*1e3:6.1f} ms", flush=True)

# 2^19 schema level sizes (dense 4096/32768/262144, hashed 5x524288)
sizes = [4096, 32768, 262144] + [524288]*5
T = sum(sizes)
tab = jax.random.normal(key, (T, 8), jnp.float32)
offs = [0]
for s in sizes: offs.append(offs[-1]+s)
idxs = [jax.random.randint(jax.random.fold_in(key,i), (B, 8), 0, s, jnp.int32)
        for i, s in enumerate(sizes)]
fused_idx = jnp.concatenate([ix + o for ix, o in zip(idxs, offs)], axis=1)

bench("fused  [T,8] R=64", jax.jit(lambda t, i: t[i].sum()), tab, fused_idx)

def per_level(t, ids):
    out = 0.
    for ix, o, s in zip(ids, offs, sizes):
        sub = jax.lax.dynamic_slice_in_dim(t, o, s)
        out = out + sub[ix].sum()
    return out
bench("perlvl [S,8] R=8x8", jax.jit(per_level), tab, idxs)

# paired hashed: 4 rows of 16 from [S/2,16] per hashed level
pidxs = [jax.random.randint(jax.random.fold_in(key,9+i), (B, 4), 0, s//2, jnp.int32)
         for i, s in enumerate(sizes[3:])]
def per_level_paired(t, dids, pids):
    out = 0.
    for ix, o, s in zip(dids, offs[:3], sizes[:3]):
        sub = jax.lax.dynamic_slice_in_dim(t, o, s)
        out = out + sub[ix].sum()
    for ix, o, s in zip(pids, offs[3:], sizes[3:]):
        sub = jax.lax.dynamic_slice_in_dim(t, o, s).reshape(s//2, 16)
        out = out + sub[ix].sum()
    return out
bench("perlvl paired", jax.jit(per_level_paired), tab, idxs[:3], pidxs)

# paired hashed as TWO narrow gathers (even/odd halves) per level
def per_level_paired_narrow(t, dids, pids):
    out = 0.
    for ix, o, s in zip(dids, offs[:3], sizes[:3]):
        sub = jax.lax.dynamic_slice_in_dim(t, o, s)
        out = out + sub[ix].sum()
    for ix, o, s in zip(pids, offs[3:], sizes[3:]):
        sub = jax.lax.dynamic_slice_in_dim(t, o, s).reshape(s//2, 16)
        even = sub[:, :8]; odd = sub[:, 8:]
        out = out + even[ix].sum() + odd[ix].sum()
    return out
bench("perlvl paired 2x8w", jax.jit(per_level_paired_narrow), tab, idxs[:3], pidxs)
