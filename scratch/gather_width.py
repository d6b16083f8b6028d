"""Raw gather cost: [B,R] rows from [T,W] for the shapes in question."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
B = 1 << 16
key = jax.random.PRNGKey(0)

def bench(T, W, R):
    tab = jax.random.normal(key, (T, W), jnp.float32)
    idx = jax.random.randint(key, (B, R), 0, T, jnp.int32)
    f = jax.jit(lambda t, i: t[i].sum())
    _ = float(f(tab, idx))
    t0 = time.time()
    for _ in range(10):
        r = f(tab, idx)
    _ = float(r)
    dt = (time.time() - t0) / 10 * 1e3
    print(f"T={T:>8} W={W:>3} R={R:>3}: {dt:6.1f} ms  "
          f"({dt*1e6/(B*R):.1f} ns/row)", flush=True)

bench(4718592, 8, 64)    # tcnn layout rows
bench(2359296, 16, 44)   # paired layout rows
bench(2359296, 16, 64)   # width effect at same row count
bench(4718592, 8, 44)    # row-count effect at tcnn width
bench(2359296, 8, 44)    # half-size table, narrow
