"""Root-cause the TPU-only splat gradient error at B=65536.

The splat backward's reassociated matmul [r1^2, B] @ [B, r1*F] produces a
full-magnitude wrong entry on TPU at B=65536 (oracle check r5) while the
same code matches a float64 NumPy oracle on CPU and at B<=8192 on TPU.
Compare the one-shot HIGHEST dot against K-chunked accumulation and other
precisions, shipping only [289, 34] results over the tunnel."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import EncodingConfig
from instantvnr_tpu.ops import hash_encoding as he

cfg = EncodingConfig(n_levels=1, n_features_per_level=2, log2_hashmap_size=19,
                     base_resolution=16, per_level_scale=2.0)
spec = he.HashGridSpec.from_config(cfg)
B, r1, f_ = 65536, 17, 2
coords = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))
g = jax.random.normal(jax.random.PRNGKey(2), (B, 2))


def build(coords, g):
    x = coords * jnp.float32(spec.scales[0]) + 0.5
    cell = jnp.floor(x)
    frac = (x - cell).astype(jnp.float32)
    cell = cell.astype(jnp.int32)
    iota = jnp.arange(r1, dtype=jnp.int32)

    def axis_w(a):
        c = cell[:, a:a+1]
        f = frac[:, a:a+1]
        return (jnp.where(iota[None, :] == c, 1.0 - f, 0.0)
                + jnp.where(iota[None, :] == c + 1, f, 0.0))

    wx, wy, wz = axis_w(0), axis_w(1), axis_w(2)
    a_zy = (wz[:, :, None] * wy[:, None, :]).reshape(B, r1 * r1)
    b_xf = (wx[:, :, None] * g[:, None, :]).reshape(B, r1 * f_)
    return a_zy, b_xf


from functools import partial
@partial(jax.jit, static_argnums=(2,))
def oneshot(coords, g, precision):
    a, b = build(coords, g)
    return jnp.dot(a.T, b, preferred_element_type=jnp.float32,
                   precision=precision)


@jax.jit
def chunked(coords, g):
    a, b = build(coords, g)
    acc = jnp.zeros((r1 * r1, r1 * f_), jnp.float32)
    for i in range(0, B, 8192):
        acc = acc + jnp.dot(a[i:i+8192].T, b[i:i+8192],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return acc


ref = np.asarray(chunked(coords, g), np.float64)
for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
             jax.lax.Precision.DEFAULT):
    got = np.asarray(oneshot(coords, g, prec))
    d = np.abs(got - ref)
    print(f"{prec}: max|diff vs chunked-HIGHEST| = {d.max():.4e} "
          f"(ref max {np.abs(ref).max():.3f}, bad>{0.1}: "
          f"{(d > 0.1).sum()})", flush=True)

# and vs host float64 via small per-chunk downloads of masked sums:
# checksum comparison on a few entries
bad = np.argwhere(np.abs(np.asarray(oneshot(coords, g,
      jax.lax.Precision.HIGHEST))- ref) > 0.1)
print("worst entries (zy, xf):", bad[:10].tolist(), flush=True)
