"""Paired vs tcnn training step time on real TPU (v5e), 2^14 and 2^19."""
import dataclasses, time, sys
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps

vol = synthetic_volume((128, 128, 128), kind="vorts")
batch = 1 << 16
for cap in (14, 19):
    for variant in ("tcnn", "paired"):
        cfg = ModelConfig()
        cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
            cfg.encoding, log2_hashmap_size=cap, hash_variant=variant))
        field = NeuralField.from_config(cfg)
        st = create_train_state(jax.random.PRNGKey(0), field)
        st = train_steps(field, vol.data, st, 10, batch)
        _ = float(st.loss)
        t0 = time.time()
        for _ in range(5):
            st = train_steps(field, vol.data, st, 10, batch)
        _ = float(st.loss)
        dt = (time.time() - t0) / 50
        print(f"cap {cap} {variant}: {dt*1e3:.1f} ms/step "
              f"({batch/dt/1e6:.2f} Msamples/s)", flush=True)
