import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import ModelConfig, TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state
from instantvnr_tpu.render.brickcache import build_brick_cache
from instantvnr_tpu.utils.tfn import bake_transfer_function

dims = (128, 128, 128)
vol = synthetic_volume(dims, kind="vorts")
cfg = ModelConfig()
cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(cfg.encoding, log2_hashmap_size=14))
field = NeuralField.from_config(cfg)
tf = bake_transfer_function(TransferFunctionConfig())
mc = mcmod.build(vol.data, vol.dims, tf)
state = create_train_state(jax.random.PRNGKey(0), field)
t0 = time.time()
ctx = build_brick_cache(field, state.params, mc, dilate=1,
                        dtype=jnp.float16, supersample=2)
print("built", ctx["packed"].shape, ctx["packed"].nbytes/1e6, "MB", f"{time.time()-t0:.1f}s", flush=True)
v = float(ctx["packed"][0, 0])
print("scalar read ok", v, flush=True)
