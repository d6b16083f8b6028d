"""On-chip timing: training step with grid_fwd_impl plain vs packed.

The corner-packed forward rebuilds packed dense tables each step and
gathers one [8F] row per dense level per sample instead of 8 rows; the
question is whether the per-step rebuild + fewer gathers nets out faster
at each schema size. Decides the grid_fwd_impl="auto" policy.

    timeout 1800 python scratch/packed_train.py

Prints ms/step per (schema, impl) to stderr; one JSON line to stdout.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

# scripts live in scratch/ → sys.path[0] is scratch/, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.models import NeuralField, create_train_state, train_steps


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    batch = 1 << 16
    out = {}
    for log2 in (14, 16, 19):
        for fwd in ("plain", "packed"):
            cfg = ModelConfig()
            cfg = dataclasses.replace(
                cfg,
                encoding=dataclasses.replace(cfg.encoding,
                                             log2_hashmap_size=log2),
                grid_fwd_impl=fwd)
            field = NeuralField.from_config(cfg)
            state = create_train_state(jax.random.PRNGKey(0), field)
            t0 = time.time()
            state = train_steps(field, vol.data, state, 10, batch)
            _ = float(state.loss)
            log(f"2^{log2} {fwd}: warm {time.time()-t0:.1f}s")
            t0 = time.time()
            n = 30
            for _ in range(n // 10):
                state = train_steps(field, vol.data, state, 10, batch)
            _ = float(state.loss)
            ms = (time.time() - t0) / n * 1e3
            out[f"h{log2}_{fwd}"] = round(ms, 1)
            log(f"2^{log2} {fwd}: {ms:.1f} ms/step "
                f"({batch/ms*1e3/1e6:.2f} Msamples/s)")
            del state, field
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
