"""Multi-chip scaling benchmark: DP training samples/s and ray-sharded
render rays/s per device count, printed as ONE JSON line.

The >85%-scaling north star (BASELINE.md) becomes a one-command
measurement the day multi-chip hardware exists:

    python bench_multichip.py              # real devices (jax.devices())
    python bench_multichip.py --cpu 8      # virtual 8-device CPU mesh

The CPU form runs today (the same harness the dryrun uses,
xla_force_host_platform_device_count) and validates the sweep end-to-end;
virtual-device timings measure host-core contention, not ICI, so the
JSON marks the backend. The reference has no distributed backend at all
(SURVEY.md §2.9) — the comparison row is our own single-device number.
"""
from __future__ import annotations

import json
import sys
import time


def _parse_args(argv):
    cpu_n = 0
    preset = None
    it = iter(argv)
    for a in it:
        if a == "--cpu":
            cpu_n = int(next(it))
        elif a == "--preset":
            preset = next(it)
        else:
            raise SystemExit(f"unknown arg {a} "
                             "(usage: bench_multichip.py [--cpu N] "
                             "[--preset tiny|flagship])")
    return cpu_n, preset


def main():
    cpu_n, preset = _parse_args(sys.argv[1:])
    import os

    if cpu_n:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cpu_n}")

    import jax

    if cpu_n:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from instantvnr_tpu.config import (
        EncodingConfig,
        ModelConfig,
        NetworkConfig,
        TransferFunctionConfig,
    )
    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.models import NeuralField
    from instantvnr_tpu.models.trainer import create_train_state
    from instantvnr_tpu.parallel import make_mesh, make_sharded_render_fn
    from instantvnr_tpu.parallel.train import (
        make_dp_train_step,
        replicate_state,
    )
    from instantvnr_tpu.render import (
        Camera,
        RaymarchSettings,
        camera_rays,
        reference_sample_fn,
    )
    from instantvnr_tpu.utils.math import ray_box_intersect
    from instantvnr_tpu.utils.profiling import sync
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    backend = jax.default_backend()
    devices = jax.devices()
    if preset is None:
        preset = "flagship" if backend == "tpu" else "tiny"
    if preset == "flagship":
        # the reference's example-model.json schema at the bench batch
        cfg = ModelConfig()
        batch1, vol_dims, side, steps = 1 << 16, (128, 128, 128), 512, 5
    else:
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=6, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
        )
        batch1, vol_dims, side, steps = 8192, (32, 32, 32), 64, 3

    field = NeuralField.from_config(cfg)
    vol = synthetic_volume(vol_dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera.default_for_dims(vol.dims)
    settings = RaymarchSettings(n_iters=4, max_supersteps=32)

    counts = []
    d = 1
    while d <= len(devices):
        counts.append(d)
        d *= 2

    train_rows, render_rows = {}, {}
    for n in counts:
        mesh = make_mesh(devices[:n])
        # --- DP training: global batch scales with n (weak scaling — the
        # production shape: more chips train the same model on more
        # samples/step; per-device work constant)
        batch = batch1 * n
        state = replicate_state(
            create_train_state(jax.random.PRNGKey(1), field), mesh)
        step = make_dp_train_step(field, mesh, batch=batch, n_steps=steps)
        state = step(state, vol.data)
        sync(state.loss)
        t0 = time.time()
        state = step(state, vol.data)
        sync(state.loss)
        dt = (time.time() - t0) / steps
        train_rows[n] = batch / dt / 1e6
        print(f"[multichip] DP train n={n}: {dt*1e3:.1f} ms/step "
              f"= {train_rows[n]:.3f} Msamples/s", file=sys.stderr, flush=True)

        # --- ray-sharded render: fixed frame (strong scaling)
        org_w, dirn = camera_rays(cam, side, side)
        dims_f = jnp.array(vol.dims, jnp.float32)
        org = org_w + 0.5 * dims_f
        t0v, t1v, hit = ray_box_intersect(org, dirn, jnp.zeros(3), dims_f)
        t0v = jnp.where(hit, t0v, 1.0)
        t1v = jnp.where(hit, t1v, 0.0)
        jitter = jnp.full((org.shape[0],), 0.5, jnp.float32)
        render = make_sharded_render_fn(reference_sample_fn, mesh, settings)
        rgba = render(vol.data, org, dirn, t0v, t1v, mc, tf, jitter)
        sync(rgba)
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            rgba = render(vol.data, org, dirn, t0v, t1v, mc, tf, jitter)
        sync(rgba)
        dt = (time.time() - t0) / reps
        render_rows[n] = side * side / dt / 1e6
        print(f"[multichip] render n={n}: {dt*1e3:.1f} ms/frame "
              f"= {render_rows[n]:.2f} Mrays/s", file=sys.stderr, flush=True)

    nmax = counts[-1]
    dp_scaling = (train_rows[nmax] / (train_rows[1] * nmax)) * 100.0
    render_scaling = (render_rows[nmax] / (render_rows[1] * nmax)) * 100.0
    out = {
        "metric": f"DP weak-scaling efficiency at {nmax} devices",
        "value": round(dp_scaling, 1),
        "unit": "%",
        "vs_baseline": round(dp_scaling / 85.0, 3),  # >=1.0 beats the bar
        "secondary": {
            "backend": backend,
            "preset": preset,
            "devices": nmax,
            "render_strong_scaling_pct": round(render_scaling, 1),
            **{f"dp_msamples_per_s_n{n}": round(v, 3)
               for n, v in train_rows.items()},
            **{f"render_mrays_per_s_n{n}": round(v, 2)
               for n, v in render_rows.items()},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
