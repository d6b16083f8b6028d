"""Sweep PathTraceSettings.finish_bucket on the real TPU @512² decoded.

Round-3: the compacted PT driver was dispatch-bound (up to 64 dispatches
per frame × ~25-30 ms link latency). The tail finisher replaces the
small-bucket dispatches with ONE run-to-completion while_loop program.
This measures where the crossover sits.

Run: cd /root/repo && timeout 1200 python scratch/pt_finish_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import TransferFunctionConfig
    from instantvnr_tpu.data import synthetic_volume
    from instantvnr_tpu.render.camera import Camera
    from instantvnr_tpu.render.pathtrace import (PathTraceRenderer,
                                                 PathTraceSettings)
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    size = 512
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    import itertools
    for cs, fb, epd in itertools.chain(
            [(cs, 16384, 8) for cs in (0, 2, 4, 8)],
            [(4, 16384, 16), (8, 16384, 16), (8, 32768, 8)]):
        r = PathTraceRenderer(
            size, size, mc, tf, vol.data,
            settings=PathTraceSettings(compact=True, finish_bucket=fb,
                                       cell_skips=cs,
                                       events_per_dispatch=epd))
        r.set_camera(cam)
        t0 = time.time()
        r.warmup()
        log(f"cs={cs} fb={fb} epd={epd}: warmup {time.time() - t0:.1f}s")
        for _ in range(3):
            r.render()
        sync(r._frame)
        t0 = time.time()
        n = 8
        for _ in range(n):
            r.render()
        sync(r._frame)
        fps = n / (time.time() - t0)
        log(f"cs={cs} fb={fb} epd={epd}: {fps:.2f} fps @512^2 decoded")
        del r


if __name__ == "__main__":
    main()
