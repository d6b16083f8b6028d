"""Follow-up: is the plain-compositor Pallas loss at 128^3 a tile_h artifact?

slab_pallas_speed.py measured plain_pallas 27.6 ms vs plain_xla 22.2 at
512^2 x 128^3 (tile_h=256 via pick_tile_h) while every heavier variant won.
Sweep tile_h for the plain kernel + re-time the XLA scan back-to-back.

    timeout 1200 python scratch/plain_tile_sweep.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.ops.pallas import slab_composite as sc
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.decoded import DecodedRenderer
from instantvnr_tpu.render.slabmarch import SlabSettings


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_frames(r, warm=3, n=10):
    for _ in range(warm):
        r.render()
    _ = float(r._frame.ravel()[0])
    t0 = time.time()
    for _ in range(n):
        r.render()
    _ = float(r._frame.ravel()[0])
    return (time.time() - t0) / n


def main():
    size = 512
    dims = (128, 128, 128)
    vol = synthetic_volume(dims, kind="vorts")
    from instantvnr_tpu.utils.tfn import bake_transfer_function
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    out = {}
    orig = sc.pick_tile_h
    for name, tile in [("xla", None), ("pallas_t256", 256),
                       ("pallas_t128", 128), ("pallas_t64", 64),
                       ("pallas_t32", 32), ("xla2", None)]:
        if tile is not None:
            sc.pick_tile_h = lambda *a, _t=tile, **k: _t
        try:
            settings = SlabSettings(pallas_compositor=tile is not None)
            r = DecodedRenderer(size, size, mc, tf, dims, settings=settings,
                                initial_volume=vol.data)
            r.set_camera(cam)
            dt = time_frames(r)
            out[name] = round(dt * 1e3, 2)
            log(f"{name}: {dt*1e3:.2f} ms/frame")
            del r
        finally:
            sc.pick_tile_h = orig
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
