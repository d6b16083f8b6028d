"""On-chip timing: fused Pallas slab compositor / iso sweep vs the XLA scan.

Decides the defaults for SlabSettings.pallas_compositor and
IsoSettings.pallas_sweep ("auto" if the kernel wins). Run on the real TPU:

    timeout 1800 python scratch/slab_pallas_speed.py

Prints ms/frame per variant to stderr; one JSON summary line to stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

# scripts live in scratch/ → sys.path[0] is scratch/, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.decoded import DecodedRenderer
from instantvnr_tpu.render.isosurf import IsoRenderer, IsoSettings
from instantvnr_tpu.render.slabmarch import SlabSettings
from instantvnr_tpu.utils.tfn import bake_transfer_function


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
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(0.15 * dims[0], 0.1 * dims[1], -2.0 * dims[2]),
                 center=(0, 0, 0), up=(0, 1, 0), fovy=45)

    out = {}
    variants = [
        ("plain_xla", SlabSettings(pallas_compositor=False), False),
        ("plain_pallas", SlabSettings(pallas_compositor=True), False),
        ("shaded_xla",
         SlabSettings(shading="gradient", pallas_compositor=False), False),
        ("shaded_pallas",
         SlabSettings(shading="gradient", pallas_compositor=True), False),
        ("shadow_xla", SlabSettings(pallas_compositor=False), True),
        ("shadow_pallas", SlabSettings(pallas_compositor=True), True),
    ]
    for name, settings, shadows in variants:
        try:
            r = DecodedRenderer(size, size, mc, tf, dims, settings=settings,
                                initial_volume=vol.data)
            r.set_camera(cam)
            if shadows:
                r.enable_shadows()
            t0 = time.time()
            dt = time_frames(r)
            out[name] = dt * 1e3
            log(f"slab {name}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} fps) "
                f"[stage {time.time()-t0:.0f}s]")
            del r
        except Exception as e:  # noqa: BLE001
            log(f"slab {name} FAILED: {e!r}")
            out[name] = None

    for name, st in [("iso_xla", IsoSettings(pallas_sweep=False)),
                     ("iso_pallas", IsoSettings(pallas_sweep=True))]:
        try:
            ri = IsoRenderer(size, size, vol.data, tf, isovalue=0.5,
                             settings=st)
            ri.set_camera(cam)
            t0 = time.time()
            dt = time_frames(ri)
            out[name] = dt * 1e3
            log(f"{name}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} fps) "
                f"[stage {time.time()-t0:.0f}s]")
            del ri
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {e!r}")
            out[name] = None

    # bigger volume: 512^3 — the kernel's VMEM-resident carry should matter
    # more when slabs are larger and there are 4x as many
    try:
        dims2 = (512, 512, 512)
        vol2 = synthetic_volume(dims2, kind="vorts")
        mc2 = mcmod.build(vol2.data, vol2.dims, tf)
        cam2 = Camera(eye=(0.15 * dims2[0], 0.1 * dims2[1], -2.0 * dims2[2]),
                      center=(0, 0, 0), up=(0, 1, 0), fovy=45)
        for name, settings in [
                ("big_xla", SlabSettings(pallas_compositor=False)),
                ("big_pallas", SlabSettings(pallas_compositor=True))]:
            r = DecodedRenderer(size, size, mc2, tf, dims2,
                                settings=settings, initial_volume=vol2.data)
            r.set_camera(cam2)
            dt = time_frames(r, warm=3, n=5)
            out[name] = dt * 1e3
            log(f"slab512 {name}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} fps)")
            del r
    except Exception as e:  # noqa: BLE001
        log(f"512^3 stage FAILED: {e!r}")

    print(json.dumps({k: (round(v, 2) if v else v) for k, v in out.items()}),
          flush=True)


if __name__ == "__main__":
    main()
