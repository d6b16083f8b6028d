#!/usr/bin/env python
"""Precompute a shadow (transmittance) volume — the `generate_shadow_map`
app (reference apps/shadowmap.cu: per-voxel transmittance ray marching
toward the light; here a sheared cumulative-transmittance sweep, see
render/shadow.py).

    python apps/generate_shadow_map.py --synthetic vorts --dims 64 \
        --light 0.7 0.9 0.4 --output shadow.raw
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from common import add_volume_args, load_simple_volume


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    p.add_argument("--load", help="checkpoint: shadow of the DECODED network")
    p.add_argument("--light", type=float, nargs=3, default=[0.7, 0.9, 0.4])
    p.add_argument("--sampling-rate", type=float, default=1.0)
    p.add_argument("--output", default="shadow.raw",
                   help="raw float32 [dz,dy,dx] transmittance volume")
    args = p.parse_args()

    from instantvnr_tpu.render.shadow import shadow_volume_for

    if args.load:
        from instantvnr_tpu.api import NeuralVolume
        from instantvnr_tpu.config import TransferFunctionConfig
        from instantvnr_tpu.utils.tfn import bake_transfer_function

        nv = NeuralVolume.from_checkpoint(args.load)
        grid = nv.decode_volume()
        if args.scene or args.synthetic:
            # a scene provides the TF (with its data-unit range) — the
            # decoded-network shadows must match the ground-truth path's
            tf = load_simple_volume(args).tf
        else:
            tf = bake_transfer_function(TransferFunctionConfig())
        dims = nv.dims
    else:
        simple = load_simple_volume(args)
        grid = simple.volume.data
        tf = simple.tf
        dims = simple.dims

    t0 = time.time()
    s = np.asarray(shadow_volume_for(grid, tf, tuple(args.light),
                                     args.sampling_rate))
    print(f"[shadow] {dims} volume, light {args.light}: {time.time()-t0:.1f}s"
          f", mean transmittance {s.mean():.3f}")
    s.astype(np.float32).tofile(args.output)
    print(f"[shadow] saved {args.output}")


if __name__ == "__main__":
    main()
