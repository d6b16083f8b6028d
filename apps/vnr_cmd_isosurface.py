#!/usr/bin/env python
"""Isosurface extraction → OBJ — the `vnr_cmd_isosurface` app (reference
apps/batch_isosurface.cpp): marching tetrahedra from a simple volume or
DIRECTLY from a neural representation.

    python apps/vnr_cmd_isosurface.py --synthetic sphere --dims 64 \
        --isovalue 0.5 --output iso.obj
    python apps/vnr_cmd_isosurface.py --load params.bson --isovalue 0.5 \
        --output iso.obj
"""
from __future__ import annotations

import argparse
import time

from common import add_volume_args, load_simple_volume


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    p.add_argument("--load", help="checkpoint: extract from the NETWORK")
    p.add_argument("--isovalue", type=float, default=0.5)
    p.add_argument("--output", default="isosurface.obj")
    p.add_argument("--no-weld", action="store_true",
                   help="emit raw triangle soup instead of the indexed "
                        "(edge-welded) mesh")
    args = p.parse_args()

    from instantvnr_tpu.ops.isosurface import (
        extract_isosurface,
        extract_isosurface_network,
        save_obj,
    )

    t0 = time.time()
    if args.load:
        from instantvnr_tpu.api import NeuralVolume

        nv = NeuralVolume.from_checkpoint(args.load)
        print(f"[iso] extracting from network, dims {nv.dims}")
        verts, faces = extract_isosurface_network(
            nv.field, nv.state.params, nv.dims, args.isovalue,
            weld=not args.no_weld
        )
    else:
        simple = load_simple_volume(args)
        print(f"[iso] extracting from volume, dims {simple.dims}")
        verts, faces = extract_isosurface(simple.volume.data, args.isovalue,
                                          weld=not args.no_weld)
    print(f"[iso] {len(verts)} vertices, {len(faces)} triangles "
          f"in {time.time()-t0:.1f}s")
    save_obj(verts, faces, args.output)
    print(f"[iso] saved {args.output}")


if __name__ == "__main__":
    main()
