#!/usr/bin/env python
"""Interactive ONLINE training — the `vnr_int_dual` capability headless
(reference apps/int_dual_volume.cpp background loop, :498-699): training
steps run INSIDE the render loop with no pretraining; each frame also
progressively decodes blobs so the decoded-texture render shows training
progress incrementally; per-frame CSV logs step/loss/render-time/train-time
(int_dual_volume.cpp:426-431).

    python apps/vnr_int_online.py --synthetic vorts --dims 64 \
        --frames 60 --train-steps-per-frame 10 --snapshot-every 20
"""
from __future__ import annotations

import argparse
import time

from common import (
    CsvLogger,
    add_model_args,
    add_volume_args,
    load_model_config,
    load_simple_volume,
    save_png,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    add_model_args(p)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--train-steps-per-frame", type=int, default=10)
    p.add_argument("--infer-blobs-per-frame", type=int, default=2,
                   help="progressive decode blobs/frame (int_dual:662-674)")
    p.add_argument("--log", help="CSV: frame,step,loss,train_ms,render_ms,fps")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="save frame_XXXX.png every N frames")
    p.add_argument("--pause-training", action="store_true")
    args = p.parse_args()

    import numpy as np

    import jax

    from instantvnr_tpu.api import NeuralVolume
    from instantvnr_tpu.utils.profiling import sync

    simple = load_simple_volume(args)
    cfg = load_model_config(args)
    if not args.model:
        # interactive default: cap the hash table at 2^14 — XLA scatter-add
        # scales badly with table size on v5e (NOTES_ROUND1.md) and online
        # training lives in the render loop; pass --model for the exact
        # reference schema
        import dataclasses

        cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
            cfg.encoding, log2_hashmap_size=14))
        print("[vnr] interactive default: hash table capped at 2^14 "
              "(pass --model for the exact reference schema)")
    nv = NeuralVolume(cfg, simple=simple, seed=args.seed,
                      train_batch=args.batch)
    dec = nv.get_decoder(args.size, args.size)

    from instantvnr_tpu.render.camera import Camera

    d = max(simple.dims)
    dec.set_camera(Camera(eye=(0.15 * d, 0.1 * d, -2.0 * d),
                          center=(0, 0, 0), up=(0, 1, 0), fovy=45))

    print(f"[vnr] online training: {simple.dims} volume, "
          f"{args.train_steps_per_frame} steps/frame, "
          f"{args.infer_blobs_per_frame} blobs/frame, "
          f"device {jax.devices()[0]}")
    logger = CsvLogger(args.log,
                       ["frame", "step", "loss", "train_ms", "render_ms",
                        "fps"])
    for frame in range(args.frames):
        t0 = time.time()
        if not args.pause_training:
            # background_work training slice (int_dual_volume.cpp:662-674)
            nv.train(args.train_steps_per_frame, fast_mode=False)
            nv.decode_progressive(args.infer_blobs_per_frame)
        t_train = time.time() - t0

        t0 = time.time()
        dec.set_params(nv.state.params)
        sync(dec.render())
        t_render = time.time() - t0

        fps = 1.0 / max(t_train + t_render, 1e-9)
        stats = nv.statistics()
        logger.log(frame, stats.step, stats.loss, t_train * 1e3,
                   t_render * 1e3, fps)
        if frame % 10 == 0:
            print(f"[vnr] frame {frame:4d}  step {stats.step:6d}  "
                  f"loss {stats.loss:.5f}  train {t_train*1e3:.0f}ms  "
                  f"render {t_render*1e3:.0f}ms  {fps:.1f} fps")
        if args.snapshot_every and frame % args.snapshot_every == 0:
            save_png(dec.mapframe(), f"frame_{frame:04d}.png")
    logger.close()
    print(f"[vnr] final: step {nv.step}, loss {float(nv.state.loss):.5f}, "
          f"PSNR {nv.get_psnr():.2f} dB")


if __name__ == "__main__":
    main()
