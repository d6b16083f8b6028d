#!/usr/bin/env python
"""Checkpoint inspector — the `view_model` app (reference
apps/view_model.cpp): print a checkpoint's structure; with a reference
volume, evaluate PSNR/SSIM of the stored model (view_model.cpp:138-144).

    python apps/view_model.py params.bson [--synthetic vorts --dims 64]
"""
from __future__ import annotations

import argparse

from common import add_volume_args, load_simple_volume


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    add_volume_args(p)
    p.add_argument("--evaluate", action="store_true",
                   help="compute PSNR/SSIM against the volume")
    args = p.parse_args()

    from instantvnr_tpu.api import NeuralVolume
    from instantvnr_tpu.serializer import load_checkpoint, load_native

    if args.checkpoint.endswith(".npz"):
        field, state, dims = load_native(args.checkpoint)
        mc = None
        meta = {"step": int(state.opt.step), "loss": float(state.loss)}
        print("[view] format:         native exact-resume (.npz, "
              "full optimizer state)")
    elif args.checkpoint.endswith((".pt", ".pth", ".ckpt")):
        # imported fV-SRN torch checkpoint (the reference FvsrnNetwork's
        # inference-adapter role, fvsrn_network.cu:88-127)
        from instantvnr_tpu.models.fvsrn_import import load_fvsrn_torch

        field, params = load_fvsrn_torch(args.checkpoint)
        mc, dims, meta = None, None, {}
        print("[view] format:         fV-SRN torch checkpoint (imported)")
    else:
        field, params, mc, dims, meta = load_checkpoint(args.checkpoint)
    print(f"[view] volume dims:    {dims}")
    print(f"[view] trained steps:  {meta.get('step', '?')}  "
          f"loss {meta.get('loss', '?')}")
    spec = getattr(field, "spec", None)
    if spec is not None:
        print(f"[view] encoding:       {spec.n_levels} levels × "
              f"{spec.n_features} features, 2^{spec.log2_hashmap_size} cap, "
              f"base res {spec.base_resolution}")
        print(f"[view] level sizes:    {spec.level_sizes}")
    else:  # fV-SRN family (native .npz only)
        c = field.cfg
        print(f"[view] encoding:       fV-SRN latent grid "
              f"{c.latent_res} × {c.latent_features} features, "
              f"{c.fourier_bands} fourier bands")
    print(f"[view] mlp:            {field.cfg.network.n_neurons}×"
          f"{field.cfg.network.n_hidden_layers} {field.cfg.network.activation}")
    print(f"[view] total params:   {field.n_params}")
    if mc is not None:
        mx, my, mz = mc.dims
        print(f"[view] macrocell:      {mx}×{my}×{mz} cells")
    import os

    ckpt_bytes = os.path.getsize(args.checkpoint)
    if dims is not None:  # absent for params-only / pre-dims checkpoints
        raw_bytes = dims[0] * dims[1] * dims[2] * 4
        print(f"[view] compression:    {raw_bytes / ckpt_bytes:.1f}× "
              f"({ckpt_bytes} B vs {raw_bytes} B raw f32)")
    else:
        print(f"[view] checkpoint:     {ckpt_bytes} B "
              "(no volume dims stored — compression unknown)")

    if args.evaluate and (args.scene or args.synthetic):
        simple = load_simple_volume(args)
        if args.checkpoint.endswith((".pt", ".pth", ".ckpt")):
            # torch imports have no BSON container for from_checkpoint;
            # evaluate the already-imported field directly
            from instantvnr_tpu.models.metrics import (decode_volume,
                                                       psnr_vs, ssim_arrays)

            print(f"[view] PSNR: "
                  f"{float(psnr_vs(field, params, simple.volume.data)):.2f}"
                  " dB")
            dec = decode_volume(field, params,
                                tuple(int(d) for d in simple.dims))
            print(f"[view] SSIM: "
                  f"{float(ssim_arrays(dec, simple.volume.data)):.4f}")
        else:
            nv = NeuralVolume.from_checkpoint(args.checkpoint, simple=simple)
            print(f"[view] PSNR: {nv.get_psnr():.2f} dB")
            print(f"[view] SSIM: {nv.get_mssim():.4f}")


if __name__ == "__main__":
    main()
