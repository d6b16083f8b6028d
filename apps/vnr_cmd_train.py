#!/usr/bin/env python
"""Headless training — the `vnr_cmd_train` app (reference
apps/batch_trainer.cpp): train N steps in chunks of 10 with loss logging,
restart-on-bad-loss, final PSNR/SSIM, BSON checkpoint output.

    python apps/vnr_cmd_train.py --synthetic vorts --dims 64 \
        --max-num-steps 1000 --save params.bson --report-psnr
"""
from __future__ import annotations

import argparse
import math
import time

from common import (
    CsvLogger,
    add_model_args,
    add_volume_args,
    load_model_config,
    load_simple_volume,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    add_model_args(p)
    p.add_argument("--save", default="params.bson",
                   help="output checkpoint (BSON, reference format; a .npz "
                   "path writes the native exact-resume checkpoint with "
                   "full optimizer state)")
    p.add_argument("--resume", help="checkpoint to resume from "
                   "(batch_trainer.cpp:38-39 --resume; .npz resumes are "
                   "bit-exact)")
    p.add_argument("--report-psnr", action="store_true",
                   help="final PSNR/SSIM (batch_trainer.cpp:123-132)")
    p.add_argument("--log", help="CSV training curve (step, loss)")
    p.add_argument("--chunk", type=int, default=10,
                   help="steps per chunk (batch_trainer.cpp:97)")
    p.add_argument("--timestep", type=int, default=0,
                   help="time-series volumes: train on this timestep")
    p.add_argument("--sampling-mode", default="gpu",
                   choices=["gpu", "out-of-core", "analytic"],
                   help="GPU = in-core device sampling; out-of-core = "
                        "streamed blocks; analytic = no-ground-truth "
                        "training from the --synthetic field evaluated "
                        "in-jit (reference Sampler::load modes incl. the "
                        "OPENVKL procedural sources)")
    args = p.parse_args()

    import jax

    from instantvnr_tpu.api import NeuralVolume

    cfg = load_model_config(args)
    simple = None
    oc_desc = None
    analytic = None
    if args.sampling_mode == "analytic":
        # no-GT procedural training (the reference's OpenVKL modes,
        # neural_sampler.cpp:714-958): the field evaluates inside the
        # train-step jit; no volume is materialized anywhere
        from instantvnr_tpu.data.procedural import AnalyticSampler

        kind = {"vorts": "tubes"}.get(args.synthetic or "wavelet",
                                      args.synthetic or "wavelet")
        analytic = AnalyticSampler.create(kind, seed=args.seed)
        d = args.dims
        dims = tuple(d * 3) if len(d) == 1 else tuple(d)
        print(f"[vnr] analytic field '{kind}' (no in-core volume), "
              f"device {jax.devices()[0]}")
    elif args.sampling_mode == "out-of-core":
        # terascale path: never load the volume in-core; the streamed
        # sampler is the only reader (reference OUT_OF_CORE mode,
        # neural_sampler.cpp:1206-1271)
        if getattr(args, "volume", None):
            # .vdb → raw sidecar + descriptor (the native loader preads
            # contiguous rows; a sparse VDB tree can't be block-read
            # directly). Densified once, cached next to the .vdb.
            import os

            import numpy as np

            from instantvnr_tpu.data.vdb import read_vdb

            assert args.volume.endswith(".vdb"), \
                "--volume out-of-core supports .vdb (raw files use --scene)"
            sidecar = args.volume + ".raw"
            dense, info = read_vdb(args.volume,
                                   getattr(args, "vdb_grid", None))
            dz, dy, dx = dense.shape
            if not (os.path.exists(sidecar)
                    and os.path.getsize(sidecar) == dense.nbytes):
                with open(sidecar + ".tmp", "wb") as f:
                    dense.astype(np.float32).tofile(f)
                os.replace(sidecar + ".tmp", sidecar)
                print(f"[vnr] densified {args.volume} -> {sidecar}")
            from instantvnr_tpu.config import VolumeDesc

            oc_desc = VolumeDesc(
                filename=sidecar, dims=(dx, dy, dz), dtype="FLOAT",
                value_range=(float(dense.min()), float(dense.max())))
            del dense
        else:
            from instantvnr_tpu.config import load_scene_config

            assert args.scene, ("out-of-core needs a scene file "
                                "(raw volume) or --volume foo.vdb")
            scene = load_scene_config(args.scene)
            oc_desc = scene.volume
        dims = oc_desc.dims
        print(f"[vnr] volume {dims} (out-of-core, "
              f"{oc_desc.n_bytes/1e9:.1f} GB), device {jax.devices()[0]}")
    else:
        simple = load_simple_volume(args)
        if args.timestep:
            simple.set_current_timestep(args.timestep)
            print(f"[vnr] timestep {args.timestep}/{simple.num_timesteps}")
        dims = simple.dims
        print(f"[vnr] volume {dims}, device {jax.devices()[0]}")

    if args.resume:
        nv = NeuralVolume.from_checkpoint(args.resume, simple=simple)
        nv.train_batch = args.batch  # from_checkpoint has no batch param
        print(f"[vnr] resumed from {args.resume} at step {nv.step}")
    else:
        nv = NeuralVolume(cfg, simple=simple, dims=dims, seed=args.seed,
                          train_batch=args.batch)
    spec = getattr(nv.field, "spec", None)  # fV-SRN fields have no spec
    arch = (f"{spec.n_levels} levels × {spec.n_features} features"
            if spec is not None else type(nv.field).__name__)
    print(f"[vnr] model: {nv.field.n_params} params ({arch})")

    oc_sampler = None
    if oc_desc is not None:
        from instantvnr_tpu.data.outofcore import OutOfCoreSampler

        # normalization range: scene-provided "range" when present (the
        # reference's OOC sampler requires one, neural_sampler.cpp:1068);
        # otherwise OutOfCoreSampler streams a min/max scan of the file —
        # the same range the in-core StaticSampler computes
        # (neural_sampler.cpp:251-264) — so any-ranged data normalizes
        # identically in-core and out-of-core
        if oc_desc.value_range is None:
            print("[vnr] scanning value range (no 'range' in scene)...")
        oc_sampler = OutOfCoreSampler(oc_desc)
        lo, hi = oc_sampler.value_range
        print(f"[vnr] unnormalized range {lo:g} {hi:g}")
        print(f"[vnr] out-of-core streaming "
              f"({'native' if oc_sampler.is_native else 'numpy'} loader)")

    logger = CsvLogger(args.log, ["step", "loss", "time_s"])
    t_start = time.time()
    prev_loss = float("inf")
    step = nv.step
    while step < args.max_num_steps:
        n = min(args.chunk, args.max_num_steps - step)
        t0 = time.time()
        if analytic is not None:
            from instantvnr_tpu.models.trainer import train_steps_source

            nv.state = train_steps_source(nv.field, analytic, nv.state, n,
                                          args.batch)
            nv.step += n
            stats = nv.statistics()
        elif oc_sampler is not None:
            from instantvnr_tpu.models.trainer import train_out_of_core

            nv.state = train_out_of_core(nv.field, oc_sampler, nv.state, n,
                                         args.batch)
            nv.step += n
            stats = nv.statistics()
        else:
            stats = nv.train(n, fast_mode=False)
        dt = time.time() - t0
        step = stats.step
        # restart-on-bad-loss heuristic (batch_trainer.cpp:114-118)
        if not math.isfinite(stats.loss) or (
            step > 100 and stats.loss > 10.0 * max(prev_loss, 1e-6)
        ):
            print(f"[vnr] step {step}: bad loss {stats.loss:.5f} — "
                  "restarting network")
            nv = NeuralVolume(cfg, simple=simple, dims=dims,
                              seed=args.seed + step, train_batch=args.batch)
            step = 0
            prev_loss = float("inf")
            continue
        prev_loss = stats.loss
        print(f"[vnr] step {step:6d}  loss {stats.loss:.6f}  "
              f"({n / dt:.1f} steps/s)")
        logger.log(step, stats.loss, time.time() - t_start)
    logger.close()

    print(f"[vnr] total training time: {time.time() - t_start:.1f}s")
    if args.report_psnr and simple is not None:
        print(f"[vnr] PSNR: {nv.get_psnr():.2f} dB")
        print(f"[vnr] SSIM: {nv.get_mssim():.4f}")
    elif args.report_psnr and analytic is not None:
        # PSNR oracle against the analytic field at the decode lattice
        from instantvnr_tpu.models.metrics import psnr_vs

        gt = analytic.lattice_grid(dims)
        print(f"[vnr] PSNR vs analytic field: "
              f"{float(psnr_vs(nv.field, nv.state.params, gt)):.2f} dB")
    if args.save:
        nv.save_params(args.save)
        print(f"[vnr] saved checkpoint: {args.save}")


if __name__ == "__main__":
    main()
