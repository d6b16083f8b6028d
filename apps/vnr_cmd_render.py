#!/usr/bin/env python
"""Headless render benchmark — the `vnr_cmd_render` app (reference
apps/batch_renderer.cpp): warmup frames, N timed frames, per-frame fps CSV,
screenshot output.

    python apps/vnr_cmd_render.py --load params.bson --size 512 \
        --num-frames 20 --output frame.png --fps-log fps.csv
"""
from __future__ import annotations

import argparse
import time

from common import CsvLogger, add_volume_args, load_simple_volume, save_png


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    p.add_argument("--load", help="checkpoint (renders without GT if no scene)")
    p.add_argument("--mode", default="decoded",
                   choices=["decoded", "neural", "reference", "gradient", "ssh",
                            "pathtrace", "pathtrace-neural",
                            "pathtrace-reference", "isosurface",
                            "isosurface-reference"],
                   help="render mode (reference api.h:36-60 matrix; "
                        "isosurface = int_isosurface.cu viewing capability)")
    p.add_argument("--size", type=int, default=768,
                   help="frame size (batch_renderer.cpp:199 default 768²)")
    p.add_argument("--num-frames", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--sampling-rate", type=float, default=1.0,
                   help="vnrRendererSetVolumeSamplingRate "
                   "(batch_renderer.cpp:203)")
    p.add_argument("--density-scale", type=float, default=1.0,
                   help="vnrRendererSetVolumeDensityScale "
                   "(batch_renderer.cpp:202)")
    p.add_argument("--streaming-cache", default="auto",
                   choices=["auto", "brick", "hq", "lazy", "none"],
                   help="sample-streaming cache policy for the neural "
                        "wavefront modes (hq = 2x-supersampled pool, "
                        "near-exact quality; none = exact per-sample "
                        "network evaluation)")
    p.add_argument("--denoise", action="store_true",
                   help="a-trous denoiser at mapframe "
                   "(vnrRendererSetDenoiser)")
    p.add_argument("--shadows", action="store_true",
                   help="shadow volume on the decoded path "
                   "(MethodShadowMap capability)")
    p.add_argument("--slab-shading", default="none",
                   choices=["none", "gradient"],
                   help="shading for the decoded-slab path")
    p.add_argument("--output", default="frame.png")
    p.add_argument("--fps-log", help="per-frame fps CSV "
                   "(batch_renderer.cpp:222-224)")
    p.add_argument("--camera", type=float, nargs=3, default=None,
                   help="eye position (default: auto-framed orbit)")
    p.add_argument("--isovalue", type=float, default=0.5,
                   help="isovalue for the isosurface modes")
    p.add_argument("--timestep", type=int, default=0,
                   help="time-series volumes: render this timestep "
                   "(vnrSimpleVolumeSetCurrentTimeStep, api.h:118)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture an Xprof trace of the timed frames into DIR "
                   "(utils/profiling.trace; view with xprof/tensorboard)")
    p.add_argument("--orbit", action="store_true",
                   help="rotate the camera one full orbit over the timed "
                   "frames (per-frame camera rebind, the interactive-use "
                   "pattern; disables accumulation convergence)")
    args = p.parse_args()

    import numpy as np

    import jax

    from instantvnr_tpu.api import NeuralVolume, RenderMode, SimpleVolume, VNRenderer
    from instantvnr_tpu.render.camera import Camera

    simple = None
    if args.scene or args.synthetic:
        simple = load_simple_volume(args)

    if args.load:
        nv = NeuralVolume.from_checkpoint(args.load, simple=simple)
        subject = nv
        dims = nv.dims
    else:
        assert simple is not None, "--load or a volume source required"
        subject = simple
        dims = simple.dims

    mode = {
        "decoded": RenderMode.DECODED_SLAB,
        "neural": RenderMode.NEURAL_WAVEFRONT,
        "reference": RenderMode.REFERENCE_RAYMARCH,
        "gradient": RenderMode.NEURAL_WAVEFRONT_GRADIENT
        if args.load else RenderMode.REFERENCE_GRADIENT,
        "ssh": RenderMode.NEURAL_WAVEFRONT_SSH
        if args.load else RenderMode.REFERENCE_SSH,
        "pathtrace": RenderMode.PATHTRACE_DECODED
        if args.load else RenderMode.PATHTRACE_REFERENCE,
        "pathtrace-neural": RenderMode.PATHTRACE_NEURAL,
        "pathtrace-reference": RenderMode.PATHTRACE_REFERENCE,
        "isosurface": RenderMode.ISOSURFACE_DECODED
        if args.load else RenderMode.ISOSURFACE_REFERENCE,
        "isosurface-reference": RenderMode.ISOSURFACE_REFERENCE,
    }[args.mode]

    if args.timestep and simple is not None:
        print(f"[vnr] timestep {args.timestep}/{simple.num_timesteps}")
        simple.set_current_timestep(args.timestep)

    r = VNRenderer(subject, width=args.size, height=args.size, mode=mode,
                   streaming_cache=args.streaming_cache)
    info = r.streaming_cache_info
    if info["quality"] != "n/a":
        print(f"[vnr] streaming cache: {info}")
    if args.sampling_rate != 1.0:
        r.set_volume_sampling_rate(args.sampling_rate)
    if args.density_scale != 1.0:
        r.set_volume_density_scale(args.density_scale)
    r.set_denoiser(args.denoise)
    if args.isovalue != 0.5:
        r.set_isovalue(args.isovalue)
    if mode == RenderMode.DECODED_SLAB:
        if args.slab_shading != "none":
            r.set_slab_shading(args.slab_shading)
        if args.shadows:
            r.enable_shadows()
    center0, up0, fovy0 = (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 45.0
    if args.camera:
        eye0 = tuple(args.camera)
        r.set_camera(Camera(eye=eye0, center=center0, up=up0, fovy=fovy0))
    elif simple is None or simple.camera_cfg is None:
        d = max(dims)
        eye0 = (0.15 * d, 0.1 * d, -2.0 * d)
        r.set_camera(Camera(eye=eye0, center=center0, up=up0, fovy=fovy0))
    else:
        c = simple.camera_cfg
        eye0, center0, up0, fovy0 = tuple(c.eye), tuple(c.center), tuple(c.up), c.fovy

    def orbit_camera(i: int) -> Camera:
        """Camera rotated around the +y axis through the look-at center by
        2πi/num_frames (drag-orbit analog for headless benchmarking)."""
        import math

        a = 2.0 * math.pi * i / max(args.num_frames, 1)
        x, y, z = (eye0[0] - center0[0], eye0[1] - center0[1],
                   eye0[2] - center0[2])
        eye = (center0[0] + x * math.cos(a) + z * math.sin(a),
               center0[1] + y,
               center0[2] - x * math.sin(a) + z * math.cos(a))
        return Camera(eye=eye, center=center0, up=up0, fovy=fovy0)

    print(f"[vnr] mode {args.mode}, {args.size}x{args.size}, "
          f"device {jax.devices()[0]}")
    for _ in range(args.warmup):
        r.render()
    if getattr(r._impl, "_frame", None) is not None:
        _ = float(r._impl._frame.ravel()[0])  # device fence (scalar xfer)

    logger = CsvLogger(args.fps_log, ["frame", "fps"])
    t_total = 0.0
    import contextlib

    from instantvnr_tpu.utils.profiling import trace

    prof = trace(args.profile) if args.profile else contextlib.nullcontext()
    with prof:
        for i in range(args.num_frames):
            t0 = time.time()
            if args.orbit:
                r.set_camera(orbit_camera(i))
            r.render()
            _ = float(r._impl._frame.ravel()[0])
            dt = time.time() - t0
            t_total += dt
            logger.log(i, 1.0 / dt)
    logger.close()
    if args.profile:
        print(f"[vnr] Xprof trace written to {args.profile}")

    fps = args.num_frames / t_total
    print(f"[vnr] {fps:.2f} fps average over {args.num_frames} frames")
    if args.output:
        save_png(r.mapframe(), args.output)
        print(f"[vnr] saved {args.output}")


if __name__ == "__main__":
    main()
