"""Shared CLI helpers for the apps (reference `apps/cmdline.h`)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# INSTANTVNR_CPU=1 forces the CPU backend. This must happen through
# jax.config BEFORE the first backend use — on hosts where sitecustomize
# registers a TPU plugin at interpreter start, setting JAX_PLATFORMS in the
# environment is not honored (see CLAUDE.md).
if os.environ.get("INSTANTVNR_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for ALL apps, so a vnr_precompile run (or any
# earlier app process) warms the next one's first frame. Same default dir
# as vnr_precompile --cache-dir; VNR_CACHE_DIR= (empty) disables.
_cache_dir = os.environ.get("VNR_CACHE_DIR", "/tmp/jax_cache")
if _cache_dir:
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def add_volume_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("volume")
    g.add_argument("--scene", help="scene JSON (diva or vidi dialect)")
    g.add_argument("--synthetic",
                   choices=["vorts", "sphere", "noise", "tubes", "wavelet",
                            "xyz", "marschner-lobb"],
                   help="procedural volume instead of a scene file (grid "
                        "synthetics; with --sampling-mode analytic, the "
                        "ANALYTIC field trained with no in-core volume)")
    g.add_argument("--dims", type=int, nargs="+", default=[64],
                   help="synthetic volume dims (1 or 3 ints)")
    g.add_argument("--volume",
                   help=".vdb volume file (OpenVDB FloatGrid — the "
                        "reference's OpenVKL VDB source, data/vdb.py)")
    g.add_argument("--vdb-grid", default=None,
                   help="grid name inside the .vdb (default: the single "
                        "grid, or 'density')")


def add_model_args(p: argparse.ArgumentParser):
    g = p.add_argument_group("model")
    g.add_argument("--model", default=None,
                   help="model JSON (tcnn schema); default = reference schema")
    g.add_argument("--max-num-steps", type=int, default=1000,
                   help="training steps (batch_trainer.cpp:42 default)")
    g.add_argument("--batch", type=int, default=1 << 16)
    g.add_argument("--seed", type=int, default=0)


def load_simple_volume(args):
    from instantvnr_tpu.api import SimpleVolume

    if getattr(args, "volume", None):
        if not args.volume.endswith(".vdb"):
            raise SystemExit(
                f"--volume {args.volume}: only .vdb files are supported "
                "here (raw volumes need a scene JSON for dims/dtype)")
        from instantvnr_tpu.data.vdb import vdb_to_volume

        return SimpleVolume(
            vdb_to_volume(args.volume, getattr(args, "vdb_grid", None)))
    if args.scene:
        return SimpleVolume(args.scene)
    kind = args.synthetic or "vorts"
    d = args.dims
    dims = tuple(d * 3) if len(d) == 1 else tuple(d)
    return SimpleVolume.synthetic(dims=dims, kind=kind)


def load_model_config(args):
    from instantvnr_tpu.config import ModelConfig, load_model_config as load

    return load(args.model) if args.model else ModelConfig()


def framebuffer_to_u8(rgba):
    """rgba [H, W, 4] float framebuffer → uint8 image array (flipped to
    image convention: the framebuffer's row 0 is the bottom scanline).
    The one place the framebuffer→image conversion lives (save_png and the
    viewer's PNG encoder must agree)."""
    import numpy as np

    return (np.clip(rgba[::-1], 0, 1) * 255).astype(np.uint8)


def save_png(rgba, path: str):
    """rgba [H, W, 4] float → PNG file."""
    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        np.save(path + ".npy", rgba)
        return
    Image.fromarray(framebuffer_to_u8(rgba)).save(path)


class CsvLogger:
    """vidi::CsvLogger analog (training curves / frame timings)."""

    def __init__(self, path: str | None, header: list[str]):
        self.f = open(path, "w") if path else None
        if self.f:
            self.f.write(",".join(header) + "\n")

    def log(self, *values):
        if self.f:
            self.f.write(",".join(str(v) for v in values) + "\n")
            self.f.flush()

    def close(self):
        if self.f:
            self.f.close()
