"""vnr_precompile — populate the persistent JAX compile cache for a config.

Cold-start on a fresh host is dominated by XLA compilation of the
wavefront/path-tracer bucket-program families and the slab pipeline
(~1-4 min through a remote-compile link). This app traces and compiles
every program family the interactive apps dispatch, so the NEXT process
(viewer, vnr_cmd_render, bench) hits the persistent cache
(--cache-dir, default /tmp/jax_cache) and its first frame is warm.

The reference has no analog (CUDA kernels are AOT-compiled at build time);
this is the JAX-world equivalent of shipping compiled fatbins.

Usage:
  python apps/vnr_precompile.py --size 512 --dims 128 [--modes all]
  python apps/vnr_precompile.py --report   # time cold vs warm first frame
"""
from __future__ import annotations

import argparse
import sys
import time

from common import add_model_args, add_volume_args, load_model_config, \
    load_simple_volume  # noqa: F401  (path side effect first)

import jax


def log(*a):
    print("[precompile]", *a, file=sys.stderr, flush=True)


def precompile(size: int, simple, model_cfg, modes: list[str]) -> dict:
    """Compile the program families for frame size `size`. Returns
    {family: seconds}."""
    from instantvnr_tpu.api import NeuralVolume, RenderMode, VNRenderer

    nv = NeuralVolume(model_cfg, simple=simple,
                      train_batch=min(1 << 16, 1 << 14))
    nv.train(1)  # compiles the train-step program family (chunked)
    times = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        times[name] = time.time() - t0
        log(f"{name}: {times[name]:.1f}s")

    mode_map = {
        "slab": RenderMode.DECODED_SLAB,
        "wavefront": RenderMode.NEURAL_WAVEFRONT,
        "wavefront_exact": RenderMode.NEURAL_WAVEFRONT,
        "pathtrace": RenderMode.PATHTRACE_DECODED,
        "pathtrace_neural": RenderMode.PATHTRACE_NEURAL,
        "isosurface": RenderMode.ISOSURFACE_DECODED,
        "reference": RenderMode.REFERENCE_RAYMARCH,
    }
    if modes == ["all"]:
        modes = list(mode_map)

    for name in modes:
        mode = mode_map[name]
        if name == "wavefront_exact":
            # start from a cheap mode so the exact-policy switch doesn't
            # first build (then discard) the brick pool, and set_mode runs
            # exactly once for the target
            r = VNRenderer(nv, width=size, height=size,
                           mode=RenderMode.DECODED_SLAB)
            r.set_streaming_cache("none")
            r.set_mode(mode)
        else:
            r = VNRenderer(nv if mode != RenderMode.REFERENCE_RAYMARCH
                           else simple, width=size, height=size, mode=mode)
        if name in ("pathtrace", "pathtrace_neural"):
            import dataclasses

            r._impl.settings = dataclasses.replace(r._impl.settings,
                                                   compact=True)
        # warmup() compiles the whole bucket family in parallel where the
        # impl supports it; otherwise it renders one frame
        timed(name, lambda r=r: (r._impl.warmup()
                                 if hasattr(r._impl, "warmup")
                                 else r.render()))
        if name in ("wavefront", "wavefront_exact", "pathtrace",
                    "pathtrace_neural"):
            # also compile the FUSED whole-frame executable (VERDICT r4
            # #5): render until the recorded schedule repeats and the
            # background AOT compile lands in the persistent cache, so a
            # fresh session's fused path engages within one settle depth
            # instead of after ~1-2 min of background compiles
            timed(f"{name}-fused", lambda r=r: _warm_fused(r))
        del r
    return times


def _warm_fused(r, attempts: int = 4) -> bool:
    """Render until the fused whole-frame executable exists (its
    compilation then sits in the persistent cache keyed on the lowered
    program; schedules are camera+scene determined, so the default-camera
    executable is exactly what a fresh session needs first)."""
    from instantvnr_tpu.render.compaction import wait_fused_compiles

    impl = r._impl
    for _ in range(attempts):
        for _f in range(4):
            r.render()
        float(impl._frame.ravel()[0])
        wait_fused_compiles()
        if impl._sched_cache.get("fused_frames", 0):
            return True
    log("fused schedule never stabilized (frame too small for replay, "
        "or fused_replay disabled for this mode) — skipped")
    return False


def report(size: int, simple, model_cfg) -> None:
    """Time the first frame of each interactive mode with the CURRENT cache
    state (run once cold, then again after precompile to see the win)."""
    from instantvnr_tpu.api import NeuralVolume, RenderMode, VNRenderer

    nv = NeuralVolume(model_cfg, simple=simple,
                      train_batch=min(1 << 16, 1 << 14))
    nv.train(1)
    for name, mode in (("slab", RenderMode.DECODED_SLAB),
                       ("wavefront", RenderMode.NEURAL_WAVEFRONT)):
        t0 = time.time()
        r = VNRenderer(nv, width=size, height=size, mode=mode)
        r.render()
        f = r.mapframe()
        log(f"{name} first frame (incl. setup): {time.time() - t0:.2f}s "
            f"(sum {float(f.sum()):.1f})")
        del r


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_volume_args(p)
    add_model_args(p)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--modes", nargs="+", default=["all"],
                   help="program families to compile (default: all)")
    p.add_argument("--cache-dir", default="/tmp/jax_cache")
    p.add_argument("--cache-min-secs", type=float, default=0.1,
                   help="persist compiles above this duration (this is a "
                        "cache-priming tool, so the floor is low)")
    p.add_argument("--report", action="store_true",
                   help="time first frames with the current cache instead")
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      args.cache_min_secs)

    simple = load_simple_volume(args)
    model_cfg = load_model_config(args)
    t0 = time.time()
    if args.report:
        report(args.size, simple, model_cfg)
    else:
        precompile(args.size, simple, model_cfg, args.modes)
    log(f"total: {time.time() - t0:.1f}s (cache: {args.cache_dir})")


if __name__ == "__main__":
    main()
