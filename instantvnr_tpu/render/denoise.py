"""Progressive-rendering denoiser — edge-preserving à-trous filter.

Capability counterpart of the reference's optional OptiX AI denoiser
(`renderer.h:231-234`, `renderer.cpp:117-121`), which post-filters the
accumulated path-traced frame. No OptiX on TPU, so this is the classic
à-trous wavelet filter (Dammertz et al.) driven by color + alpha edge
stopping: N passes of a 5×5 B3-spline kernel with exponentially growing
hole size, every tap a SHIFT (pad+slice) — pure VPU, no gathers, one jit.

Alpha acts as the edge guide (the only aux channel the volume renderer has
for free); color distance uses the running-mean estimate itself.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 1-D B3 spline kernel; the 2-D 5×5 kernel is its outer product
_B3 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped shift of [H, W, C] by (dy, dx)."""
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    out = jnp.pad(img, ((py0, py1), (px0, px1), (0, 0)), mode="edge")
    return out[py1 : py1 + h, px1 : px1 + w]


@partial(jax.jit, static_argnums=(1,))
def atrous_denoise(rgba: jnp.ndarray, n_iters: int = 4,
                   sigma_color: float = 0.8,
                   sigma_alpha: float = 0.35) -> jnp.ndarray:
    """rgba [H, W, 4] → denoised [H, W, 4]. All four channels are filtered
    jointly (silhouette speckle lives in alpha too — per-frame AA-jittered
    hit/miss); the edge-stopping weight uses the running estimate's own
    color + alpha distances, re-evaluated each à-trous level."""
    out = rgba

    for it in range(n_iters):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,))
        for iy in range(5):
            for ix in range(5):
                dy, dx = (iy - 2) * step, (ix - 2) * step
                k = float(_B3[iy] * _B3[ix])
                s = _shift2d(out, dy, dx)
                dc = jnp.sum((s[..., :3] - out[..., :3]) ** 2, axis=-1,
                             keepdims=True)
                da = (s[..., 3:] - out[..., 3:]) ** 2
                w = k * jnp.exp(-dc / (sigma_color**2)
                                - da / (sigma_alpha**2))
                acc = acc + w * s
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-8)
    return out
