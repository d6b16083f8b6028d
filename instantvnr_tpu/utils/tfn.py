"""Transfer functions: piecewise-linear control points baked into dense LUTs.

Reference semantics (`raytracing.h:146-164` `sampleTransferFunction`):
value is clamped to `tfn.range`, normalized, then color and alpha are read
from nodal 1-D arrays with linear interpolation. The reference stores color
and alpha as separate arrays (serializer.cpp:196-210).

TPU design: bake control points into a dense LUT of size `resolution`
(default 1024) once on the host; per-sample lookup is then one gather + lerp
on the VPU. For the macrocell max-opacity update we also build a sparse-table
range-maximum structure over the alpha LUT so "max alpha over value range
[lo,hi]" is O(1) gathers per cell (the reference recomputes this per cell
with a shared-memory scan, macrocell.cu:153-193).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import TransferFunctionConfig


@dataclass(frozen=True)
class TransferFunction:
    """Device-side baked transfer function (pytree of arrays).

    Carries BOTH a dense LUT (for the range-max macrocell machinery) and the
    padded original control points (ctrl_*): piecewise-linear evaluation from
    control points is gather-free — essential on TPU, where a per-sample LUT
    lookup is a slow random gather (see classify_controls).
    """

    colors: jnp.ndarray  # [R, 3] float32
    alphas: jnp.ndarray  # [R] float32
    alpha_rmq: jnp.ndarray  # [K, R] sparse table: alpha_rmq[k, i] = max(alphas[i:i+2^k])
    range_lo: jnp.ndarray  # scalar, value-domain lower bound
    range_hi: jnp.ndarray  # scalar
    ctrl_x: jnp.ndarray  # [Kc] control positions in [0,1] (sorted, padded)
    ctrl_rgba: jnp.ndarray  # [Kc, 4] control colors+alpha

    @property
    def resolution(self) -> int:
        return self.colors.shape[0]

    def tree_flatten(self):  # pragma: no cover - pytree plumbing
        return (
            (self.colors, self.alphas, self.alpha_rmq, self.range_lo,
             self.range_hi, self.ctrl_x, self.ctrl_rgba),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):  # pragma: no cover
        return cls(*children)


import jax.tree_util  # noqa: E402

jax.tree_util.register_pytree_node(
    TransferFunction,
    TransferFunction.tree_flatten,
    TransferFunction.tree_unflatten,
)


def _interp_controls(points: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Piecewise-linear interpolation of [N, 1+C] control points at xs."""
    pos = points[:, 0]
    order = np.argsort(pos)
    pos = pos[order]
    vals = points[order, 1:]
    out = np.stack(
        [np.interp(xs, pos, vals[:, c]) for c in range(vals.shape[1])], axis=-1
    )
    return out


def build_alpha_rmq(alphas: np.ndarray) -> np.ndarray:
    """Sparse table for range-max queries over the alpha LUT.

    alpha_rmq[k, i] = max(alphas[i : i + 2^k]) (clamped at the end).
    Query max(alphas[lo:hi]) = max(rmq[k, lo], rmq[k, hi - 2^k]) with
    k = floor(log2(hi - lo)).
    """
    r = alphas.shape[0]
    n_levels = max(1, int(np.ceil(np.log2(r))) + 1)
    table = np.empty((n_levels, r), np.float32)
    table[0] = alphas
    for k in range(1, n_levels):
        half = 1 << (k - 1)
        shifted = np.concatenate([table[k - 1, half:], table[k - 1, -1:].repeat(half)])
        table[k] = np.maximum(table[k - 1], shifted)
    return table


def bake_transfer_function(
    cfg: TransferFunctionConfig, resolution: int = 1024
) -> TransferFunction:
    xs = np.linspace(0.0, 1.0, resolution).astype(np.float32)
    colors = _interp_controls(np.asarray(cfg.colors, np.float32), xs)
    alphas = _interp_controls(np.asarray(cfg.alphas, np.float32), xs)[:, 0]

    # merged control points: union of color and alpha knot positions, so one
    # padded [Kc] set evaluates both (gather-free classification)
    cpos = np.asarray([c[0] for c in cfg.colors], np.float32)
    apos = np.asarray([a[0] for a in cfg.alphas], np.float32)
    knots = np.unique(np.concatenate([cpos, apos, [0.0, 1.0]]))
    rgb_k = _interp_controls(np.asarray(cfg.colors, np.float32), knots)
    a_k = _interp_controls(np.asarray(cfg.alphas, np.float32), knots)[:, 0]
    ctrl = np.concatenate([rgb_k, a_k[:, None]], axis=-1)
    # pad to a fixed small power of two so jit signatures stay stable
    kc = 1 << max(2, int(np.ceil(np.log2(len(knots)))))
    pad = kc - len(knots)
    if pad:
        knots = np.concatenate([knots, np.full(pad, knots[-1])])
        ctrl = np.concatenate([ctrl, np.repeat(ctrl[-1:], pad, 0)])

    # RMQ majorant envelope: renderers classify EXACTLY from control points
    # (classify_controls), so the range-max table must upper-bound the true
    # piecewise-linear alpha over each bin — a nodal-sample table would miss
    # a narrow knot peak falling between LUT samples and hand the path
    # tracer a violated majorant. env[i] covers [xs[i], xs[i+1]]: both bin
    # endpoints plus every knot inside the bin.
    env = alphas.copy()
    env[:-1] = np.maximum(env[:-1], alphas[1:])
    a_knots = np.asarray(cfg.alphas, np.float32)
    kidx = np.clip((a_knots[:, 0] * (resolution - 1)).astype(np.int64),
                   0, resolution - 2)
    np.maximum.at(env, kidx, a_knots[:, 1])

    return TransferFunction(
        colors=jnp.asarray(colors, jnp.float32),
        alphas=jnp.asarray(alphas, jnp.float32),
        alpha_rmq=jnp.asarray(build_alpha_rmq(env)),
        range_lo=jnp.float32(cfg.range[0]),
        range_hi=jnp.float32(cfg.range[1]),
        ctrl_x=jnp.asarray(knots, jnp.float32),
        ctrl_rgba=jnp.asarray(ctrl, jnp.float32),
    )


def classify(tf: TransferFunction, values: jnp.ndarray):
    """Value → (rgb [..., 3], alpha [...]) with reference clamping semantics
    (`raytracing.h:148-157`): clamp to range, normalize, nodal lerp lookup."""
    v = (jnp.clip(values, tf.range_lo, tf.range_hi) - tf.range_lo) / jnp.maximum(
        tf.range_hi - tf.range_lo, 1e-20
    )
    r = tf.resolution
    x = v * (r - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 2)
    frac = x - i0.astype(jnp.float32)
    c0 = tf.colors[i0]
    c1 = tf.colors[i0 + 1]
    a0 = tf.alphas[i0]
    a1 = tf.alphas[i0 + 1]
    rgb = c0 + (c1 - c0) * frac[..., None]
    alpha = a0 + (a1 - a0) * frac
    return rgb, alpha


# beyond this many segments the unrolled chain loses to one LUT gather
# (compile size grows linearly in knots; the gather is knot-independent)
_CONTROLS_CROSSOVER = 64


def classify_controls(tf: TransferFunction, values: jnp.ndarray):
    """Gather-free classification: evaluate the piecewise-linear transfer
    function directly from its control points via the telescoping form

        f(v) = y₀ + Σᵢ (yᵢ₊₁ − yᵢ)·clip((v − xᵢ)/(xᵢ₊₁ − xᵢ), 0, 1)

    — Kc−1 fused clip/mul/adds per sample, pure VPU (a LUT lookup would be a
    random gather, ~10⁸/s on TPU; this sustains full vector rate). Exact for
    values covered by the control points (the dense-LUT path additionally
    quantizes to `resolution` bins). Returns (rgb [...,3], alpha [...]).

    Detailed transfer functions (many knots) cross over to the dense-LUT
    gather: the unrolled segment chain grows the traced program linearly in
    Kc and the VPU win fades, while the gather path is Kc-independent.
    """
    kc = tf.ctrl_x.shape[0]
    if kc - 1 > _CONTROLS_CROSSOVER:
        return classify(tf, values)
    v = (jnp.clip(values, tf.range_lo, tf.range_hi) - tf.range_lo) / jnp.maximum(
        tf.range_hi - tf.range_lo, 1e-20
    )
    x = tf.ctrl_x
    y = tf.ctrl_rgba  # [Kc, 4]
    kc = x.shape[0]
    acc = jnp.broadcast_to(y[0], v.shape + (4,)).astype(jnp.float32)
    for i in range(kc - 1):
        denom = jnp.maximum(x[i + 1] - x[i], 1e-12)
        t = jnp.clip((v - x[i]) / denom, 0.0, 1.0)
        acc = acc + t[..., None] * (y[i + 1] - y[i])
    return acc[..., :3], acc[..., 3]


def max_alpha_in_range(tf: TransferFunction, lo: jnp.ndarray, hi: jnp.ndarray):
    """Max alpha over the (normalized-to-range) value interval [lo, hi].

    Used for macrocell max-opacity (reference macrocell_max_opacity_kernel,
    macrocell.cu:153-193: scans the alpha array over the cell's value range).
    lo/hi are in DATA units; any shape. O(1) gathers via the sparse table.
    """
    r = tf.resolution
    denom = jnp.maximum(tf.range_hi - tf.range_lo, 1e-20)
    nlo = jnp.clip((lo - tf.range_lo) / denom, 0.0, 1.0)
    nhi = jnp.clip((hi - tf.range_lo) / denom, 0.0, 1.0)
    # Reference index rule (macrocell.cu:180-184): round to nearest LUT entry,
    # then widen by one on each side; clamp into [0, r-1].
    i0 = jnp.clip(
        jnp.floor(nlo * (r - 1) + 0.5).astype(jnp.int32) - 1, 0, r - 1
    )
    i1 = jnp.clip(
        jnp.floor(nhi * (r - 1) + 0.5).astype(jnp.int32) + 1, 0, r - 1
    )
    length = jnp.maximum(i1 - i0 + 1, 1)
    k = jnp.clip(
        jnp.floor(jnp.log2(length.astype(jnp.float32))).astype(jnp.int32),
        0,
        tf.alpha_rmq.shape[0] - 1,
    )
    left = tf.alpha_rmq[k, i0]
    right_start = jnp.maximum(i1 + 1 - (1 << k), 0)
    right = tf.alpha_rmq[k, right_start]
    out = jnp.maximum(left, right)
    return jnp.where(i1 >= i0, out, tf.alphas[jnp.clip(i0, 0, r - 1)])
