"""Multi-resolution hash-grid encoding — pure-JAX reference implementation.

Semantics mirror tiny-cuda-nn's GridEncoding exactly, as re-derived from the
reference's in-shader decoder (`core/networks/tcnn_impl_decoder.cu:7-133`)
and tcnn's grid encoding:

- per-level scale:      scale_l = 2^(l·log2_s) · base_resolution − 1
- grid resolution:      res_l  = ceil(scale_l) + 1
- position fract:       x = p·scale + 0.5;  cell = floor(x);  w = x − cell
- level table size:     next_multiple(min(res_l³, 2^log2_hashmap_size), 8)
- dense levels use stride indexing; once res³ overflows the table the index is
  the prime-XOR hash  (x·1) ⊻ (y·2654435761) ⊻ (z·805459861)  mod table_size
- 8-corner trilinear blend of F features per level, concatenated over levels.

TPU-first design notes: all L levels' corner indices are computed together and
issued as ONE flat gather of [B, L·8, F] from a single flat [T, F] table —
XLA lowers this to a single fused gather, and its transpose (the training
backward) to a single scatter-add. The Pallas fused kernel
(`ops/pallas/hash_mlp.py`) is the fast path; this module is the semantic
ground truth it is tested against.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import EncodingConfig

_PRIMES = (1, 2654435761, 805459861)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class HashGridSpec:
    """Static (trace-time) description of the hash grid layout.

    `paired=True` selects the TPU-native cell-pair layout for HASHED
    levels (dense levels are identical): see the "paired-corner hashing"
    section below. Same entry count and parameter count as the tcnn
    layout; only the hashed-level addressing differs."""

    n_levels: int
    n_features: int
    log2_hashmap_size: int
    base_resolution: int
    per_level_scale: float
    paired: bool = False

    @classmethod
    def from_config(cls, cfg: EncodingConfig) -> "HashGridSpec":
        return cls(
            n_levels=cfg.n_levels,
            n_features=cfg.n_features_per_level,
            log2_hashmap_size=cfg.log2_hashmap_size,
            base_resolution=cfg.base_resolution,
            per_level_scale=cfg.per_level_scale,
            paired=getattr(cfg, "hash_variant", "tcnn") == "paired",
        )

    @property
    def scales(self) -> tuple[float, ...]:
        log2s = math.log2(self.per_level_scale)
        return tuple(
            2.0 ** (l * log2s) * self.base_resolution - 1.0
            for l in range(self.n_levels)
        )

    @property
    def resolutions(self) -> tuple[int, ...]:
        return tuple(int(math.ceil(s)) + 1 for s in self.scales)

    @property
    def level_sizes(self) -> tuple[int, ...]:
        cap = 1 << self.log2_hashmap_size
        return tuple(
            _next_multiple(min(r * r * r, cap), 8) for r in self.resolutions
        )

    @property
    def level_offsets(self) -> tuple[int, ...]:
        offs = [0]
        for s in self.level_sizes:
            offs.append(offs[-1] + s)
        return tuple(offs)

    @property
    def level_is_dense(self) -> tuple[bool, ...]:
        """Dense stride indexing applies while res³ fits the level's table
        (tcnn grid_index: hash only when the running stride exceeds it)."""
        return tuple(
            r * r * r <= s for r, s in zip(self.resolutions, self.level_sizes)
        )

    @property
    def n_entries(self) -> int:
        return self.level_offsets[-1]

    @property
    def n_params(self) -> int:
        return self.n_entries * self.n_features

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features


# The 8 corner offsets of a cell, shaped [8, 3] (x fastest, matching the
# reference's bit loop idx & (1<<dim), tcnn_impl_decoder.cu:101-118).
_CORNERS = np.array(
    [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.int32
)


def init_hash_table(key: jax.Array, spec: HashGridSpec,
                    dtype=jnp.float32) -> jnp.ndarray:
    """tcnn initializes hash grids uniform in [-1e-4, 1e-4]."""
    return jax.random.uniform(
        key, (spec.n_entries, spec.n_features), dtype=jnp.float32,
        minval=-1e-4, maxval=1e-4,
    ).astype(dtype)


# Pre-casting the f32 master table to the 16-bit compute dtype BEFORE the
# forward gather halves the gathered bytes at identical numerics (the cast
# commutes with the gather; the current path casts gathered rows anyway).
# Measured (scratch/precast_fwd.py, B=2^16 encode fwd, v5e): 2^19 schema
# 28.2 → 23.6 ms; 2^14 (cache-resident) neutral-to-negative, so the cast is
# gated on table footprint. Per-level split gathers measured WORSE (43.5 ms
# bf16 / 23.7 f32) — the footprint effect seen on random indices does not
# survive real corner indices, whose spatial locality already caches well.
_PRECAST_MIN_BYTES = 1 << 25  # 32 MB f32 — between the 2^14/2^19 schemas


def _precast_for_gather(table: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    dt = jnp.dtype(compute_dtype)
    if (dt.itemsize == 2 and table.dtype == jnp.float32
            and table.nbytes >= _PRECAST_MIN_BYTES):
        return table.astype(dt)
    return table


def corner_indices_and_weights(spec: HashGridSpec, coords: jnp.ndarray):
    """Compute flat table indices and trilinear weights for all levels.

    coords: [B, 3] in [0,1]³ (float32).
    Returns (indices [B, L·8] int32 into the flat table, weights [B, L·8]).
    This is the shared address-generation path for the pure-JAX forward, the
    XLA scatter-add backward, and the macrocell-style utilities.
    """
    assert not spec.paired, \
        "tcnn corner addressing is invalid for paired specs"
    b = coords.shape[0]
    idx_parts = []
    w_parts = []
    corners = jnp.asarray(_CORNERS)  # [8,3]
    for lvl in range(spec.n_levels):
        scale = spec.scales[lvl]
        res = spec.resolutions[lvl]
        size = spec.level_sizes[lvl]
        offset = spec.level_offsets[lvl]
        x = coords * jnp.float32(scale) + 0.5
        cell = jnp.floor(x)
        frac = x - cell
        cell = cell.astype(jnp.int32)  # [B,3]
        pos = cell[:, None, :] + corners[None, :, :]  # [B,8,3]
        if spec.level_is_dense[lvl]:
            idx = (
                pos[..., 0]
                + pos[..., 1] * np.int32(res)
                + pos[..., 2] * np.int32(res * res)
            ).astype(jnp.uint32)
        else:
            pu = pos.astype(jnp.uint32)
            idx = (
                pu[..., 0] * np.uint32(_PRIMES[0])
                ^ pu[..., 1] * np.uint32(_PRIMES[1])
                ^ pu[..., 2] * np.uint32(_PRIMES[2])
            )
        idx = (idx % np.uint32(size)).astype(jnp.int32) + np.int32(offset)
        # trilinear weight of each corner
        cw = jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :],
                       frac[:, None, :])
        w = cw[..., 0] * cw[..., 1] * cw[..., 2]  # [B,8]
        idx_parts.append(idx)
        w_parts.append(w)
    indices = jnp.concatenate(idx_parts, axis=1)  # [B, L*8]
    weights = jnp.concatenate(w_parts, axis=1)
    return indices.reshape(b, -1), weights.reshape(b, -1)


def level_param_arrays(spec: HashGridSpec):
    """Per-level static parameters as ARRAYS, for SPMD paths where different
    shards own different levels (tensor parallelism over levels): the same
    traced program runs on every shard, so per-level constants must be data.

    Returns dict of [L] arrays: scale f32, size u32, offset i32 (into the
    flat table), res u32, dense bool.
    """
    assert not spec.paired, (
        "tensor-parallel level sharding uses tcnn addressing; the paired "
        "hash variant is single-shard (DP/EP) only for now")
    return {
        "scale": jnp.asarray(spec.scales, jnp.float32),
        "size": jnp.asarray(spec.level_sizes, jnp.uint32),
        "offset": jnp.asarray(spec.level_offsets[:-1], jnp.int32),
        "res": jnp.asarray(spec.resolutions, jnp.uint32),
        "dense": jnp.asarray(spec.level_is_dense, jnp.bool_),
    }


def hash_encode_traced(table: jnp.ndarray, coords: jnp.ndarray,
                       level_params: dict, n_levels: int, n_features: int,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """hash_encode with per-level parameters as traced scalars.

    Semantically identical to `hash_encode` (validated by tests); the dense
    stride index is computed in uint32 (wraps harmlessly when the level is
    actually hashed) and selected per level at runtime. Used by the
    tensor-parallel path where each model shard encodes its own level slice.
    """
    b = coords.shape[0]
    feats_out = []
    for lvl in range(n_levels):
        idx_local, w = _traced_level_corners(coords, level_params, lvl)
        idx = idx_local + level_params["offset"][lvl]
        f = table[idx].astype(compute_dtype) * w.astype(compute_dtype)[..., None]
        feats_out.append(f.sum(axis=1))  # [B, F]
    return jnp.concatenate(feats_out, axis=1).reshape(b, n_levels * n_features)


def _traced_level_corners(coords, level_params, lvl):
    """Per-level corner indices (LOCAL, pre-offset, int32 in [0, size)) and
    trilinear weights (f32) with all level parameters traced — shared by the
    traced forward and the split-grad backward."""
    corners = jnp.asarray(_CORNERS)
    scale = level_params["scale"][lvl]
    size = level_params["size"][lvl]
    res = level_params["res"][lvl]
    dense = level_params["dense"][lvl]

    x = coords * scale + 0.5
    cell = jnp.floor(x)
    frac = x - cell
    pos = cell.astype(jnp.int32)[:, None, :] + corners[None, :, :]
    pu = pos.astype(jnp.uint32)
    idx_dense = pu[..., 0] + pu[..., 1] * res + pu[..., 2] * res * res
    idx_hash = (
        pu[..., 0] * np.uint32(_PRIMES[0])
        ^ pu[..., 1] * np.uint32(_PRIMES[1])
        ^ pu[..., 2] * np.uint32(_PRIMES[2])
    )
    idx = jnp.where(dense, idx_dense, idx_hash)
    idx = (idx % size).astype(jnp.int32)
    cw = jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :],
                   frac[:, None, :])
    w = cw[..., 0] * cw[..., 1] * cw[..., 2]
    return idx, w


_TRACED_SPLIT_CACHE: dict = {}


def hash_encode_traced_splitgrad(table, coords, level_params,
                                 level_caps: tuple, n_features: int,
                                 compute_dtype=jnp.float32):
    """`hash_encode_traced` with a PER-LEVEL-scatter backward.

    XLA scatter-add cost scales with the operand size (CLAUDE.md measured
    rule: "never fuse level scatters into one concatenated table"), but
    autodiff of the traced forward emits one scatter per level each into
    the WHOLE [E_max, F] shard table — ~n_levels× the necessary cost on the
    big-table shards TP exists for. Here each level scatters into a
    [cap_l, F] buffer (cap_l = static per-local-level size bound, max
    across shards) that is added back into its slice of the table gradient.
    """
    key = (tuple(level_caps), n_features, jnp.dtype(compute_dtype).name)
    fn = _TRACED_SPLIT_CACHE.get(key)
    if fn is None:
        fn = _TRACED_SPLIT_CACHE[key] = _make_traced_splitgrad(
            tuple(level_caps), n_features, compute_dtype)
    return fn(table, coords, level_params)


def _make_traced_splitgrad(level_caps: tuple, n_features: int, compute_dtype):
    n_levels = len(level_caps)

    @jax.custom_vjp
    def encode(table, coords, lp):
        return hash_encode_traced(table, coords, lp, n_levels, n_features,
                                  compute_dtype)

    def fwd(table, coords, lp):
        return encode(table, coords, lp), (table, coords, lp)

    def bwd(res_, g):
        table, coords, lp = res_
        b = coords.shape[0]
        e_max = table.shape[0]
        g = g.astype(jnp.float32).reshape(b, n_levels, n_features)
        # pad so every [offset_l, offset_l + cap_l) window fits without
        # dynamic_slice clamping (offset_l ≤ e_max − size_l, cap_l ≤ pad)
        pad = max(level_caps)
        buf = jnp.zeros((e_max + pad, n_features), jnp.float32)
        for l in range(n_levels):
            idx_local, w = _traced_level_corners(coords, lp, l)
            upd = (w[..., None] * g[:, l, None, :]).reshape(-1, n_features)
            cap = level_caps[l]
            # f16 accumulation on big levels, like the splat backward
            # (tcnn __half atomics; bf16's 8-bit mantissa measurably hurts)
            acc_dt = jnp.float16 if cap >= (1 << 17) else jnp.float32
            sl = jnp.zeros((cap, n_features), acc_dt)
            sl = sl.at[idx_local.reshape(-1)].add(upd.astype(acc_dt))
            off = lp["offset"][l]
            win = jax.lax.dynamic_slice(buf, (off, 0), (cap, n_features))
            buf = jax.lax.dynamic_update_slice(
                buf, win + sl.astype(jnp.float32), (off, 0))
        g_table = buf[:e_max].astype(table.dtype)
        # coords/level_params cotangents unused by TP training
        return g_table, None, None

    encode.defvjp(fwd, bwd)
    return encode


def hash_encode(table: jnp.ndarray, coords: jnp.ndarray,
                spec: HashGridSpec, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Encode [B,3] coords → [B, L·F] features.

    One fused gather for all levels; differentiable w.r.t. `table` (XLA emits
    a single scatter-add in the backward — the reference path's equivalent of
    tcnn's grid-gradient kernel). Paired specs route to the cell-pair
    forward (also one fused gather, of wider rows).
    """
    if spec.paired:
        return hash_encode_paired(table, coords, spec, compute_dtype)
    b = coords.shape[0]
    indices, weights = corner_indices_and_weights(spec, coords)
    feats = _precast_for_gather(table, compute_dtype)[indices]  # one gather
    feats = feats.astype(compute_dtype) * weights.astype(compute_dtype)[..., None]
    feats = feats.reshape(b, spec.n_levels, 8, spec.n_features).sum(axis=2)
    return feats.reshape(b, spec.n_levels * spec.n_features)


# ---------------------------------------------------------------------------
# Paired-corner hashing — the TPU-native hashed-level layout
#
# The gather wall: v5e row gathers are issue/footprint-bound (~6 ns/row
# bf16-precast with real corner indices, ~13 ns historical f32 figure —
# NOTES_ROUND1/5), so the tcnn layout's 8 corner rows per hashed level per
# sample set the price of both training forward and exact-network
# rendering. Row gathers being width-flat suggests packing corners into
# wider rows — which packed_dense_tables does for DENSE levels (corners
# sit at fixed strides). Hashed levels scatter the 8 corners to unrelated
# entries, so the tcnn layout cannot be packed by rearrangement.
#
# The paired layout changes the KEY instead (VERDICT r3 #2): a hashed
# level's [S, F] entries are viewed as [S/2, 2F] pair-rows, and the row
# for a cell's x-adjacent corner pair (cx, cx+1) at (y, z) is
#
#     row = (cx·1 ⊻ y·P2 ⊻ z·P3) mod (S/2)        (hash of the CELL x)
#
# with the two x-corners in the row's two F-wide halves. Every cell needs
# only its 4 (y,z) corner combinations → 4 row-gathers/level instead
# of 8. Same parameter count.
#
# Semantics trade-off (why this is a VARIANT, not the default): each grid
# point now has TWO stored entries — as the right corner of cell x−1 and
# the left corner of cell x — trained by disjoint sample populations, so
# the encoding may be discontinuous across x cell faces where the copies
# disagree (both converge to the local field, so the gap is small); and
# cells collide at 2·R³/S instead of points at R³/S. Training-quality
# parity is pinned by test (tests/test_paired_hash.py); the layout is NOT
# tcnn-BSON-interoperable (native .npz checkpoints carry it).
# ---------------------------------------------------------------------------

_YZ_CORNERS = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.int32)  # (by,bz)


def _level_cell_frac(spec: HashGridSpec, lvl: int, coords: jnp.ndarray):
    x = coords * jnp.float32(spec.scales[lvl]) + 0.5
    cell = jnp.floor(x)
    return cell.astype(jnp.int32), x - cell


def _dense_level_corners(spec: HashGridSpec, lvl: int, coords: jnp.ndarray):
    """One dense level's LOCAL entry indices [B,8] + trilinear weights
    [B,8] (tcnn stride addressing — identical for both hash variants)."""
    res = spec.resolutions[lvl]
    size = spec.level_sizes[lvl]
    corners = jnp.asarray(_CORNERS)
    cell, frac = _level_cell_frac(spec, lvl, coords)
    pos = cell[:, None, :] + corners[None, :, :]
    idx = (pos[..., 0] + pos[..., 1] * np.int32(res)
           + pos[..., 2] * np.int32(res * res)).astype(jnp.uint32)
    idx = (idx % np.uint32(size)).astype(jnp.int32)
    cw = jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :],
                   frac[:, None, :])
    return idx, cw[..., 0] * cw[..., 1] * cw[..., 2]


def _paired_level_rows(spec: HashGridSpec, lvl: int, coords: jnp.ndarray):
    """One hashed level's LOCAL pair-row indices [B,4] (into the level's
    [S/2, 2F] view) + per-half weights [B,4,2].

    The pairing AXIS alternates per level (x, y, z, x, ...): any copy
    disagreement shows as a discontinuity only across that axis's cell
    faces, so alternating keeps the artifact from stacking coherently on
    one axis across all hashed levels (measured worth ~0.4 dB at the
    parity-test config vs all-x)."""
    size = spec.level_sizes[lvl]
    assert size % 2 == 0
    a = lvl % 3  # pairing axis
    o1, o2 = (a + 1) % 3, (a + 2) % 3
    yz = jnp.asarray(_YZ_CORNERS)
    cell, frac = _level_cell_frac(spec, lvl, coords)
    ca = cell[:, a : a + 1].astype(jnp.uint32)  # the CELL coord — pair key
    p1 = (cell[:, o1 : o1 + 1] + yz[None, :, 0]).astype(jnp.uint32)
    p2 = (cell[:, o2 : o2 + 1] + yz[None, :, 1]).astype(jnp.uint32)
    h = (ca * np.uint32(_PRIMES[0])
         ^ p1 * np.uint32(_PRIMES[1])
         ^ p2 * np.uint32(_PRIMES[2]))
    rows = (h % np.uint32(size // 2)).astype(jnp.int32)  # [B,4]
    fa, f1, f2 = frac[:, a], frac[:, o1], frac[:, o2]
    w12 = (jnp.where(yz[None, :, 0] == 0, (1.0 - f1)[:, None], f1[:, None])
           * jnp.where(yz[None, :, 1] == 0, (1.0 - f2)[:, None],
                       f2[:, None]))  # [B,4]
    w2 = jnp.stack([w12 * (1.0 - fa)[:, None], w12 * fa[:, None]], axis=-1)
    return rows, w2


def paired_rows_and_weights(spec: HashGridSpec, coords: jnp.ndarray,
                            levels=None):
    """Unified pair-row addressing over the [T/2, 2F] table view.

    Dense levels contribute their 8 corner entries as (entry>>1) rows with
    the weight on the (entry&1) half; hashed levels contribute 4 pair-rows
    with both halves weighted — ONE fused gather serves them all.
    Returns (rows [B, R] int32 global pair-rows, w2 [B, R, 2] f32,
    counts: static per-level row counts)."""
    rows_parts, w_parts, counts = [], [], []
    for lvl in (range(spec.n_levels) if levels is None else levels):
        offset = spec.level_offsets[lvl]
        assert offset % 2 == 0
        if spec.level_is_dense[lvl]:
            idx, w = _dense_level_corners(spec, lvl, coords)
            e = idx + np.int32(offset)
            rows_parts.append(e >> 1)
            half = (e & 1).astype(jnp.float32)
            w_parts.append(jnp.stack([w * (1.0 - half), w * half], axis=-1))
            counts.append(8)
        else:
            rows, w2 = _paired_level_rows(spec, lvl, coords)
            rows_parts.append(rows + np.int32(offset >> 1))
            w_parts.append(w2)
            counts.append(4)
    return (jnp.concatenate(rows_parts, axis=1),
            jnp.concatenate(w_parts, axis=1), tuple(counts))


def paired_corner_indices_and_weights(spec: HashGridSpec,
                                      coords: jnp.ndarray):
    """PAIRED-layout per-corner addressing: ([B, L·8] int32 flat ENTRY
    indices, [B, L·8] trilinear weights) — the narrow-row presentation of
    the pair layout. Hashed-level corner (yz, half) lives at entry
    offset + 2·pair_row + half; dense levels are tcnn stride entries.

    Why narrow rows: the wide [S/2, 2F] row gather measured ~23 ns/row vs
    ~14-15 for 8-wide rows at multi-MB tables (scratch/gather_width.py —
    v5e gathers are NOT width-flat past 8 f32 lanes at this footprint),
    so 4 wide rows LOSE to 8 narrow ones in the forward. The pair layout
    still wins in the BACKWARD, where the scatter's update count (not
    row width) sets the cost."""
    b = coords.shape[0]
    idx_parts, w_parts = [], []
    for lvl in range(spec.n_levels):
        offset = spec.level_offsets[lvl]
        if spec.level_is_dense[lvl]:
            idx, w = _dense_level_corners(spec, lvl, coords)
            idx_parts.append(idx + np.int32(offset))
            w_parts.append(w)
        else:
            rows, w2 = _paired_level_rows(spec, lvl, coords)
            e = np.int32(offset) + 2 * rows  # [B,4] left-entry indices
            idx_parts.append(jnp.stack([e, e + 1], axis=-1).reshape(b, 8))
            w_parts.append(w2.reshape(b, 8))
    return (jnp.concatenate(idx_parts, axis=1),
            jnp.concatenate(w_parts, axis=1))


def hash_encode_paired(table: jnp.ndarray, coords: jnp.ndarray,
                       spec: HashGridSpec,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """Paired-layout encode: [B,3] → [B, L·F], one fused [B, L·8] gather
    of narrow rows (same gather shape/cost as the tcnn layout — the
    paired win is the halved-update backward scatter, see
    paired_corner_indices_and_weights)."""
    b = coords.shape[0]
    indices, weights = paired_corner_indices_and_weights(spec, coords)
    feats = _precast_for_gather(table, compute_dtype)[indices]  # one gather
    feats = (feats.astype(compute_dtype)
             * weights.astype(compute_dtype)[..., None])
    feats = feats.reshape(b, spec.n_levels, 8, spec.n_features).sum(axis=2)
    return feats.reshape(b, spec.n_levels * spec.n_features)


def hash_encode_paired_wide(table: jnp.ndarray, coords: jnp.ndarray,
                            spec: HashGridSpec,
                            compute_dtype=jnp.float32) -> jnp.ndarray:
    """The wide-row formulation (one fused [B, R] gather of 2F rows,
    R = 8·dense + 4·hashed). Measured SLOWER than the narrow form on v5e
    (30.6 vs 20-24 ms at 2^19 — wide rows are not width-flat); kept as
    the semantic cross-check the parity tests pin against."""
    b = coords.shape[0]
    f_ = spec.n_features
    rows, w2, counts = paired_rows_and_weights(spec, coords)
    view = table.reshape(-1, 2 * f_)
    g = view[rows].astype(compute_dtype)  # [B, R, 2F] — one gather
    g = g.reshape(b, -1, 2, f_) * w2.astype(compute_dtype)[..., None]
    per_row = g.sum(axis=2)  # [B, R, F]
    feats, s = [], 0
    for c in counts:
        feats.append(per_row[:, s:s + c].sum(axis=1))
        s += c
    return jnp.concatenate(feats, axis=1)


# ---------------------------------------------------------------------------
# Inference fast path: corner-packed dense levels
#
# The per-row cost of an XLA gather on v5e is FLAT in row width (measured
# 7.5-16 ns/row from 8 through 128 lanes, scratch/packed_gather.py), so for
# DENSE levels — whose 8 trilinear corner rows sit at fixed linear offsets
# {0,1,R,R+1,R²,R²+1,R²+R,R²+R+1} from the cell's min-corner index — packing
# those 8 rows into ONE [size, 8F] row turns 8 gathers/sample/level into 1.
# jnp.roll reproduces tcnn's `% size` wrap (including the out-of-row aliasing
# of +1 corners at cell == R−1) exactly. Measured (B=2^16, encode+MLP):
#   2^19 schema (3/8 levels dense): 29.2 → 22.7 ms bf16  (1.29×)
#   2^14 schema (1/8 dense):        neutral (13.1 → 13.9 ms f32)
# so the packed path is used only for big schemas (see render_params).
# ---------------------------------------------------------------------------


def packed_dense_tables(table: jnp.ndarray, spec: HashGridSpec) -> dict:
    """Build [size, 8F] corner-packed companion tables for the dense levels.

    Returns {str(level): array} (string keys keep the params pytree sortable).
    Cheap (8 rolled copies per dense level — pure bandwidth); rebuild whenever
    the master table changes (once per render-params refresh).
    """
    packed = {}
    for l in range(spec.n_levels):
        if not spec.level_is_dense[l]:
            continue
        res, size = spec.resolutions[l], spec.level_sizes[l]
        sub = jax.lax.dynamic_slice_in_dim(table, spec.level_offsets[l], size)
        offs = [int(c[0] + c[1] * res + c[2] * res * res) for c in _CORNERS]
        packed[str(l)] = jnp.concatenate(
            [jnp.roll(sub, -o, axis=0) for o in offs], axis=1)
    return packed


def hash_encode_packed(table: jnp.ndarray, packed: dict, coords: jnp.ndarray,
                       spec: HashGridSpec,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """`hash_encode` with corner-packed dense levels: one [size, 8F]-row
    gather per dense level, one fused [B, H·8] gather for the hashed levels
    (H·4 pair-rows under the paired variant).
    Forward-only (inference paths; training keeps `hash_encode_splat`).
    Exactly equal to `hash_encode` up to summation order (tested)."""
    if spec.paired:
        return _hash_encode_packed_paired(table, packed, coords, spec,
                                          compute_dtype)
    b = coords.shape[0]
    indices, weights = corner_indices_and_weights(spec, coords)
    iw = indices.reshape(b, spec.n_levels, 8)
    ww = weights.reshape(b, spec.n_levels, 8).astype(compute_dtype)
    feats = [None] * spec.n_levels
    hashed = [l for l in range(spec.n_levels) if str(l) not in packed]
    for l in range(spec.n_levels):
        if str(l) in packed:
            # corner 0 is the min-corner: x,y,z ≤ R−1 ⇒ index < R³ ≤ size,
            # so the base needs no wrap; the rolls carry the corner wraps
            base = iw[:, l, 0] - spec.level_offsets[l]
            f = packed[str(l)][base].reshape(
                b, 8, spec.n_features).astype(compute_dtype)
            feats[l] = (f * ww[:, l, :, None]).sum(1)
    if hashed:
        hsel = jnp.asarray(hashed, jnp.int32)
        hi = iw[:, hsel, :].reshape(b, -1)
        hw = ww[:, hsel, :].reshape(b, -1)
        f = table[hi].astype(compute_dtype) * hw[..., None]
        f = f.reshape(b, len(hashed), 8, spec.n_features).sum(2)
        for j, l in enumerate(hashed):
            feats[l] = f[:, j]
    return jnp.concatenate(feats, axis=1)


def _hash_encode_packed_paired(table, packed: dict, coords, spec,
                               compute_dtype):
    """Packed-dense + paired-hashed inference forward: dense levels with a
    companion table gather ONE 8F row; the remaining levels share ONE
    fused narrow per-corner gather (paired_corner_indices_and_weights —
    wide pair rows measured slower)."""
    b = coords.shape[0]
    f_ = spec.n_features
    feats = [None] * spec.n_levels
    rest = []
    for l in range(spec.n_levels):
        if str(l) in packed:
            idx, w = _dense_level_corners(spec, l, coords)
            base = idx[:, 0]  # min-corner needs no wrap (see tcnn path)
            f = packed[str(l)][base].reshape(b, 8, f_).astype(compute_dtype)
            feats[l] = (f * w.astype(compute_dtype)[..., None]).sum(1)
        else:
            rest.append(l)
    if rest:
        idx_parts, w_parts = [], []
        for l in rest:
            offset = spec.level_offsets[l]
            if spec.level_is_dense[l]:
                idx, w = _dense_level_corners(spec, l, coords)
                idx_parts.append(idx + np.int32(offset))
                w_parts.append(w)
            else:
                rows, w2 = _paired_level_rows(spec, l, coords)
                e = np.int32(offset) + 2 * rows
                idx_parts.append(
                    jnp.stack([e, e + 1], axis=-1).reshape(b, 8))
                w_parts.append(w2.reshape(b, 8))
        hi = jnp.concatenate(idx_parts, axis=1)
        hw = jnp.concatenate(w_parts, axis=1).astype(compute_dtype)
        f = table[hi].astype(compute_dtype) * hw[..., None]
        f = f.reshape(b, len(rest), 8, f_).sum(2)
        for j, l in enumerate(rest):
            feats[l] = f[:, j]
    return jnp.concatenate(feats, axis=1)


# ---------------------------------------------------------------------------
# Training backward: dense-level separable splatting
#
# XLA's scatter-add on v5e costs ≈ ∝ (updates × table entries) — it is the
# training bottleneck (NOTES_ROUND1). For DENSE levels the gradient
#   dT[e,f] = Σ_n Σ_c w_c(n) [idx_c(n)=e] g(n,f),  idx = x + y·R + z·R²
# factorizes into per-axis two-nonzero weight matrices, so it is computable
# as one reassociated matmul + carry-folds with NO scatter; only the hashed
# levels keep a (smaller) scatter. Measured on v5e, B=2^16
# (scratch/splat_proto.py):
#   encode-only backward, scatter → splat:
#     log2_hashmap 14:  84 → 82 ms   (1.02×, one dense level)
#     log2_hashmap 16: 405 → 182 ms  (2.23×)
#     log2_hashmap 19: 407 → 281 ms  (1.45×; B=2^18: 1607 → 1118 ms)
#   full train step (fwd+bwd+Adam), plain scatter → splat+per-level
#   (+f16 accumulation for levels ≥ 2^17 entries):
#     log2_hashmap 14:  86 → 55.8 ms/step  (0.76 → 1.17 Msamples/s)
#     log2_hashmap 16: 285 → 91.8 ms/step  (0.23 → 0.71 Msamples/s)
#     log2_hashmap 19: 295 → 125.5 ms/step (0.22 → 0.52 Msamples/s)
# Max grad deviation vs the autodiff backward: ~6e-4 relative (f32
# accumulation order only). bf16 intermediates measured SLOWER (241 ms at
# 2^16) — the chain stays f32.
# ---------------------------------------------------------------------------


def _dense_level_grad_splat(spec: HashGridSpec, lvl: int, coords: jnp.ndarray,
                            g_lvl: jnp.ndarray) -> jnp.ndarray:
    """Gradient of one dense level via separable splatting → [size, F].

    Reproduces tcnn's dense indexing exactly, including the out-of-row
    aliasing of +1 corners at cell == R−1 (idx = x + y·R + z·R² with x,y,z up
    to R) and the final % size wrap: the (R+1)³ extended-grid gradient is
    folded back by linear-index carries (strided-slice adds, no scatter).
    Assumes coords ∈ [0,1] (training batches are uniform draws).
    """
    res = spec.resolutions[lvl]
    size = spec.level_sizes[lvl]
    f_ = spec.n_features
    r1 = res + 1

    x = coords * jnp.float32(spec.scales[lvl]) + 0.5
    cell = jnp.floor(x)
    frac = (x - cell).astype(jnp.float32)
    cell = cell.astype(jnp.int32)
    iota = jnp.arange(r1, dtype=jnp.int32)

    def axis_w(a):  # [B, R+1], two nonzeros per row
        c = cell[:, a : a + 1]
        f = frac[:, a : a + 1]
        return (jnp.where(iota[None, :] == c, 1.0 - f, 0.0)
                + jnp.where(iota[None, :] == c + 1, f, 0.0))

    wx, wy, wz = axis_w(0), axis_w(1), axis_w(2)
    # reassociated contraction: grad[zyxf] = Σ_n (wz⊗wy)[n,zy]·(wx⊗g)[n,xf]
    # — ONE [zy, n]@[n, xf] matmul, 2·B·R²·(R·F) flops (the naive 4-factor
    # einsum is R²/F× more; XLA does not reliably reassociate it)
    b = coords.shape[0]
    a_zy = (wz[:, :, None] * wy[:, None, :]).reshape(b, r1 * r1)
    b_xf = (wx[:, :, None] * g_lvl[:, None, :]).reshape(b, r1 * f_)
    # HIGHEST: TPU matmuls default to bf16 passes; quantizing the dense-level
    # gradients costs ~1.5 dB converged PSNR (measured, 150 steps @2^14).
    # K-CHUNKED (r5): the one-shot HIGHEST dot at K=2^16 returned
    # full-magnitude WRONG entries on v5e (float64-oracle check,
    # scratch/splat_matmul_bug.py — a contraction-dim lowering fault; exact
    # at K<=8192 and on CPU at any K), so the contraction accumulates over
    # <=8192-row chunks, which the oracle verifies exact.
    grad = jnp.zeros((r1 * r1, r1 * f_), jnp.float32)
    for i in range(0, b, _SPLAT_KCHUNK):
        grad = grad + jnp.dot(
            a_zy[i:i + _SPLAT_KCHUNK].T, b_xf[i:i + _SPLAT_KCHUNK],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [zy, xf]
    grad = grad.reshape(r1, r1, r1, f_)

    # fold x-carry: partial index m = x + R·y; x==R lands on row y+1's x==0
    main = grad[:, :, :res, :].reshape(r1, res * r1, f_)
    fold1 = jnp.concatenate([main, jnp.zeros((r1, 1, f_), grad.dtype)], 1)
    fold1 = fold1.at[:, res::res].add(grad[:, :, res, :])

    # fold y-carry: flat = m + R²·z; z blocks (length R²+R+1, stride R²)
    # overlap by R+1 — overlap-add via pad+reshape
    ny = res * res
    main2 = fold1[:, :ny, :].reshape(r1 * ny, f_)
    tails = fold1[:, ny:, :]  # [r1, R+1, F] → head of block z+1
    tt = jnp.concatenate(
        [tails, jnp.zeros((r1, ny - (res + 1), f_), grad.dtype)],
        axis=1).reshape(r1 * ny, f_)
    out_len = ny * res + ny + res + 1  # R³+R²+R+1
    fold2 = jnp.zeros((out_len, f_), grad.dtype)
    fold2 = fold2.at[: r1 * ny].add(main2)
    fold2 = fold2.at[ny:].add(tt[: out_len - ny])

    # wrap indices ≥ size (the % size in the address path)
    if out_len > size:
        head = fold2[:size]
        wrap = fold2[size:]
        return head.at[: wrap.shape[0]].add(wrap)
    return jnp.concatenate(
        [fold2, jnp.zeros((size - out_len, f_), fold2.dtype)])


# Dense-level backward crossover (measured v5e, B=2^16, scratch/
# dense_bwd_alt.py r5): the separable splat's reassociated matmul grows
# ∝ res³ while a plain per-level scatter-add stays ~flat in table size
# (updates-bound) — res 16: 4.6 ms splat / 7.4 scatter; res 32: 10.9 /
# 11.4; res 64: 34.2 / 10.8. So splat up to res 32, scatter above (f32
# accumulation: scat32 measured ≤ scat16 at these sizes, and f32 keeps
# dense grads exact). Cut the 2^19 full step 107 → ~84 ms.
_SPLAT_MAX_RES = 32

# contraction-chunk size for the splat matmul — see _dense_level_grad_splat
_SPLAT_KCHUNK = 8192


def _dense_level_grad_scatter(spec: HashGridSpec, lvl: int,
                              coords: jnp.ndarray,
                              g_lvl: jnp.ndarray) -> jnp.ndarray:
    """Plain per-level scatter-add backward for a BIG dense level."""
    idx, w = _dense_level_corners(spec, lvl, coords)
    upd = (w[..., None] * g_lvl[:, None, :]).reshape(-1, spec.n_features)
    t = jnp.zeros((spec.level_sizes[lvl], spec.n_features), jnp.float32)
    return t.at[idx.reshape(-1)].add(upd)


def _dense_level_grad(spec: HashGridSpec, lvl: int, coords: jnp.ndarray,
                      g_lvl: jnp.ndarray) -> jnp.ndarray:
    if spec.resolutions[lvl] <= _SPLAT_MAX_RES:
        return _dense_level_grad_splat(spec, lvl, coords, g_lvl)
    return _dense_level_grad_scatter(spec, lvl, coords, g_lvl)


def _make_splat_encode(spec: HashGridSpec, compute_dtype,
                       packed_fwd: bool = False):
    if spec.paired:
        return _make_paired_splat_encode(spec, compute_dtype)
    dense_lvls = [l for l in range(spec.n_levels) if spec.level_is_dense[l]]
    hashed_lvls = [l for l in range(spec.n_levels)
                   if not spec.level_is_dense[l]]

    @jax.custom_vjp
    def encode(table, coords):
        if packed_fwd and dense_lvls:
            # corner-packed dense-level gathers in the TRAINING forward:
            # the pack (8 rolled copies per dense level) is pure bandwidth
            # and rebuilt each step; the backward stays the analytic
            # splat+scatter below, so no gradient flows through the pack
            packed = packed_dense_tables(table, spec)
            return hash_encode_packed(table, packed, coords, spec,
                                      compute_dtype)
        return hash_encode(table, coords, spec, compute_dtype)

    def fwd(table, coords):
        # saving the table costs nothing inside the train-step jit (Adam
        # keeps it alive to the update anyway) and enables true coords
        # cotangents below
        return encode(table, coords), (table, coords)

    def bwd(res_, g):
        table, coords = res_
        table_dtype = table.dtype
        b = coords.shape[0]
        # true coords cotangent via autodiff of the plain gather forward —
        # keeps the splat path gradient-equivalent to the scatter path for
        # consumers that differentiate through sample positions. Training
        # never does, and the whole computation is dead-code-eliminated
        # when the coords cotangent goes unused.
        out_c, vjp_c = jax.vjp(
            lambda c: hash_encode(table, c, spec, compute_dtype), coords)
        (g_coords,) = vjp_c(g.astype(out_c.dtype))
        g = g.astype(jnp.float32).reshape(b, spec.n_levels, spec.n_features)
        parts = [None] * spec.n_levels

        for l in dense_lvls:
            parts[l] = _dense_level_grad(spec, l, coords, g[:, l, :])

        if hashed_lvls:
            # PER-LEVEL scatters, not one fused scatter into the concatenated
            # table: XLA scatter-add costs ≈ ∝ (updates × table entries), so
            # fusing pays every update against every level. Measured
            # standalone (B=2^16, v5e): 65→40 ms @2^14, 281→58 @2^16,
            # 236→118 @2^19 (scratch/scatter_split.py; vmapped batched
            # scatter sits in between — rejected).
            indices, weights = corner_indices_and_weights(spec, coords)
            iw = indices.reshape(b, spec.n_levels, 8)
            ww = weights.reshape(b, spec.n_levels, 8)
            for l in hashed_lvls:
                idx = (iw[:, l, :] - spec.level_offsets[l]).reshape(-1)
                upd = (ww[:, l, :, None] * g[:, l, None, :]).reshape(
                    -1, spec.n_features)
                # big levels accumulate in f16 — halves the table pass the
                # scatter walks (118.6 → 50.3 ms/level-set @2^19 measured,
                # no effect at ≤2^14 sizes). f16, NOT bf16: tcnn accumulates
                # grid grads in __half atomics (11-bit mantissa); bf16's
                # 8-bit mantissa measured a real PSNR loss (51→42.8 dB)
                # while f16 holds 50.2 dB
                acc_dt = (jnp.float16 if spec.level_sizes[l] >= (1 << 17)
                          else jnp.float32)
                t = jnp.zeros((spec.level_sizes[l], spec.n_features), acc_dt)
                parts[l] = t.at[idx].add(upd.astype(acc_dt)).astype(
                    jnp.float32)

        return jnp.concatenate(parts, 0).astype(table_dtype), g_coords

    encode.defvjp(fwd, bwd)
    return encode


def _make_paired_splat_encode(spec: HashGridSpec, compute_dtype):
    """Training encode for PAIRED specs: dense levels keep the separable
    splat backward (their entry layout is identical to tcnn), hashed
    levels scatter B·4 pair-rows of 2F into the level's [S/2, 2F] view —
    half the scatter updates of the tcnn layout at the same table size."""
    dense_lvls = [l for l in range(spec.n_levels) if spec.level_is_dense[l]]
    hashed_lvls = [l for l in range(spec.n_levels)
                   if not spec.level_is_dense[l]]
    f_ = spec.n_features

    @jax.custom_vjp
    def encode(table, coords):
        return hash_encode_paired(table, coords, spec, compute_dtype)

    def fwd(table, coords):
        return encode(table, coords), (table, coords)

    def bwd(res_, g):
        table, coords = res_
        table_dtype = table.dtype
        b = coords.shape[0]
        out_c, vjp_c = jax.vjp(
            lambda c: hash_encode_paired(table, c, spec, compute_dtype),
            coords)
        (g_coords,) = vjp_c(g.astype(out_c.dtype))
        g = g.astype(jnp.float32).reshape(b, spec.n_levels, f_)
        parts = [None] * spec.n_levels

        for l in dense_lvls:
            parts[l] = _dense_level_grad(spec, l, coords, g[:, l, :])

        for l in hashed_lvls:
            rows, w2 = _paired_level_rows(spec, l, coords)  # local
            upd = (w2[..., None] * g[:, l, None, None, :])  # [B,4,2,F]
            size = spec.level_sizes[l]
            # f16 accumulation on big levels (same rule/measurement as the
            # tcnn scatter path above)
            acc_dt = (jnp.float16 if size >= (1 << 17) else jnp.float32)
            t = jnp.zeros((size // 2, 2 * f_), acc_dt)
            t = t.at[rows.reshape(-1)].add(
                upd.reshape(-1, 2 * f_).astype(acc_dt))
            parts[l] = t.astype(jnp.float32).reshape(size, f_)

        return jnp.concatenate(parts, 0).astype(table_dtype), g_coords

    encode.defvjp(fwd, bwd)
    return encode


_SPLAT_CACHE: dict = {}


def hash_encode_splat(table: jnp.ndarray, coords: jnp.ndarray,
                      spec: HashGridSpec,
                      compute_dtype=jnp.float32,
                      packed_fwd: bool = False) -> jnp.ndarray:
    """`hash_encode` with the splatting training backward (see above).

    Forward-identical to `hash_encode` (up to summation order when
    packed_fwd routes dense levels through corner-packed gathers); backward
    differs only in f32 accumulation order. Coords cotangents come from
    autodiff of the plain gather forward (gradient-equivalent to the
    scatter path; dead-code-eliminated in training, which never
    differentiates sample positions).
    """
    key = (spec, jnp.dtype(compute_dtype).name, packed_fwd)
    fn = _SPLAT_CACHE.get(key)
    if fn is None:
        fn = _SPLAT_CACHE[key] = _make_splat_encode(spec, compute_dtype,
                                                    packed_fwd)
    return fn(table, coords)
