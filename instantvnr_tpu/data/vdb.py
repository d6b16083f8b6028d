"""OpenVDB (.vdb) ingestion — the remaining OpenVKL source class.

The reference loads .vdb volumes through OpenVKL's OpenVdbVolume
(`core/samplers/neural_sampler.cpp:756-770` → vklFileRead of a FloatGrid);
on TPU hosts neither OpenVDB nor OpenVKL exists, so this module implements
the OpenVDB *archive format* directly: a from-scratch, dependency-free
reader for the common case — FloatGrid (Tree_float_5_4_3), file versions
220-230, none/zlib value compression, optional active-mask compression and
half-float buffers — plus a writer used to produce fixtures and by
`save_vdb`.

STRICTNESS CONTRACT: this parser was written against the OpenVDB archive
layout without an OpenVDB installation to cross-check (none exists in this
image), so it is deliberately paranoid: every length, count, enum, and
string is validated, transform maps are checked for internal consistency
(scale·scale⁻¹ ≈ 1), and anything unsupported (BLOSC blobs, unknown map or
grid types, file versions outside the known window) raises VdbError with a
precise message. It either reads a file correctly or refuses — it never
silently misreads. Round-trip and semantic fixtures live in
tests/test_vdb.py.

Layout summary (little-endian throughout):
  header:   int64 magic 0x56444220 (" BDV"), uint32 file version,
            uint32×2 library version, byte hasGridOffsets,
            compression (uint32 flags ≥222 / bool byte 220-221),
            36-char ASCII uuid (≥221), file MetaMap, uint32 grid count,
            per grid: name, type, instance-parent, int64×3 stream offsets
  grid:     [uint32 per-grid compression ≥223], MetaMap, Transform
            (map type name + map doubles), tree topology (root background/
            tiles/children; internal nodes: child+value bitmasks + tile
            values; leaves: value mask), then leaf buffers.
  values:   int8 layout code, optional inactive value(s) + selection mask,
            then raw / zlib payload (int64 byte count, negative = raw).

The in-memory product is a dense [dz, dy, dx] float32 array over the
grid's active index bounding box (background elsewhere) — the same shape
`data.volume.Volume` carries, so .vdb files flow through every existing
path (training, rendering, macrocells, OOC descriptors via save_raw).
"""
from __future__ import annotations

import io
import os
import struct
import uuid as _uuid
import zlib
from dataclasses import dataclass, field

import numpy as np

MAGIC = 0x56444220  # " BDV" little-endian
_SUPPORTED_VERSIONS = range(220, 231)

# file/grid compression bitmask
COMPRESS_NONE = 0
COMPRESS_ZIP = 1
COMPRESS_ACTIVE_MASK = 2
COMPRESS_BLOSC = 4

# readCompressedValues layout codes (io/Compression.h semantics)
NO_MASK_OR_INACTIVE_VALS = 0     # inactive = +background
NO_MASK_AND_MINUS_BG = 1         # inactive = -background
NO_MASK_AND_ONE_INACTIVE_VAL = 2
MASK_AND_NO_INACTIVE_VALS = 3
MASK_AND_ONE_INACTIVE_VAL = 4
MASK_AND_TWO_INACTIVE_VALS = 5
NO_MASK_AND_ALL_VALS = 6

# Tree_float_5_4_3 geometry
_L1_LOG2, _L2_LOG2, _LEAF_LOG2 = 5, 4, 3
_L1_DIM, _L2_DIM, _LEAF_DIM = 32, 16, 8
_LEAF_SIZE = _LEAF_DIM ** 3                      # 512
_L2_SIZE = _L2_DIM ** 3                          # 4096
_L1_SIZE = _L1_DIM ** 3                          # 32768
_L2_SPAN = _L2_DIM * _LEAF_DIM                   # 128 voxels
_L1_SPAN = _L1_DIM * _L2_SPAN                    # 4096 voxels


class VdbError(ValueError):
    """Structured parse failure — message states offset + what failed."""


@dataclass
class VdbGridInfo:
    name: str
    grid_type: str
    file_version: int
    background: float
    bbox_min: tuple[int, int, int]  # active index bbox (inclusive)
    bbox_max: tuple[int, int, int]
    voxel_size: tuple[float, float, float]
    index_to_world: np.ndarray  # [4,4] row-vector convention
    grid_class: str = ""
    meta: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# primitive readers


class _R:
    def __init__(self, f):
        self.f = f

    def bytes(self, n: int, what: str) -> bytes:
        b = self.f.read(n)
        if len(b) != n:
            raise VdbError(f"truncated file reading {what} "
                           f"({len(b)}/{n} bytes at {self.f.tell()})")
        return b

    def u32(self, what="uint32") -> int:
        return struct.unpack("<I", self.bytes(4, what))[0]

    def i64(self, what="int64") -> int:
        return struct.unpack("<q", self.bytes(8, what))[0]

    def f32(self, what="float") -> float:
        return struct.unpack("<f", self.bytes(4, what))[0]

    def f64v(self, n: int, what: str) -> np.ndarray:
        return np.frombuffer(self.bytes(8 * n, what), "<f8").copy()

    def byte(self, what="byte") -> int:
        return self.bytes(1, what)[0]

    def string(self, what="string", maxlen=1 << 16) -> str:
        n = self.u32(f"{what} length")
        if n > maxlen:
            raise VdbError(f"implausible {what} length {n} at "
                           f"{self.f.tell()} — layout mismatch")
        return self.bytes(n, what).decode("utf-8", errors="strict")


def _read_mask(r: _R, nbits: int, what: str) -> np.ndarray:
    """NodeMask: packed little-endian uint64 words, bit i = word[i>>6]
    bit (i&63). Returns a bool [nbits] array in offset order."""
    words = np.frombuffer(r.bytes(nbits // 8, what), "<u8")
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return bits.astype(bool)


def _read_metamap(r: _R) -> dict:
    """MetaMap: uint32 count, then (name, typeName, int32 size, bytes).
    Known scalar types are decoded; unknown types are skipped verbatim."""
    count = r.u32("metadata count")
    if count > 1 << 20:
        raise VdbError(f"implausible metadata count {count}")
    out = {}
    for _ in range(count):
        name = r.string("metadata name")
        tname = r.string("metadata type")
        n = r.u32("metadata size")
        if n > 1 << 28:
            raise VdbError(f"implausible metadata size {n} for {name!r}")
        raw = r.bytes(n, f"metadata {name!r}")
        if tname == "string":
            out[name] = raw.decode("utf-8", errors="replace")
        elif tname == "bool" and n == 1:
            out[name] = bool(raw[0])
        elif tname == "int32" and n == 4:
            out[name] = struct.unpack("<i", raw)[0]
        elif tname == "int64" and n == 8:
            out[name] = struct.unpack("<q", raw)[0]
        elif tname == "float" and n == 4:
            out[name] = struct.unpack("<f", raw)[0]
        elif tname == "double" and n == 8:
            out[name] = struct.unpack("<d", raw)[0]
        elif tname == "vec3i" and n == 12:
            out[name] = tuple(struct.unpack("<3i", raw))
        elif tname == "vec3d" and n == 24:
            out[name] = tuple(struct.unpack("<3d", raw))
        else:
            out[name] = raw  # opaque (e.g. __delayedload) — preserved
    return out


def _read_transform(r: _R) -> tuple[np.ndarray, tuple[float, float, float]]:
    """Transform::read: map type name + that map's serialized doubles.
    Returns (4×4 index→world matrix, voxel size). Maps whose layout
    carries redundant cached vectors are cross-checked; a failed check
    means the layout guess is wrong for this file → loud error."""
    map_type = r.string("map type")

    def check_inverse(scale, inv, what):
        if not np.allclose(scale * inv, 1.0, rtol=1e-6):
            raise VdbError(
                f"{what}: scale·inverse != 1 ({scale} vs {inv}) — "
                "map layout mismatch, refusing to guess")

    mat = np.eye(4)
    if map_type == "AffineMap":
        mat = r.f64v(16, "AffineMap matrix").reshape(4, 4)
    elif map_type in ("UniformScaleMap", "ScaleMap"):
        scale = r.f64v(3, "scale")
        _voxel = r.f64v(3, "voxel size")
        inv = r.f64v(3, "scale inverse")
        _ = r.f64v(3, "invScaleSqr")
        _ = r.f64v(3, "invTwiceScale")
        check_inverse(scale, inv, map_type)
        mat[0, 0], mat[1, 1], mat[2, 2] = scale
    elif map_type in ("UniformScaleTranslateMap", "ScaleTranslateMap"):
        trans = r.f64v(3, "translation")
        scale = r.f64v(3, "scale")
        _voxel = r.f64v(3, "voxel size")
        inv = r.f64v(3, "scale inverse")
        _ = r.f64v(3, "invScaleSqr")
        _ = r.f64v(3, "invTwiceScale")
        check_inverse(scale, inv, map_type)
        mat[0, 0], mat[1, 1], mat[2, 2] = scale
        mat[3, :3] = trans
    elif map_type == "TranslationMap":
        mat[3, :3] = r.f64v(3, "translation")
    else:
        raise VdbError(f"unsupported transform map type {map_type!r} "
                       "(supported: AffineMap, [Uniform]Scale[Translate]Map,"
                       " TranslationMap)")
    voxel = tuple(float(np.linalg.norm(mat[i, :3])) for i in range(3))
    return mat, voxel


def _read_values(r: _R, count: int, value_mask: np.ndarray | None,
                 compression: int, background: float,
                 from_half: bool) -> np.ndarray:
    """io::readCompressedValues → dense float32 [count]."""
    code = r.byte("value layout code")
    if code > NO_MASK_AND_ALL_VALS:
        raise VdbError(f"unknown value layout code {code} at {r.f.tell()}")
    dt = np.dtype("<f2") if from_half else np.dtype("<f4")
    inactive0 = np.float32(background)
    inactive1 = None
    if code in (NO_MASK_AND_ONE_INACTIVE_VAL, MASK_AND_ONE_INACTIVE_VAL,
                MASK_AND_TWO_INACTIVE_VALS):
        inactive0 = np.frombuffer(
            r.bytes(dt.itemsize, "inactive value 0"), dt)[0]
    if code == MASK_AND_TWO_INACTIVE_VALS:
        inactive1 = np.frombuffer(
            r.bytes(dt.itemsize, "inactive value 1"), dt)[0]
    selection = None
    if code in (MASK_AND_NO_INACTIVE_VALS, MASK_AND_ONE_INACTIVE_VAL,
                MASK_AND_TWO_INACTIVE_VALS):
        selection = _read_mask(r, count, "selection mask")

    # the metadata code is authoritative (the compression flag only gates
    # what the WRITER chose); the selection mask says which voxels take
    # the stored values, so the expansion is self-describing
    mask_compressed = selection is not None
    stored = int(selection.sum()) if mask_compressed else count
    if code == NO_MASK_AND_MINUS_BG:
        inactive0 = np.float32(-background)

    # payload
    if compression & COMPRESS_BLOSC:
        raise VdbError("BLOSC-compressed values: libblosc is not available "
                       "in this environment — re-save the file with ZIP or "
                       "no compression")
    if compression & COMPRESS_ZIP:
        n = r.i64("zipped byte count")
        if n == 0:  # empty payload (e.g. fully-inactive masked leaf)
            raw = b""
        elif n < 0:  # negative count = stored uncompressed
            raw = r.bytes(-n, "raw values")
        else:
            if n > 1 << 31:
                raise VdbError(f"implausible zip blob size {n}")
            raw = zlib.decompress(r.bytes(n, "zipped values"))
    else:
        raw = r.bytes(stored * dt.itemsize, "raw values")
    vals = np.frombuffer(raw, dt)
    if vals.size != stored:
        raise VdbError(f"value payload holds {vals.size} values, "
                       f"expected {stored}")
    vals = vals.astype(np.float32)

    if not mask_compressed:
        return vals
    out = np.full(count, np.float32(inactive0), np.float32)
    if inactive1 is not None and value_mask is not None:
        # two inactive values: voxels outside the selection that the node
        # value mask marks take inactiveVal1
        out[value_mask & ~selection] = np.float32(inactive1)
    out[selection] = vals
    return out


# ---------------------------------------------------------------------------
# tree reading (Tree_float_5_4_3)


@dataclass
class _Leaf:
    origin: tuple[int, int, int]
    value_mask: np.ndarray  # [512] bool
    values: np.ndarray | None = None  # filled by readBuffers


@dataclass
class _Internal:
    origin: tuple[int, int, int]
    log2: int
    child_mask: np.ndarray
    value_mask: np.ndarray
    values: np.ndarray
    children: dict  # offset -> _Internal | _Leaf


def _offset_to_xyz(off: int, log2: int) -> tuple[int, int, int]:
    """OpenVDB coordToOffset inverse: offset = (x << 2·log2)|(y << log2)|z."""
    dim = 1 << log2
    return off >> (2 * log2), (off >> log2) & (dim - 1), off & (dim - 1)


def _read_internal(r: _R, origin, log2: int, compression: int,
                   background: float, from_half: bool) -> _Internal:
    size = (1 << log2) ** 3
    child_mask = _read_mask(r, size, "child mask")
    value_mask = _read_mask(r, size, "value mask")
    values = _read_values(r, size, value_mask, compression, background,
                          from_half)
    child_span = _L2_SPAN if log2 == _L1_LOG2 else _LEAF_DIM
    children = {}
    for off in np.flatnonzero(child_mask):
        x, y, z = _offset_to_xyz(int(off), log2)
        corigin = (origin[0] + x * child_span, origin[1] + y * child_span,
                   origin[2] + z * child_span)
        if log2 == _L1_LOG2:
            children[int(off)] = _read_internal(
                r, corigin, _L2_LOG2, compression, background, from_half)
        else:
            children[int(off)] = _Leaf(
                corigin, _read_mask(r, _LEAF_SIZE, "leaf value mask"))
    return _Internal(tuple(origin), log2, child_mask, value_mask, values,
                     children)


def _iter_leaves(node: _Internal):
    for child in node.children.values():
        if isinstance(child, _Leaf):
            yield child
        else:
            yield from _iter_leaves(child)


def _read_leaf_buffers(r: _R, root_children, compression: int,
                       background: float, from_half: bool):
    """Tree::readBuffers — leaves in depth-first topology order."""
    for top in root_children:
        for leaf in _iter_leaves(top):
            leaf.values = _read_values(r, _LEAF_SIZE, leaf.value_mask,
                                       compression, background, from_half)


# ---------------------------------------------------------------------------
# archive


def _read_header(r: _R):
    magic = r.i64("magic")
    if magic != MAGIC:
        raise VdbError(f"not an OpenVDB file (magic {magic:#x}, "
                       f"want {MAGIC:#x})")
    version = r.u32("file version")
    if version not in _SUPPORTED_VERSIONS:
        raise VdbError(
            f"unsupported OpenVDB file version {version} (supported: "
            f"{_SUPPORTED_VERSIONS.start}-{_SUPPORTED_VERSIONS.stop - 1})")
    lib = (r.u32("library major"), r.u32("library minor"))
    has_offsets = r.byte("hasGridOffsets")
    if not has_offsets:
        raise VdbError("stream-mode archive (no grid offsets) unsupported")
    if version >= 222:
        compression = r.u32("compression flags")
        if compression > 7:
            raise VdbError(f"implausible compression flags {compression:#x}"
                           " — header layout mismatch")
    else:
        compression = (COMPRESS_ZIP if r.byte("isCompressed")
                       else COMPRESS_NONE)
    # uuid: 36-char ASCII since 221; validate to catch layout drift
    pos = r.f.tell()
    u = r.bytes(36, "uuid")
    try:
        _uuid.UUID(u.decode("ascii"))
    except Exception:
        raise VdbError(f"uuid at {pos} is not a 36-char ASCII UUID "
                       f"({u[:16]!r}…) — header layout mismatch") from None
    return version, lib, compression


def read_vdb_grids(path: str) -> list[tuple[VdbGridInfo, np.ndarray]]:
    """Read every FloatGrid in the archive → [(info, dense [dz,dy,dx])].

    The dense array covers the grid's ACTIVE index bounding box with the
    background value elsewhere; info.bbox_min records where index (0,0,0)
    of the array sits in the grid's index space.
    """
    with open(path, "rb") as f:
        r = _R(f)
        version, _lib, file_compression = _read_header(r)
        _file_meta = _read_metamap(r)
        n_grids = r.u32("grid count")
        if n_grids > 1 << 16:
            raise VdbError(f"implausible grid count {n_grids}")
        descs = []
        for _ in range(n_grids):
            name = r.string("grid name").split("\x1e")[0]
            gtype = r.string("grid type")
            parent = r.string("instance parent") if version >= 212 else ""
            gpos = r.i64("grid pos")
            bpos = r.i64("block pos")
            epos = r.i64("end pos")
            descs.append((name, gtype, parent, gpos, bpos, epos))

        out = []
        for name, gtype, parent, gpos, bpos, epos in descs:
            if parent:
                raise VdbError(f"grid {name!r} is an instance of "
                               f"{parent!r} — instancing unsupported")
            scalar = {"Tree_float_5_4_3": "<f4",
                      "Tree_double_5_4_3": "<f8"}.get(gtype)
            if scalar is None:
                raise VdbError(
                    f"grid {name!r} has unsupported type {gtype!r} "
                    "(supported: Tree_float_5_4_3, Tree_double_5_4_3)")
            if scalar == "<f8":
                raise VdbError("double grids not yet supported "
                               f"(grid {name!r})")
            f.seek(gpos)
            info, dense = _read_one_grid(r, name, gtype, version,
                                         file_compression)
            out.append((info, dense))
        return out


def _read_one_grid(r: _R, name: str, gtype: str, version: int,
                   compression: int):
    if version >= 223:
        compression = r.u32("per-grid compression")
        if compression > 7:
            raise VdbError(f"implausible per-grid compression "
                           f"{compression:#x} at {r.f.tell() - 4}")
    meta = _read_metamap(r)
    from_half = bool(meta.get("is_saved_as_half_float", False))
    mat, voxel = _read_transform(r)

    # --- topology
    buffer_count = r.u32("buffer count")
    if buffer_count != 1:
        raise VdbError(f"multi-buffer trees unsupported ({buffer_count})")
    background = r.f32("background")
    n_tiles = r.u32("root tile count")
    n_children = r.u32("root child count")
    if n_tiles > 1 << 24 or n_children > 1 << 24:
        raise VdbError("implausible root counts "
                       f"({n_tiles} tiles, {n_children} children)")
    tiles = []
    for _ in range(n_tiles):
        x, y, z = struct.unpack("<3i", r.bytes(12, "tile origin"))
        v = r.f32("tile value")
        active = r.byte("tile active")
        tiles.append(((x, y, z), v, bool(active)))
    roots = []
    for _ in range(n_children):
        x, y, z = struct.unpack("<3i", r.bytes(12, "child origin"))
        roots.append(_read_internal(r, (x, y, z), _L1_LOG2, compression,
                                    background, from_half))
    # --- buffers
    _read_leaf_buffers(r, roots, compression, background, from_half)

    info, dense = _densify(name, gtype, version, background, tiles, roots,
                           mat, voxel, meta)
    return info, dense


def _densify(name, gtype, version, background, tiles, roots, mat, voxel,
             meta):
    # active bbox: prefer the authoritative file_bbox metadata
    bmin = meta.get("file_bbox_min")
    bmax = meta.get("file_bbox_max")
    if not (isinstance(bmin, tuple) and isinstance(bmax, tuple)):
        bmin, bmax = _compute_bbox(tiles, roots)
    if bmin is None or any(a > b for a, b in zip(bmin, bmax)):
        info = VdbGridInfo(name, gtype, version, background, (0, 0, 0),
                           (-1, -1, -1), voxel, mat,
                           meta.get("class", ""), meta)
        return info, np.zeros((0, 0, 0), np.float32)

    nx, ny, nz = (bmax[0] - bmin[0] + 1, bmax[1] - bmin[1] + 1,
                  bmax[2] - bmin[2] + 1)
    if nx * ny * nz > (1 << 33):
        raise VdbError(f"active bbox {nx}x{ny}x{nz} too large to densify "
                       "in-core — use the out-of-core path on a raw dump")
    dense = np.full((nz, ny, nx), np.float32(background), np.float32)

    def paint_box(x0, y0, z0, span, value):
        xs = slice(max(x0 - bmin[0], 0), min(x0 + span - bmin[0], nx))
        ys = slice(max(y0 - bmin[1], 0), min(y0 + span - bmin[1], ny))
        zs = slice(max(z0 - bmin[2], 0), min(z0 + span - bmin[2], nz))
        if xs.start < xs.stop and ys.start < ys.stop and zs.start < zs.stop:
            dense[zs, ys, xs] = value

    for (x, y, z), v, active in tiles:
        if active or v != background:
            paint_box(x, y, z, _L1_SPAN, v)

    def walk(node: _Internal):
        span = _L2_SPAN if node.log2 == _L1_LOG2 else _LEAF_DIM
        # value tiles: every non-child slot whose value differs from
        # background, or is an active tile
        paint = node.value_mask | (node.values != np.float32(background))
        paint &= ~node.child_mask
        for off in np.flatnonzero(paint):
            x, y, z = _offset_to_xyz(int(off), node.log2)
            paint_box(node.origin[0] + x * span, node.origin[1] + y * span,
                      node.origin[2] + z * span, span,
                      node.values[int(off)])
        for child in node.children.values():
            if isinstance(child, _Leaf):
                vals = child.values.reshape(
                    _LEAF_DIM, _LEAF_DIM, _LEAF_DIM).transpose(2, 1, 0)
                x0, y0, z0 = child.origin
                paint = vals  # leaf buffers are fully populated
                xs = slice(x0 - bmin[0], x0 - bmin[0] + _LEAF_DIM)
                ys = slice(y0 - bmin[1], y0 - bmin[1] + _LEAF_DIM)
                zs = slice(z0 - bmin[2], z0 - bmin[2] + _LEAF_DIM)
                if (0 <= xs.start and xs.stop <= nx and 0 <= ys.start
                        and ys.stop <= ny and 0 <= zs.start
                        and zs.stop <= nz):
                    dense[zs, ys, xs] = paint
                else:  # leaf partially outside the declared bbox: clip
                    for lz in range(_LEAF_DIM):
                        gz = z0 + lz - bmin[2]
                        if not (0 <= gz < nz):
                            continue
                        xs0 = max(0, -(x0 - bmin[0]))
                        xs1 = min(_LEAF_DIM, nx - (x0 - bmin[0]))
                        ys0 = max(0, -(y0 - bmin[1]))
                        ys1 = min(_LEAF_DIM, ny - (y0 - bmin[1]))
                        if xs0 < xs1 and ys0 < ys1:
                            dense[gz,
                                  y0 - bmin[1] + ys0:y0 - bmin[1] + ys1,
                                  x0 - bmin[0] + xs0:x0 - bmin[0] + xs1] = \
                                paint[lz, ys0:ys1, xs0:xs1]
            else:
                walk(child)

    for top in roots:
        walk(top)

    info = VdbGridInfo(name, gtype, version, float(background),
                       tuple(bmin), tuple(bmax), voxel, mat,
                       str(meta.get("class", "")), meta)
    return info, dense


def _compute_bbox(tiles, roots):
    lo = np.array([2**31 - 1] * 3)
    hi = np.array([-(2**31)] * 3)
    found = False

    def grow(origin, span):
        nonlocal found
        found = True
        o = np.asarray(origin)
        np.minimum(lo, o, out=lo)
        np.maximum(hi, o + span - 1, out=hi)

    for (x, y, z), v, active in tiles:
        if active:
            grow((x, y, z), _L1_SPAN)

    def walk(node):
        span = _L2_SPAN if node.log2 == _L1_LOG2 else _LEAF_DIM
        for off in np.flatnonzero(node.value_mask & ~node.child_mask):
            x, y, z = _offset_to_xyz(int(off), node.log2)
            grow((node.origin[0] + x * span, node.origin[1] + y * span,
                  node.origin[2] + z * span), span)
        for child in node.children.values():
            if isinstance(child, _Leaf):
                if child.value_mask.any():
                    grow(child.origin, _LEAF_DIM)
            else:
                walk(child)

    for top in roots:
        walk(top)
    if not found:
        return None, None
    return tuple(int(v) for v in lo), tuple(int(v) for v in hi)


# ---------------------------------------------------------------------------
# public loaders


def read_vdb(path: str, grid: str | None = None
             ) -> tuple[np.ndarray, VdbGridInfo]:
    """Load one grid (by name, or the single/first FloatGrid) → dense
    [dz, dy, dx] float32 + info."""
    grids = read_vdb_grids(path)
    if not grids:
        raise VdbError(f"{path}: archive contains no grids")
    if grid is not None:
        for info, dense in grids:
            if info.name == grid:
                return dense, info
        raise VdbError(f"{path}: no grid named {grid!r} "
                       f"(has: {[i.name for i, _ in grids]})")
    if len(grids) > 1:
        names = [i.name for i, _ in grids]
        # the reference picks the requested field; default to 'density'
        # (the conventional fog-volume name) before failing
        for info, dense in grids:
            if info.name == "density":
                return dense, info
        raise VdbError(f"{path}: multiple grids {names}; pass grid=<name>")
    return grids[0][1], grids[0][0]


def vdb_to_volume(path: str, grid: str | None = None,
                  value_range: tuple | None = None):
    """.vdb → data.volume.Volume (normalized like every other source —
    StaticSampler::load semantics, neural_sampler.cpp:244-288)."""
    import jax.numpy as jnp

    from instantvnr_tpu.data.volume import Volume, normalize_array

    dense, info = read_vdb(path, grid)
    if dense.size == 0:
        raise VdbError(f"{path}: grid {info.name!r} has no active voxels")
    data, rng = normalize_array(dense, value_range)
    dz, dy, dx = dense.shape
    return Volume(data=jnp.asarray(data), dims=(dx, dy, dz),
                  original_range=rng)


# ---------------------------------------------------------------------------
# writer (fixtures + save_vdb)


class _W:
    def __init__(self, f):
        self.f = f

    def u32(self, v):
        self.f.write(struct.pack("<I", v))

    def i64(self, v):
        self.f.write(struct.pack("<q", v))

    def f32(self, v):
        self.f.write(struct.pack("<f", v))

    def byte(self, v):
        self.f.write(bytes([v]))

    def string(self, s: str):
        b = s.encode("utf-8")
        self.u32(len(b))
        self.f.write(b)

    def mask(self, bits: np.ndarray):
        self.f.write(np.packbits(bits.astype(np.uint8),
                                 bitorder="little").tobytes())


def _write_values(w: _W, vals: np.ndarray, value_mask: np.ndarray | None,
                  compression: int):
    """NO_MASK_AND_ALL_VALS layout, or MASK_AND_NO_INACTIVE_VALS when
    compression requests active-mask packing."""
    vals = np.asarray(vals, "<f4")
    if (compression & COMPRESS_ACTIVE_MASK) and value_mask is not None:
        w.byte(MASK_AND_NO_INACTIVE_VALS)
        w.mask(value_mask)
        payload = vals[value_mask].tobytes()
    else:
        w.byte(NO_MASK_AND_ALL_VALS)
        payload = vals.tobytes()
    if compression & COMPRESS_ZIP:
        z = zlib.compress(payload)
        if len(z) < len(payload):
            w.i64(len(z))
            w.f.write(z)
        else:
            w.i64(-len(payload))
            w.f.write(payload)
    else:
        w.f.write(payload)


def write_vdb(path: str, data_zyx: np.ndarray, name: str = "density",
              compression: str = "zip", origin=(0, 0, 0),
              voxel_size: float = 1.0, background: float = 0.0,
              active_threshold: float | None = None):
    """Write a dense [dz, dy, dx] array as a FloatGrid .vdb (file version
    224, AffineMap transform). `active_threshold` marks voxels > threshold
    active (None = all active); with compression="zip+mask" inactive
    voxels are dropped from the payloads (real sparseness on disk)."""
    data = np.asarray(data_zyx, np.float32)
    if data.ndim != 3:
        raise ValueError(f"need [dz,dy,dx], got {data.shape}")
    comp = {"none": COMPRESS_NONE, "zip": COMPRESS_ZIP,
            "zip+mask": COMPRESS_ZIP | COMPRESS_ACTIVE_MASK}[compression]
    dz, dy, dx = data.shape
    ox, oy, oz = origin
    if any(o % _L1_SPAN for o in origin):
        raise ValueError(f"origin must be {_L1_SPAN}-aligned")
    active = (np.ones_like(data, bool) if active_threshold is None
              else data > active_threshold)

    buf = io.BytesIO()
    w = _W(buf)
    # ---- header
    w.i64(MAGIC)
    w.u32(224)
    w.u32(8)
    w.u32(1)
    w.byte(1)  # hasGridOffsets
    w.u32(comp)
    buf.write(str(_uuid.uuid4()).encode("ascii"))
    # file metadata
    w.u32(0)
    # grid descriptors
    w.u32(1)
    w.string(name)
    w.string("Tree_float_5_4_3")
    w.string("")  # instance parent
    offs_pos = buf.tell()
    w.i64(0)
    w.i64(0)
    w.i64(0)

    grid_pos = buf.tell()
    w.u32(comp)  # per-grid compression (version >= 223)
    # grid metadata; file_bbox is the exact ACTIVE-voxel bbox (OpenVDB
    # evalActiveVoxelBoundingBox semantics)
    if active.any():
        az, ay, ax = np.nonzero(active)
        bb_min = (ox + int(ax.min()), oy + int(ay.min()), oz + int(az.min()))
        bb_max = (ox + int(ax.max()), oy + int(ay.max()), oz + int(az.max()))
    else:
        bb_min, bb_max = (0, 0, 0), (-1, -1, -1)
    metas = [("class", "string", b"fogvolume"),
             ("name", "string", name.encode()),
             ("file_bbox_min", "vec3i", struct.pack("<3i", *bb_min)),
             ("file_bbox_max", "vec3i", struct.pack("<3i", *bb_max))]
    w.u32(len(metas))
    for mname, mtype, mval in metas:
        w.string(mname)
        w.string(mtype)
        w.u32(len(mval))
        buf.write(mval)
    # transform: AffineMap, uniform voxel_size
    w.string("AffineMap")
    mat = np.eye(4) * voxel_size
    mat[3, 3] = 1.0
    buf.write(mat.astype("<f8").tobytes())

    # ---- topology: root children on the 4096³ lattice
    w.u32(1)  # buffer count
    w.f32(background)
    w.u32(0)  # no root tiles
    rx = range(ox, ox + dx, _L1_SPAN)
    ry = range(oy, oy + dy, _L1_SPAN)
    rz = range(oz, oz + dz, _L1_SPAN)
    root_origins = [(x, y, z) for z in rz for y in ry for x in rx]
    w.u32(len(root_origins))

    leaf_queue = []  # (values [512], mask [512]) in topology order

    def leaf_block(x0, y0, z0):
        """leaf values/mask in offset order (x-major)."""
        vals = np.full((_LEAF_DIM,) * 3, background, np.float32)
        msk = np.zeros((_LEAF_DIM,) * 3, bool)
        x1 = min(x0 + _LEAF_DIM, ox + dx)
        y1 = min(y0 + _LEAF_DIM, oy + dy)
        z1 = min(z0 + _LEAF_DIM, oz + dz)
        if x1 > x0 and y1 > y0 and z1 > z0:
            sub = data[z0 - oz:z1 - oz, y0 - oy:y1 - oy, x0 - ox:x1 - ox]
            am = active[z0 - oz:z1 - oz, y0 - oy:y1 - oy, x0 - ox:x1 - ox]
            vals[: z1 - z0, : y1 - y0, : x1 - x0] = sub
            msk[: z1 - z0, : y1 - y0, : x1 - x0] = am
        # [z,y,x] → offset order (x high bits): transpose to [x,y,z]
        return (vals.transpose(2, 1, 0).reshape(-1),
                msk.transpose(2, 1, 0).reshape(-1))

    for x0, y0, z0 in root_origins:
        buf.write(struct.pack("<3i", x0, y0, z0))
        # L1 internal node
        l1_child = np.zeros(_L1_SIZE, bool)
        l1_value = np.zeros(_L1_SIZE, bool)
        l1_vals = np.full(_L1_SIZE, background, np.float32)
        l2_nodes = []
        for off in range(_L1_SIZE):
            cx, cy, cz = _offset_to_xyz(off, _L1_LOG2)
            bx = x0 + cx * _L2_SPAN
            by = y0 + cy * _L2_SPAN
            bz = z0 + cz * _L2_SPAN
            if (bx < ox + dx and by < oy + dy and bz < oz + dz
                    and bx + _L2_SPAN > ox and by + _L2_SPAN > oy
                    and bz + _L2_SPAN > oz):
                l1_child[off] = True
                l2_nodes.append((off, bx, by, bz))
        w.mask(l1_child)
        w.mask(l1_value)
        _write_values(w, l1_vals, None, comp)
        for _off, bx, by, bz in l2_nodes:
            l2_child = np.zeros(_L2_SIZE, bool)
            l2_value = np.zeros(_L2_SIZE, bool)
            l2_vals = np.full(_L2_SIZE, background, np.float32)
            leaves = []
            for off2 in range(_L2_SIZE):
                lx, ly, lz = _offset_to_xyz(off2, _L2_LOG2)
                px = bx + lx * _LEAF_DIM
                py = by + ly * _LEAF_DIM
                pz = bz + lz * _LEAF_DIM
                if (px < ox + dx and py < oy + dy and pz < oz + dz
                        and px + _LEAF_DIM > ox and py + _LEAF_DIM > oy
                        and pz + _LEAF_DIM > oz):
                    l2_child[off2] = True
                    leaves.append((px, py, pz))
            w.mask(l2_child)
            w.mask(l2_value)
            _write_values(w, l2_vals, None, comp)
            for px, py, pz in leaves:
                vals, msk = leaf_block(px, py, pz)
                w.mask(msk)  # leaf topology = value mask
                leaf_queue.append((vals, msk))

    # ---- buffers: leaves in the same topology order
    for vals, msk in leaf_queue:
        _write_values(w, vals, msk, comp)

    grid_end = buf.tell()
    raw = bytearray(buf.getvalue())
    raw[offs_pos:offs_pos + 24] = struct.pack("<3q", grid_pos, grid_end,
                                              grid_end)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
