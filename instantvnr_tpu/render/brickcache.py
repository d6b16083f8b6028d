"""Macrocell-guided brick cache — near-decoded-speed neural sampling.

The sample-streaming wavefront (reference mode 5, `method_raymarching.cu:
687-973`) evaluates the network at every sample: L·8 = 64 hash-table rows
per sample at the measured v5e gather floor (~6-13 ns/row depending on
footprint/precast, NOTES_ROUND1/5) — which caps the exact neural
wavefront at ~1.2 fps @512² (every split/pack/pair alternative measured
and refuted, NOTES_ROUND4/5).

This module is the TPU-native redesign that amortizes those lookups
ACROSS samples and frames: decode the network once per OCCUPIED macrocell
(16³ voxels + ghost ring) into a brick pool, then sample the pool with
corner-packed trilinear gathers — 2 gathers/sample (cell→slot LUT + one
[8]-row corner gather) instead of 64. Memory scales with the occupied
fraction under the CURRENT transfer function, not the full grid, so it
covers the sample-streaming niche (volumes whose dense decode is too big)
while rendering at near-decoded speed. The reference's closest analog is
its macrocell-driven empty-space culling; the cache itself is new — CUDA
in-shader inference made per-sample evaluation cheap enough not to need
one, the v5e gather engine does not.

Numerics: by default brick texels are decoded at the SAME half-voxel
lattice as `models.metrics.decode_volume` ((i+0.5)/N, clamp addressing),
and sampling applies the same cell-centered remap as
`ops.trilinear.sample_volume` — so on occupied cells the cache reproduces
the decoded-grid render bit-for-bit (tested). Note the decoding modes'
remap warps the field by up to half a voxel vs raw net(p) (the reference's
grid modes share this, raytracing.h:105-110); pools built with
convention="exact" decode at the align-corner lattice instead, converging
to the exact per-sample field as `supersample` grows (ctx_convention).

Cache keying/invalidation is the caller's job (api.VNRenderer rebuilds on
params/TF change, like the reference re-uploading inference params per
epoch, tcnn_network.h:142-156).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE, MacroCell

GHOST = 2  # ghost voxels per side: covers the cell-centered remap's ≤1-texel
# shift plus the floor; gradient probes (±1 voxel) resolve through the
# NEIGHBOR cell's brick, which `dilate` guarantees exists
BRICK = MACROCELL_SIZE + 2 * GHOST  # 20
_BRICK3 = BRICK * BRICK * BRICK

# corner order matches ops.hash_encoding._CORNERS: x fastest
_CORNER_OFFS = tuple(
    ((c >> 2) & 1) * BRICK * BRICK + ((c >> 1) & 1) * BRICK + ((c >> 0) & 1)
    for c in range(8)
)


# ---- supersampled pools (quality policy) ----------------------------------
# A pool can be decoded at `ss`× the volume's texel lattice: texel g_ss sits
# at fractional voxel g_ss/ss and holds network((g_ss/ss + 0.5)/N) — a
# NESTED refinement (g_ss = ss·g reproduces the 1× texel exactly), so the
# ss pool agrees with the 1× pool on the original lattice and only adds
# midpoints. Trilinear interpolation error falls ~h², closing most of the
# brick-vs-exact quality gap (measured in tests/test_brickcache.py) at
# ss³-ish memory/decode cost; sampling stays ONE packed-row gather. The
# factor rides the ctx as a LEAFLESS static marker ("ss": ((),)·k — part
# of the jit treedef, no device data; same trick as params["_render"]).


def _ss_geom(ss: int) -> tuple:
    """(brick edge, brick texels) at supersample `ss`. Edge covers the
    same physical span as the 1× brick ([cell·16−GHOST, +BRICK) voxels):
    local_ss = i0_ss − ss·(cell·16 − GHOST) ∈ [0, ss·(BRICK−1)+1)."""
    b = ss * (BRICK - 1) + 1
    return b, b * b * b


def ctx_supersample(ctx: dict) -> int:
    """Static supersample factor of a brick ctx (1 when absent)."""
    return len(ctx["ss"]) if "ss" in ctx else 1


def ctx_convention(ctx: dict) -> str:
    """Static decode-lattice convention of a brick ctx.

    "decoded": texel g holds net((g/ss + 0.5)/N) — the decoded-grid /
    tex3D half-texel lattice; the pool reproduces the DECODING modes'
    field bit-for-bit (their cell-centered remap warps net by up to half
    a voxel vs raw coordinates — raytracing.h:105-110, a warp the
    reference's grid modes share).
    "exact": texel g holds net(g/(ss(N−1))) — the align-corner positions
    the SAMPLER interpolates at, so pool(p) → net(p) as ss grows: the
    convention that approximates the reference's literal mode-5 field
    (method_raymarching.cu:707-716 feeds raw object-space coords to the
    network). The "hq" policy uses this.
    """
    return "exact" if "conv_exact" in ctx else "decoded"


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _decode_brick_chunk(field, params, cell_ids, mc_dims: tuple,
                        vol_dims: tuple, ss: int = 1,
                        convention: str = "decoded") -> jnp.ndarray:
    """Decode `len(cell_ids)` bricks → [n, brick³] float32.

    cell_ids: [n] int32 flat macrocell ids ((z·my + y)·mx + x). Texels sit
    at g = ss·(cell·16 − GHOST) + local in ss-texel units, evaluated at
    the lattice of `convention` (see ctx_convention): "decoded" =
    (g/ss + 0.5)/N with g/ss clamped to the grid (CUDA clamp addressing;
    ss=1 is the `models.metrics.decode_volume` lattice exactly), "exact"
    = g/(ss(N−1)) clamped to [0,1] (pool(p) → net(p) as ss grows).
    """
    from instantvnr_tpu.models.network import network_apply_chunked

    brick, brick3 = _ss_geom(ss)
    mx, my, _ = mc_dims
    dims = jnp.asarray(vol_dims, jnp.float32)  # (dx, dy, dz)
    cx = cell_ids % mx
    cy = (cell_ids // mx) % my
    cz = cell_ids // (mx * my)
    cell = jnp.stack([cx, cy, cz], axis=-1)  # [n, 3]

    l1 = jnp.arange(brick, dtype=jnp.int32)
    lz, ly, lx = jnp.meshgrid(l1, l1, l1, indexing="ij")
    local = jnp.stack([lx, ly, lz], axis=-1).reshape(-1, 3)  # [brick³, 3]

    g = (cell[:, None, :] * (MACROCELL_SIZE * ss) - GHOST * ss
         + local[None, :, :])
    if convention == "exact":
        coords = jnp.clip(g.astype(jnp.float32) / (float(ss) * (dims - 1.0)),
                          0.0, 1.0).reshape(-1, 3)
    else:
        u = jnp.clip(g.astype(jnp.float32) / float(ss), 0.0, dims - 1.0)
        coords = ((u + 0.5) / dims).reshape(-1, 3)
    vals = network_apply_chunked(params, coords, field)[:, 0]
    return vals.reshape(-1, brick3)


@partial(jax.jit, static_argnums=(1,))
def _pack_corners(pool_flat: jnp.ndarray, ss: int = 1) -> jnp.ndarray:
    """[M] texel pool → [M, 8] corner-packed rows (row i = the 8 trilinear
    corners of the dual cell whose min corner is texel i). Flat shifts are
    safe: addressed min-corners never sit on a brick's last row/col/slice
    (local ≤ brick−2 by construction), so no shift crosses a brick."""
    brick, _ = _ss_geom(ss)
    m = pool_flat.shape[0]
    cols = []
    for c in range(8):
        off = (((c >> 2) & 1) * brick * brick + ((c >> 1) & 1) * brick
               + (c & 1))
        if off == 0:
            cols.append(pool_flat)
        else:
            cols.append(jnp.concatenate(
                [pool_flat[off:], jnp.zeros((off,), pool_flat.dtype)]))
    return jnp.stack(cols, axis=1).reshape(m, 8)


def occupied_cells(mc: MacroCell, dilate: int = 1,
                   eps: float = 1e-6) -> np.ndarray:
    """Flat ids of macrocells with max opacity > eps (host-side), dilated
    by `dilate` cells so neighbor-crossing queries (gradient probes,
    boundary jitter) resolve instead of missing."""
    occ = np.asarray(mc.max_opacity) > eps  # [mz, my, mx]
    for _ in range(dilate):
        # wrap-free face dilation (shading probes are axis-aligned ±1 voxel,
        # so face neighbors suffice)
        pad = np.pad(occ, 1, constant_values=False)
        grown = occ.copy()
        for ax in range(3):
            sl_lo = [slice(1, -1)] * 3
            sl_hi = [slice(1, -1)] * 3
            sl_lo[ax] = slice(0, -2)
            sl_hi[ax] = slice(2, None)
            grown |= pad[tuple(sl_lo)] | pad[tuple(sl_hi)]
        occ = grown
    return np.flatnonzero(occ.reshape(-1)).astype(np.int32)


def _lut_and_cells(mc: MacroCell, dilate: int):
    """Shared slot-layout setup (the LUT is the pool's layout contract —
    see refresh_brick_pool): returns (cells [n] flat ids slot-ordered,
    lut [n_cells] slot-or−1, mc_dims, vol_dims). For a fully TF-empty
    scene, cells is one dummy brick no LUT entry points at."""
    cells = occupied_cells(mc, dilate=dilate)
    mc_dims = tuple(int(d) for d in mc.dims)
    vol_dims = tuple(int(d) for d in mc.volume_dims)
    lut = np.full(mc_dims[0] * mc_dims[1] * mc_dims[2], -1, np.int32)
    lut[cells] = np.arange(cells.size, dtype=np.int32)
    if cells.size == 0:
        cells = np.zeros((1,), np.int32)
    return cells, lut, mc_dims, vol_dims


def build_brick_cache(field, params, mc: MacroCell, dilate: int = 1,
                      dtype=jnp.float32, chunk_bricks: int = 32,
                      supersample: int = 1,
                      convention: str = "decoded") -> dict:
    """Decode the occupied bricks and return the sample ctx for
    `brick_sample_fn`. Dispatches the decode in host-side chunks of
    `chunk_bricks` (bounded device programs — the tunnel faults on very
    long ones, CLAUDE.md).

    supersample > 1 decodes at a finer NESTED lattice (see _ss_geom) —
    the "hq" streaming-cache policy: ~(ss·19/20)³× memory for ~h² less
    trilinear error vs the exact network, same per-sample gather count.

    ctx = {"lut" [n_cells] int32 (slot or −1), "packed" [n·brick³, 8],
           "dims" [3] f32, "mcdims" [3] i32, "_render" (),
           "ss" (only when supersample > 1)}
    """
    ss = int(supersample)
    _, brick3 = _ss_geom(ss)
    cells, lut, mc_dims, vol_dims = _lut_and_cells(mc, dilate)
    n = int(cells.size)
    # fewer bricks per dispatch at ss>1: keep device programs comparably
    # sized (brick³ grows ~ss³)
    chunk_bricks = max(1, chunk_bricks // (ss * ss * ss))
    parts = []
    for i in range(0, n, chunk_bricks):
        ids = cells[i:i + chunk_bricks]
        if ids.size < chunk_bricks:
            # pad the tail chunk to the static shape; extra bricks decode
            # a repeated cell and are sliced off below
            ids = np.concatenate(
                [ids, np.full(chunk_bricks - ids.size, ids[-1], np.int32)])
        vals = _decode_brick_chunk(field, params, jnp.asarray(ids),
                                   mc_dims, vol_dims, ss, convention)
        parts.append(vals)
    pool = jnp.concatenate(parts, axis=0)[:n].astype(dtype)
    packed = _pack_corners(pool.reshape(-1), ss)
    return _brick_ctx(lut, packed, vol_dims, mc_dims, mc, ss=ss,
                      convention=convention)


def build_brick_cache_from_grid(vol, mc: MacroCell, dilate: int = 1,
                                dtype=jnp.float32) -> dict:
    """Corner-packed brick pool for a DECODED/GT grid (no network).

    Brick texels are the grid voxels themselves (g = cell·16 − GHOST +
    local, clamp addressing — identical lattice to `build_brick_cache`, but
    exact: no decode), so `brick_sample_fn` reproduces
    `ops.trilinear.sample_volume` on occupied cells up to trilinear
    summation order (packed sum-of-8 vs nested lerps, ≲1e-7). Worth it
    because `sample_volume` issues 8 independent corner gathers while the
    packed pool needs 2 (LUT + one [8]-row) and v5e gather cost is per ROW,
    flat in width (NOTES_ROUND1) — ~4× cheaper sampling for any
    gather-bound consumer (the compacted path tracer above all; its
    samples only ever land in occupied cells, so the pool is exhaustive).
    vol: [dz, dy, dx]; memory = occupied_cells · 20³ · 8 · itemsize.
    """
    cells, lut, mc_dims, _ = _lut_and_cells(mc, dilate)
    vol_np = np.asarray(vol)
    dz, dy, dx = vol_np.shape

    cx = cells % mc_dims[0]
    cy = (cells // mc_dims[0]) % mc_dims[1]
    cz = cells // (mc_dims[0] * mc_dims[1])
    l1 = np.arange(BRICK, dtype=np.int32)
    lz, ly, lx = np.meshgrid(l1, l1, l1, indexing="ij")
    gx = np.clip(cx[:, None] * MACROCELL_SIZE - GHOST + lx.reshape(-1)[None],
                 0, dx - 1)
    gy = np.clip(cy[:, None] * MACROCELL_SIZE - GHOST + ly.reshape(-1)[None],
                 0, dy - 1)
    gz = np.clip(cz[:, None] * MACROCELL_SIZE - GHOST + lz.reshape(-1)[None],
                 0, dz - 1)
    pool = vol_np[gz, gy, gx].astype(np.float32)  # [n, BRICK³]
    packed = _pack_corners(jnp.asarray(pool.reshape(-1)).astype(dtype))
    return _brick_ctx(lut, packed, (dx, dy, dz), mc_dims, mc)


def _brick_ctx(lut, packed, vol_dims, mc_dims, mc: MacroCell,
               ss: int = 1, convention: str = "decoded") -> dict:
    """Assemble the sample ctx. Besides the LUT, it carries "occ_slot"
    [n_cells, 2] = (macrocell max opacity, slot) rows for the wavefront's
    fused sampling path (raymarch._emit_samples occ_aux): the emit probe
    gathers this row instead of the scalar occupancy (same cost — row
    gathers are flat in width) and the slot rides to the sample, which
    then needs ONE packed-pool gather instead of LUT + pool. Column 0 is
    mc.max_opacity verbatim so emission is bit-identical to the unfused
    path. Omitted past 2^24 cells (slot/cell ids ride f32 lanes exactly
    only below that; >2^24 cells = >4096³ volumes at 16³ cells)."""
    ctx = {
        "lut": jnp.asarray(lut),
        "packed": packed,
        "dims": jnp.asarray(vol_dims, jnp.float32),
        "mcdims": jnp.asarray(mc_dims, jnp.int32),
        "_render": (),
    }
    if ss > 1:
        # leafless static supersample marker (k = len) — absent at ss=1 so
        # every existing 1× ctx keeps its treedef (nothing retraces)
        ctx["ss"] = ((),) * ss
    if convention == "exact":
        ctx["conv_exact"] = ()  # leafless static marker (ctx_convention)
    if lut.size <= (1 << 24):
        ctx["occ_slot"] = jnp.stack(
            [mc.max_opacity.reshape(-1).astype(jnp.float32),
             jnp.asarray(lut, jnp.float32)], axis=1)
    return ctx


@jax.jit
def _occ_parity(occ_slot, max_opacity):
    return jnp.all(occ_slot[:, 0]
                   == max_opacity.reshape(-1).astype(jnp.float32))


def emission_parity_handle(mc: MacroCell, ctx):
    """Async check of the LOAD-BEARING fused-emission invariant: the ctx's
    occ_slot column 0 must equal mc.max_opacity, or the fused occ_slot
    sampling row (raymarch occ_aux) emits against stale occupancy and the
    image silently diverges from the unfused path (CLAUDE.md invariant,
    _brick_ctx). Returns an async bool handle (copy_to_host_async already
    issued — resolving it later costs no extra round-trip) or None when the
    ctx carries no occ_slot. Render paths resolve it at the next settle
    point, never per dispatch."""
    occ = ctx.get("occ_slot") if isinstance(ctx, dict) else None
    if occ is None:
        return None
    if occ.shape[0] != int(np.prod(np.asarray(mc.dims))):
        return np.bool_(False)  # wrong macrocell entirely — instantly loud
    h = _occ_parity(occ, mc.max_opacity)
    h.copy_to_host_async()
    return h


@jax.jit
def _pool_update(packed, rows, start):
    """Swap refreshed corner-packed rows into the pool. NOT donated: a
    previously dispatched frame may still hold the old buffer; the copy is
    one HBM pass (~131 MB at 128³, sub-ms)."""
    return jax.lax.dynamic_update_slice(packed, rows, (start, jnp.int32(0)))


def refresh_brick_pool(field, params, ctx: dict,
                       start: int = 0, n_bricks: int | None = None,
                       chunk_bricks: int = 32) -> tuple:
    """Re-decode bricks [start, start+n_bricks) of an existing pool against
    FRESH params — the incremental online-training refresh (the reference
    re-uploads inference params per epoch, tcnn_network.h:142-156; here the
    pool is the inference surface, so it re-decodes instead).

    The brick list comes from the CTX'S OWN LUT (slot order), never from a
    recomputed occupancy: online training can grow the live macrocell
    between build and refresh, and a re-derived cell list would shift slot
    assignments — silently writing each brick into a NEIGHBORING cell's
    pool rows. The LUT is the pool's layout contract; new-occupied cells
    simply stay uncached until the next full rebuild. Per-chunk corner
    packing is valid in isolation because rows near a brick's tail are
    never addressed (local ≤ BRICK−2), so cross-chunk shift spill lands
    only in dead rows.

    Returns (new ctx, next_start) where next_start wraps to 0 after the
    last brick — callers spread full refreshes across frames by chaining:
        ctx, cur = refresh_brick_pool(field, params, ctx, cur, budget)
    """
    lut_np = np.asarray(ctx["lut"])
    cached = np.flatnonzero(lut_np >= 0).astype(np.int32)
    if cached.size == 0:
        return ctx, 0
    # cells ordered by their SLOT (pool row block), as built
    cells = cached[np.argsort(lut_np[cached], kind="stable")]
    mcd = tuple(int(d) for d in np.asarray(ctx["mcdims"]))
    mc_dims = (mcd[0], mcd[1], mcd[2])
    vol_dims = tuple(int(d) for d in np.asarray(ctx["dims"]))
    total = int(cells.size)
    start = min(start, total)
    n = total - start if n_bricks is None else min(n_bricks, total - start)
    if n <= 0:
        return ctx, 0

    ss = ctx_supersample(ctx)
    conv = ctx_convention(ctx)
    _, brick3 = _ss_geom(ss)
    chunk_bricks = max(1, chunk_bricks // (ss * ss * ss))
    packed = ctx["packed"]
    for i in range(start, start + n, chunk_bricks):
        ids = cells[i:min(i + chunk_bricks, start + n)]
        done = ids.size
        if ids.size < chunk_bricks:
            ids = np.concatenate(
                [ids, np.full(chunk_bricks - ids.size, ids[-1], np.int32)])
        vals = _decode_brick_chunk(field, params, jnp.asarray(ids),
                                   mc_dims, vol_dims, ss, conv)[:done]
        rows = _pack_corners(vals.reshape(-1).astype(packed.dtype), ss)
        packed = _pool_update(packed, rows, jnp.int32(i * brick3))
    new_ctx = dict(ctx)
    new_ctx["packed"] = packed
    nxt = start + n
    return new_ctx, (0 if nxt >= total else nxt)


def brick_cache_bytes(mc: MacroCell, dilate: int = 1,
                      dtype=jnp.float32, supersample: int = 1) -> int:
    """Device bytes the packed pool would take (for auto/memory gating)."""
    n = max(int(occupied_cells(mc, dilate=dilate).size), 1)
    _, brick3 = _ss_geom(int(supersample))
    return n * brick3 * 8 * jnp.dtype(dtype).itemsize


# ---------------------------------------------------------------------------
# Lazy (view-driven) brick decode


def view_cells(mc: MacroCell, cam, width: int, height: int, scale=None,
               margin: float = 4.0, cells: np.ndarray | None = None
               ) -> np.ndarray:
    """Flat ids of the macrocells whose (margin-inflated) AABB intersects
    the camera's view frustum — host-side numpy, conservative.

    Every sample a primary ray can produce lies inside the view pyramid
    (camera.camera_rays spans sx, sy ∈ [0,1] including pixel jitter), so the
    returned set is a superset of the cells any wavefront sample, emit
    probe, or ±1-voxel gradient probe (< margin) can touch. The test is the
    classic per-plane AABB rejection (a cell survives unless all 8 corners
    fall outside one plane), i.e. false positives near frustum edges are
    possible but misses are not. Frustum planes are built in VOXEL space
    (world dirs through the anisotropic `scale`, transform.rays_to_voxel),
    where cells are axis-aligned boxes.

    `cells` restricts the test to the given flat ids (default: all cells).
    """

    def nrm(v):
        return v / max(float(np.linalg.norm(v)), 1e-12)

    dims = np.asarray([float(d) for d in mc.volume_dims], np.float64)
    s = (np.ones(3, np.float64) if scale is None
         else np.asarray(scale, np.float64))
    eye = np.asarray(cam.eye, np.float64) / s + dims / 2.0
    direction = nrm(np.asarray(cam.center, np.float64)
                    - np.asarray(cam.eye, np.float64))
    t = 2.0 * np.tan(np.deg2rad(float(cam.fovy)) / 2.0)
    aspect = width / float(height)
    horizontal = t * aspect * nrm(np.cross(direction,
                                           np.asarray(cam.up, np.float64)))
    vertical = np.cross(horizontal, direction) / aspect
    # the 4 image-corner ray directions, in cyclic order, voxel space
    cd = [(direction + (sx - 0.5) * horizontal + (sy - 0.5) * vertical) / s
          for sx, sy in ((0, 0), (1, 0), (1, 1), (0, 1))]
    dc = direction / s
    # behind-the-eye cull plane: half-space normals map world→voxel by the
    # INVERSE-TRANSPOSE (dot(p_w−eye_w, d) = dot(p_v−eye_v, s·d)), unlike
    # the ray directions above which map by 1/s — using direction/s here
    # would wrongly cull in-frustum cells under anisotropic scaling
    planes = [s * direction]
    for i in range(4):
        # a plane spanned by two rays through the eye maps to the plane
        # spanned by the mapped rays, so side normals come straight from
        # the voxel-space corner dirs; orient inward (dc is interior)
        n = np.cross(cd[i], cd[(i + 1) % 4])
        if float(np.dot(n, dc)) < 0:
            n = -n
        planes.append(n)
    planes = np.stack(planes)  # [5, 3], inward normals through the eye

    mx, my, mz = (int(d) for d in mc.dims)
    if cells is None:
        cells = np.arange(mx * my * mz, dtype=np.int32)
    cells = np.asarray(cells, np.int32)
    if cells.size == 0:
        return cells
    cx = cells % mx
    cy = (cells // mx) % my
    cz = cells // (mx * my)
    lo = (np.stack([cx, cy, cz], -1).astype(np.float64) * MACROCELL_SIZE
          - margin)
    hi = lo + MACROCELL_SIZE + 2.0 * margin
    rel = np.empty((cells.size, 8, 3), np.float64)
    for c in range(8):
        sel = np.array([(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1], bool)
        rel[:, c, :] = np.where(sel, hi, lo) - eye
    d = rel @ planes.T  # [n, 8, 5]
    inside = (d.max(axis=1) >= 0.0).all(axis=1)
    return cells[inside]


def light_swept_cells(mc: MacroCell, cells: np.ndarray,
                      light_voxel) -> np.ndarray:
    """Conservative superset of the macrocells a ray starting anywhere in
    `cells` and marching along +light_voxel can touch before leaving the
    grid — the bound for lazy SSH decode (deferred shadow rays leave the
    view frustum; decoding the WHOLE pool forfeits laziness, VERDICT r3
    weak #5). Host-side numpy: shear the cell mask along the light
    direction in ≤½-cell substeps, OR-accumulate until the moving front
    exits the grid, then dilate by one cell (Chebyshev) to cover substep
    rounding and in-cell ray origins. Same geometry family as the sheared
    shadow volume (render/shadow.py)."""
    mx, my, mz = (int(d) for d in mc.dims)
    cells = np.asarray(cells, np.int64)
    mask = np.zeros((mz, my, mx), bool)
    mask.reshape(-1)[cells] = True

    d = np.asarray(light_voxel, np.float64)
    n = float(np.max(np.abs(d)))
    if n < 1e-12 or not mask.any():
        swept = mask
    else:
        step = d / n * 0.5  # (x, y, z) in CELL units, ≤ ½ cell per substep
        swept = mask.copy()
        cur = mask
        prev_off = np.zeros(3, np.int64)
        k = 1
        # cap: crossing the longest axis at ½ cell per substep, plus slack
        cap = 2 * (mx + my + mz) + 4
        while cur.any() and k <= cap:
            off = np.round(step * k).astype(np.int64)  # (dx, dy, dz)
            delta = off - prev_off
            prev_off = off
            if np.any(delta):
                dx, dy, dz = (int(v) for v in delta)
                nxt = np.zeros_like(cur)
                src = [slice(max(-dz, 0), mz - max(dz, 0)),
                       slice(max(-dy, 0), my - max(dy, 0)),
                       slice(max(-dx, 0), mx - max(dx, 0))]
                dst = [slice(max(dz, 0), mz - max(-dz, 0)),
                       slice(max(dy, 0), my - max(-dy, 0)),
                       slice(max(dx, 0), mx - max(-dx, 0))]
                nxt[tuple(dst)] = cur[tuple(src)]
                cur = nxt
                swept |= cur
            k += 1
    # 1-cell Chebyshev dilation (substep rounding ≤½ cell + origin ≤1 cell)
    pad = np.pad(swept, 1, constant_values=False)
    out = np.zeros_like(swept)
    for dz in (0, 1, 2):
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                out |= pad[dz:dz + mz, dy:dy + my, dx:dx + mx]
    return np.flatnonzero(out.reshape(-1)).astype(np.int32)


def _pool_scatter_body(packed, rows, starts):
    """Write per-brick corner-packed row blocks at arbitrary slot offsets
    in ONE program (lax.fori of dynamic_update_slice). rows [c, BRICK³, 8],
    starts [c] row offsets."""
    def body(i, pk):
        return jax.lax.dynamic_update_slice(
            pk, rows[i], (starts[i], jnp.int32(0)))

    return jax.lax.fori_loop(0, rows.shape[0], body, packed)


# first chunk of an ensure: the caller's ctx still references the pool —
# NOT donated (one full-pool copy, same reason as _pool_update); every
# following chunk's input is an exclusively-owned intermediate, so donation
# keeps the update in place (no O(chunks) full-pool HBM passes on a
# big-volume first frame)
_pool_scatter_bricks = jax.jit(_pool_scatter_body)
_pool_scatter_bricks_donated = jax.jit(_pool_scatter_body,
                                       donate_argnums=(0,))


class LazyBrickCache:
    """View-driven lazy brick decode — `build_brick_cache` semantics with
    the per-brick decode deferred until a view can touch the brick.

    `build_brick_cache` decodes EVERY occupied brick up front — right at
    bench scale (~0.7 s at 128³) but it delays the first frame after a
    params/TF edit on big volumes (decode time scales with occupied cells).
    This manager allocates the full-capacity pool (zeros) + LUT immediately
    and decodes on demand:

      - `ensure_view(cam, w, h, scale)` decodes the not-yet-decoded
        occupied bricks intersecting the camera frustum (`view_cells`) —
        a superset of everything the frame's rays can sample.
      - `ensure_all()` completes the pool; REQUIRED before SSH shading,
        whose deferred shadow rays march far outside the view frustum.
      - `set_params(params)` marks every brick stale (online training);
        the next ensure re-decodes against the new params. `refresh(params,
        budget_bricks)` bounds that hitch: it re-decodes at most N of the
        currently decoded bricks per call (round-robin, like
        refresh_brick_pool) and leaves undecoded bricks to their
        first-visibility decode under the new params.

    Memory is NOT reduced — capacity covers all occupied bricks because
    slot assignments are the LUT's layout contract (refresh_brick_pool
    docstring); the win is time-to-first-frame. `self.ctx` is a plain
    brick ctx: the samplers, the fused emit path, and the wavefront
    programs consume it unchanged (only the "packed" binding moves between
    ensures, so nothing retraces). Never-decoded occupied cells sample as
    0.0; after set_params, not-yet-re-ensured bricks sample the PREVIOUS
    params' field until their next ensure — so callers MUST ensure_* for
    the rays they are about to dispatch (api.VNRenderer does this on every
    render()).
    """

    def __init__(self, field, params, mc: MacroCell, dilate: int = 1,
                 dtype=jnp.float32, chunk_bricks: int = 32,
                 supersample: int = 1, convention: str = "decoded"):
        cells, lut, self._mc_dims, self._vol_dims = _lut_and_cells(
            mc, dilate)
        self._ss = int(supersample)
        _, self._brick3 = _ss_geom(self._ss)
        n = int(cells.size)
        # pool row offsets (slot · brick³) are computed in int32 throughout
        # (they also ride f32 lanes in the fused occ_slot path)
        assert n * self._brick3 < (1 << 31), (
            f"brick pool too large for int32 row offsets ({n} bricks)")
        self._cells = cells  # slot i ↔ cells[i] (the LUT's inverse)
        self._lut_np = lut
        # slots no LUT entry points at (the TF-empty dummy brick) can never
        # be marked decoded by ensure_cells — keep them always-"decoded" so
        # a degenerate pool still reaches the host-free steady state
        # (n_decoded == n); re-applied on every restale (set_params)
        self._orphan = np.setdiff1d(np.arange(n), lut[lut >= 0])
        self._decoded = np.zeros(n, bool)
        self._decoded[self._orphan] = True
        self._cursor = 0  # round-robin refresh() position (slot index)
        self.field = field
        self.params = params
        self.mc = mc
        ss3 = self._ss ** 3
        self.chunk = max(1, int(chunk_bricks) // ss3)
        self._conv = convention
        self.ctx = _brick_ctx(lut, jnp.zeros((n * self._brick3, 8), dtype),
                              self._vol_dims, self._mc_dims, mc, ss=self._ss,
                              convention=convention)

    @property
    def n_bricks(self) -> int:
        return int(self._cells.size)

    @property
    def n_decoded(self) -> int:
        return int(self._decoded.sum())

    def set_params(self, params):
        """New network params: every brick is stale until re-ensured."""
        self.params = params
        self._decoded[:] = False
        self._decoded[self._orphan] = True

    def ensure_cells(self, cell_ids: np.ndarray) -> int:
        """Decode the not-yet-decoded occupied bricks among `cell_ids`
        (flat macrocell ids; non-occupied ids are ignored). Returns the
        number of bricks decoded."""
        if np.asarray(cell_ids).size == 0:
            return 0
        slots = self._lut_np[np.asarray(cell_ids, np.int64)]
        slots = np.unique(slots[slots >= 0])
        need = slots[~self._decoded[slots]]
        if need.size == 0:
            return 0
        packed = self.ctx["packed"]
        ids = self._cells[need]
        for i in range(0, need.size, self.chunk):
            sl = need[i:i + self.chunk].astype(np.int32)
            ch = ids[i:i + self.chunk]
            if ch.size < self.chunk:
                # pad to the static chunk shape; duplicates rewrite the
                # same rows (harmless)
                pad = self.chunk - ch.size
                ch = np.concatenate([ch, np.full(pad, ch[-1], np.int32)])
                sl = np.concatenate([sl, np.full(pad, sl[-1], np.int32)])
            vals = _decode_brick_chunk(self.field, self.params,
                                       jnp.asarray(ch), self._mc_dims,
                                       self._vol_dims, self._ss, self._conv)
            # per-chunk packing is valid in isolation (cross-chunk shift
            # spill lands only in dead rows — refresh_brick_pool docstring)
            rows = _pack_corners(vals.reshape(-1).astype(packed.dtype),
                                 self._ss)
            scatter = (_pool_scatter_bricks if i == 0
                       else _pool_scatter_bricks_donated)
            packed = scatter(packed,
                             rows.reshape(self.chunk, self._brick3, 8),
                             jnp.asarray(sl * self._brick3))
        self._decoded[need] = True
        self.ctx = dict(self.ctx)
        self.ctx["packed"] = packed
        return int(need.size)

    def ensure_view(self, cam, width: int, height: int, scale=None,
                    margin: float = 4.0) -> int:
        """Decode every undecoded brick the (cam, width, height, scale)
        frustum can touch. Returns the number decoded (0 in steady state)."""
        pending = self._cells[~self._decoded]
        if pending.size == 0:
            return 0
        return self.ensure_cells(view_cells(
            self.mc, cam, width, height, scale=scale, margin=margin,
            cells=pending))

    def ensure_all(self) -> int:
        """Complete the pool (e.g. before SSH shadow rays)."""
        return self.ensure_cells(self._cells[~self._decoded])

    def ensure_view_ssh(self, cam, width: int, height: int, light_voxel,
                        scale=None, margin: float = 4.0) -> int:
        """Decode everything an SSH frame can touch: the view-frustum set
        PLUS its light-swept superset (deferred shadow rays march from
        in-frustum samples along +light_voxel, so they stay inside the
        sweep). A strict subset of ensure_all on any view whose frustum
        misses part of the volume. Returns the number decoded."""
        if self.n_decoded == self.n_bricks:
            return 0
        frustum = view_cells(self.mc, cam, width, height, scale=scale,
                             margin=margin)
        return self.ensure_cells(
            light_swept_cells(self.mc, frustum, light_voxel))

    def refresh(self, params, budget_bricks: int | None = None) -> int:
        """Online-training refresh against fresh `params`, bounded like
        refresh_brick_pool: re-decode at most `budget_bricks` of the
        currently DECODED bricks per call (round-robin over slots);
        un-refreshed decoded bricks keep showing the previous epoch until
        the cursor reaches them, never-decoded bricks wait for their
        first-visibility decode under the new params. budget_bricks=None
        restales everything instead (full visible re-decode at the next
        ensure). Returns the number of bricks re-decoded now."""
        if budget_bricks is None:
            self.set_params(params)
            return 0
        self.params = params
        n = self.n_bricks
        order = (np.arange(n) + self._cursor) % n
        # orphan (no-LUT-entry) slots are permanently "decoded" placeholders
        # — restaling one would wedge n_decoded below n_bricks forever
        dec = order[self._decoded[order]
                    & (self._lut_np[self._cells[order]] >= 0)]
        sel = dec[:budget_bricks]
        if sel.size == 0:
            return 0
        self._cursor = (int(sel[-1]) + 1) % n
        self._decoded[sel] = False
        return self.ensure_cells(self._cells[sel])


def _pool_lookup(ctx: dict, p: jnp.ndarray, cell: jnp.ndarray,
                 slot: jnp.ndarray) -> jnp.ndarray:
    """Shared tail of both samplers: one packed-pool row gather + the
    trilinear reduction, given the (cell, slot) pair already resolved."""
    ss = ctx_supersample(ctx)
    brick, brick3 = _ss_geom(ss)
    dims = ctx["dims"]  # (dx, dy, dz) f32
    # texel coords: p·ss(N−1) ∈ [0, ss(N−1)] (the remap p(1−1/N)+0.5/N,
    # ×N, −0.5, refined ss×: texel g sits at fractional voxel g/ss)
    x = jnp.clip(p * (ss * (dims - 1.0)), 0.0, ss * (dims - 1.0))
    i0 = jnp.floor(x).astype(jnp.int32)
    frac = x - i0.astype(jnp.float32)

    local = i0 - (cell * (MACROCELL_SIZE * ss) - GHOST * ss)
    # defensively clamp: out-of-brick locals only occur for miss queries
    local = jnp.clip(local, 0, brick - 2)
    lflat = (local[:, 2] * brick + local[:, 1]) * brick + local[:, 0]
    idx = jnp.where(slot >= 0, slot, 0) * brick3 + lflat
    rows = ctx["packed"][idx].astype(jnp.float32)  # [N, 8]

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    wx = jnp.stack([1.0 - fx, fx], -1)  # [N, 2]
    wy = jnp.stack([1.0 - fy, fy], -1)
    wz = jnp.stack([1.0 - fz, fz], -1)
    # weights in _CORNER_OFFS order (x fastest): w[c] = wz[cz]·wy[cy]·wx[cx]
    w8 = (wz[:, :, None, None] * wy[:, None, :, None]
          * wx[:, None, None, :]).reshape(-1, 8)
    val = jnp.sum(rows * w8, axis=-1)
    return jnp.where(slot >= 0, val, 0.0)


def brick_sample_fn(ctx: dict, p: jnp.ndarray) -> jnp.ndarray:
    """Sample the brick pool at object-space positions p [N,3] → values [N].

    Same convention as `ops.trilinear.sample_volume` (cell-centered remap,
    clamp addressing). Queries whose macrocell is not cached return 0.0 —
    by construction those cells are TF-empty (the marchers never emit
    samples there; `dilate` covers shading probes that cross cell walls).
    """
    dims = ctx["dims"]  # (dx, dy, dz) f32
    mcd = ctx["mcdims"]  # (mx, my, mz) i32
    w = float(MACROCELL_SIZE)

    pos_v = p * dims
    cell = jnp.clip(jnp.floor(pos_v / w).astype(jnp.int32), 0,
                    mcd[None, :] - 1)
    cflat = (cell[:, 2] * mcd[1] + cell[:, 1]) * mcd[0] + cell[:, 0]
    slot = ctx["lut"][cflat]
    return _pool_lookup(ctx, p, cell, slot)


def _brick_sample_fused(ctx: dict, p: jnp.ndarray, slot: jnp.ndarray,
                        cellflat: jnp.ndarray) -> jnp.ndarray:
    """Fused-path sampler: the emit probe already gathered this sample's
    (slot, flat cell id) from ctx["occ_slot"], so the cell→slot LUT gather
    is skipped — ONE pool gather per sample. Values equal brick_sample_fn
    exactly: the probed cell can differ from floor(pos) only across a
    shared face, where both bricks replicate the same source texels in
    their ghost rows."""
    mcd = ctx["mcdims"]
    cf = cellflat.astype(jnp.int32)
    cx = cf % mcd[0]
    cy = (cf // mcd[0]) % mcd[1]
    cz = cf // (mcd[0] * mcd[1])
    cell = jnp.stack([cx, cy, cz], axis=-1)
    return _pool_lookup(ctx, p, cell, slot.astype(jnp.int32))


brick_sample_fn.fused = _brick_sample_fused
