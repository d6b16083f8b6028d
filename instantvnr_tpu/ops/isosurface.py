"""Isosurface extraction — vectorized marching tetrahedra.

Capability counterpart of the reference's 5-phase GPU marching cubes
(`core/marching_cube.cu:397-450`, exported as vnrMarchingCube /
vnrSaveTriangles, marching_cube.cuh:4-10), which also runs directly on the
neural network. TPU redesign choices:

- marching TETRAHEDRA (6-tet cube decomposition) instead of marching cubes:
  the per-case tables are 16 entries (hand-verifiable) instead of 256×16,
  and the emission is branch-free — every (cell, tet) slot writes ≤2
  triangles into a fixed-capacity buffer with a validity mask, which is the
  TPU answer to the reference's scan/compact phases (no device-side stream
  compaction on TPU; the compaction is one boolean gather on the host).
- runs on any [dz,dy,dx] grid (ground truth or decoded) and, like the
  reference's __Network variant, directly on the neural representation by
  decoding z-slabs with 1-voxel overlap (extract_isosurface_network).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Kuhn/Freudenthal 6-tetrahedron subdivision: each tet is a monotone
# bit-adding path 0 → 7 (one axis at a time), so the triangulation induced
# on every cube face has the same global diagonal orientation — adjacent
# cubes share face triangulations exactly (crack-free surface).
# Cube corners: bit 0 = +x, bit 1 = +y, bit 2 = +z (corner index 0..7).
_TETS = np.array(
    [
        [0, 1, 3, 7],  # x, y, z
        [0, 1, 5, 7],  # x, z, y
        [0, 2, 3, 7],  # y, x, z
        [0, 2, 6, 7],  # y, z, x
        [0, 4, 5, 7],  # z, x, y
        [0, 4, 6, 7],  # z, y, x
    ],
    np.int32,
)

# tet edges: (corner pair) per edge id 0..5 for local corners (a, b, c, d)
_EDGE_PAIRS = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32
)

# per-case triangles as edge ids, -1 = unused. Case bit i = corner i inside.
# Winding convention: in a POSITIVE-chirality tet, triangles are wound so
# the normal points toward the OUTSIDE (< isovalue) region.
_CASE_TRIS = -np.ones((16, 2, 3), np.int32)
_CASE_TRIS[1, 0] = (0, 1, 2)       # a inside
_CASE_TRIS[2, 0] = (0, 4, 3)       # b
_CASE_TRIS[4, 0] = (1, 3, 5)       # c
_CASE_TRIS[8, 0] = (2, 5, 4)       # d
_CASE_TRIS[3] = [(1, 2, 4), (1, 4, 3)]    # a, b
_CASE_TRIS[5] = [(0, 3, 5), (0, 5, 2)]    # a, c
_CASE_TRIS[9] = [(0, 5, 4), (0, 1, 5)]    # a, d (complement of 6)
_CASE_TRIS[6] = [(0, 4, 5), (0, 5, 1)]    # b, c
_CASE_TRIS[10] = [(0, 2, 5), (0, 5, 3)]   # b, d
_CASE_TRIS[12] = [(1, 4, 2), (1, 3, 4)]   # c, d (complement of 3)
_CASE_TRIS[7, 0] = (2, 4, 5)       # d outside (complement of 8)
_CASE_TRIS[11, 0] = (1, 5, 3)      # c outside
_CASE_TRIS[13, 0] = (0, 3, 4)      # b outside
_CASE_TRIS[14, 0] = (0, 2, 1)      # a outside

# Half of the 6 Kuhn tets are mirror images (negative signed volume); the
# one case table describes positive-chirality tets, so mirrored tets emit
# with reversed winding. Build a per-tet table with those flipped so EVERY
# triangle comes out consistently outward-wound (consumers derive normals
# from winding: OBJ viewers, culling, signed volume).
_corner_off_np = np.array(
    [[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], np.float32)


def _tet_signed_volume(tet) -> float:
    a, b, c, d = _corner_off_np[np.asarray(tet)]
    return float(np.dot(np.cross(b - a, c - a), d - a))


_CASE_TRIS_PER_TET = np.tile(_CASE_TRIS[None], (6, 1, 1, 1))
for _i, _tet in enumerate(_TETS):
    if _tet_signed_volume(_tet) < 0:
        _CASE_TRIS_PER_TET[_i] = _CASE_TRIS_PER_TET[_i][..., ::-1]


@partial(jax.jit, static_argnums=())
def _extract_slab(grid: jnp.ndarray, isovalue: jnp.ndarray,
                  z_offset: jnp.ndarray):
    """grid [sz, sy, sx] → (tris [N,6,2,3,3] float32 voxel coords, valid
    [N,6,2] bool, ids [N,6,2,3,4] int32), N = (sz−1)(sy−1)(sx−1) cells.

    `ids` carries each emitted vertex's lattice-edge identity as the two
    global grid-corner endpoints, split (z, y·sx+x) per endpoint so the
    device side stays int32-safe — the host welds on them (weld_triangles).
    """
    sz, sy, sx = grid.shape
    nz, ny, nx = sz - 1, sy - 1, sx - 1
    n = nz * ny * nx

    # corner values per cell, corner index c = dz·4 + dy·2 + dx
    corners = jnp.stack(
        [
            grid[dz : dz + nz, dy : dy + ny, dx : dx + nx]
            for dz in (0, 1)
            for dy in (0, 1)
            for dx in (0, 1)
        ],
        axis=-1,
    )
    vals = corners.reshape(n, 8)

    zz, yy, xx = jnp.meshgrid(
        jnp.arange(nz, dtype=jnp.float32),
        jnp.arange(ny, dtype=jnp.float32),
        jnp.arange(nx, dtype=jnp.float32),
        indexing="ij",
    )
    base = jnp.stack(
        [xx.reshape(-1), yy.reshape(-1), zz.reshape(-1) + z_offset], axis=-1
    )  # [n, 3] cell origin, (x, y, z) voxel index space

    # corner offsets (x, y, z) for corner index c = dz·4 + dy·2 + dx
    corner_off = jnp.asarray(
        [[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)], jnp.float32
    )

    tets = jnp.asarray(_TETS)  # [6, 4]
    tet_vals = vals[:, tets]  # [n, 6, 4]
    inside = tet_vals > isovalue
    case = (
        inside[..., 0].astype(jnp.int32)
        + 2 * inside[..., 1].astype(jnp.int32)
        + 4 * inside[..., 2].astype(jnp.int32)
        + 8 * inside[..., 3].astype(jnp.int32)
    )  # [n, 6]

    # crossing position on each of the 6 tet edges: [n, 6tet, 6edge, 3]
    pairs = jnp.asarray(_EDGE_PAIRS)  # [6, 2]
    ca = tets[:, pairs[:, 0]]  # [6tet, 6edge] global cube-corner ids
    cb = tets[:, pairs[:, 1]]
    va = tet_vals[:, :, pairs[:, 0]]  # [n, 6, 6]
    vb = tet_vals[:, :, pairs[:, 1]]
    denom = vb - va
    t = jnp.where(jnp.abs(denom) > 1e-12, (isovalue - va) / denom, 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    pa = corner_off[ca]  # [6, 6, 3]
    pb = corner_off[cb]
    edge_pos = (
        base[:, None, None, :] + pa[None] + t[..., None] * (pb - pa)[None]
    )  # [n, 6, 6, 3]

    case_tris = jnp.asarray(_CASE_TRIS_PER_TET)  # [6, 16, 2, 3]
    tri_edges = case_tris[jnp.arange(6)[None, :], case]  # [n, 6, 2, 3]
    valid = tri_edges[..., 0] >= 0  # [n, 6, 2]
    safe = jnp.maximum(tri_edges, 0)
    # gather each triangle's 3 edge positions:
    # edge_pos [n,6,1,1,6,3] taken along the edge axis by safe [n,6,2,3,1,1]
    g = jnp.take_along_axis(
        edge_pos[:, :, None, None, :, :],
        safe[..., None, None],
        axis=4,
    )  # [n, 6, 2, 3, 1, 3]
    tris = g[..., 0, :]  # [n, 6, 2, 3, 3]

    # lattice-edge identity of every emitted vertex: the (global) ids of the
    # two grid corners its tet edge connects. Within each tet, corner pairs
    # are ascending cube-corner indices, and cube-corner index order equals
    # global-id order — so a lattice edge shared by neighboring cells/tets
    # is presented with the SAME (a, b) orientation everywhere, making both
    # the interpolation t and the vertex position bit-identical across all
    # its occurrences (what weld_triangles relies on).
    ibase = jnp.stack([
        xx.reshape(-1).astype(jnp.int32),
        yy.reshape(-1).astype(jnp.int32),
        zz.reshape(-1).astype(jnp.int32) + z_offset.astype(jnp.int32),
    ], axis=-1)  # [n, 3] integer cell origin (x, y, z)
    ioff = corner_off.astype(jnp.int32)  # [8, 3]

    def corner_id2(cids):  # [6,6] cube-corner ids → ([n,6,6] gz, [n,6,6] gyx)
        off = ioff[cids]  # [6, 6, 3]
        gx = ibase[:, None, None, 0] + off[None, ..., 0]
        gy = ibase[:, None, None, 1] + off[None, ..., 1]
        gz = ibase[:, None, None, 2] + off[None, ..., 2]
        return gz, gy * np.int32(sx) + gx

    za, yxa = corner_id2(ca)
    zb, yxb = corner_id2(cb)
    ids4 = jnp.stack([za, yxa, zb, yxb], axis=-1)  # [n, 6, 6, 4]
    ids = jnp.take_along_axis(ids4[:, :, None, :, :], safe[..., None],
                              axis=3)  # [n, 6, 2, 3, 4]
    return tris, valid, ids


def weld_triangles(soup: np.ndarray, ids: np.ndarray):
    """Weld a triangle soup into an indexed mesh on exact lattice-edge keys.

    soup [k, 3, 3] float32 positions, ids [k, 3, 4] int32 (gz_a, gyx_a,
    gz_b, gyx_b) per vertex. Every crossing of the same (unordered) lattice
    edge is computed bit-identically by _extract_slab, so a host-side
    np.unique over the edge keys is an EXACT weld (no quantization) — the
    reference's scan/compact MC path produces compact vertex buffers the
    same way (marching_cube.cu:397-403). Returns (verts [m,3], faces
    [k,3] int32 into verts), m ≈ k/2 for closed surfaces (vs 3k unwelded).
    """
    if len(soup) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    ids = ids.astype(np.int64).reshape(-1, 4)
    # a lattice edge's key = its two global corner ids, unordered. Corner
    # ids stay < 2^62 combined for any grid whose corner count fits int64.
    span = int(ids[:, [1, 3]].max()) + 1  # max gyx + 1 ≤ sy·sx
    ga = ids[:, 0] * span + ids[:, 1]
    gb = ids[:, 2] * span + ids[:, 3]
    lo = np.minimum(ga, gb)
    hi = np.maximum(ga, gb)
    n_corners = int(hi.max()) + 1
    if n_corners < (1 << 31):  # scalar keys (fast path; ≤ ~1290³ grids)
        keys = lo * n_corners + hi
        _, first, inv = np.unique(keys, return_index=True,
                                  return_inverse=True)
    else:  # row-wise unique for gigantic grids
        _, first, inv = np.unique(np.stack([lo, hi], axis=1), axis=0,
                                  return_index=True, return_inverse=True)
    verts = soup.reshape(-1, 3)[first]
    faces = inv.astype(np.int32).reshape(-1, 3)
    return verts, faces


def _extract_loop(get_slab, dz: int, isovalue: float, slab: int,
                  weld: bool):
    """Shared slab loop + host compaction + verts/faces epilogue.

    get_slab(z, n) → [n, sy, sx] grid rows z..z+n (1-voxel overlap between
    chunks comes from the z += slab stride with n = slab+1 rows)."""
    out_v = []
    out_i = []
    z = 0
    while z < dz - 1:
        n = min(slab + 1, dz - z)
        tris, valid, ids = _extract_slab(get_slab(z, n),
                                         jnp.float32(isovalue),
                                         jnp.float32(z))
        mask = np.asarray(valid)
        out_v.append(np.asarray(tris)[mask])  # [k, 3, 3]
        if weld:
            out_i.append(np.asarray(ids)[mask])  # [k, 3, 4]
        z += slab
    v = (np.concatenate(out_v, axis=0) if out_v
         else np.zeros((0, 3, 3), np.float32))
    if weld:
        i = (np.concatenate(out_i, axis=0) if out_i
             else np.zeros((0, 3, 4), np.int32))
        return weld_triangles(v, i)
    verts = v.reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    return verts, faces


def extract_isosurface(grid, isovalue: float, slab: int = 32,
                       weld: bool = True):
    """Marching tetrahedra over a full grid, z-slab chunks with 1-voxel
    overlap → (vertices [M,3] float32 voxel coords, faces [T,3] int32).
    Host-side compaction (the reference's scan/compact phases); by default
    shared edge-crossings are welded into an indexed mesh (exact, see
    weld_triangles — marching_cube.cu:397-403 parity). weld=False keeps
    the raw triangle soup (verts = 3·T, faces = arange)."""
    grid = jnp.asarray(grid)
    return _extract_loop(lambda z, n: grid[z:z + n], grid.shape[0],
                         isovalue, slab, weld)


def extract_isosurface_network(field, params, dims, isovalue: float,
                               slab: int = 16, weld: bool = True):
    """Marching tetrahedra DIRECTLY on the neural representation
    (reference doMarchingCubeTemplate__Network, marching_cube.cu:424-450):
    decode overlapping z-slabs and extract per slab — the network is the
    only data source; the full volume never materializes."""
    from instantvnr_tpu.models.metrics import decode_slab

    def get_slab(z, n):
        blob = decode_slab(field, params, jnp.int32(z), dims, slab=slab + 1)
        return blob[:n]

    return _extract_loop(get_slab, dims[2], isovalue, slab, weld)


def save_obj(verts: np.ndarray, faces: np.ndarray, path: str):
    """vnrSaveTriangles → OBJ (the reference's batch_isosurface output)."""
    with open(path, "w") as f:
        f.write(f"# instantvnr_tpu isosurface: {len(verts)} verts, "
                f"{len(faces)} tris\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
