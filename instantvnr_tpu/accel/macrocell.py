"""Macro-cell acceleration grid (reference: `core/macrocell.{h,cu}`).

Per-cell (min, max) of the volume plus a per-cell max-opacity derived from the
transfer function — the renderer uses max-opacity for empty-space skipping and
adaptive sampling, and the path tracer uses it as a per-cell majorant.

Cell size = 2^MACROCELL_SIZE_MIP voxels (default 16³, CMakeLists.txt:61).

TPU redesign of the three update paths:

- offline full sweep (`update_macrocell_implicit`, macrocell.cu:75-113 +
  boundary splat): per-cell min/max over voxels [c·W−1, c·W+W+1) — an 18³
  window at stride 16, which is exactly one `lax.reduce_window` call (XLA
  lowers it to a fused tiled reduction; no atomics needed).
- online explicit update from training batches (`update_macrocell_explicit`,
  macrocell.cu:42-73): 8-way boundary splat per sample via one scatter-min +
  scatter-max. The reference's −1/+1 float-atomic offset trick
  (macrocell.cu:34-39) disappears — XLA scatter-min/max handles init values
  natively; the offset is applied only at BSON (de)serialization for
  file-format parity.
- per-TF-change max-opacity recompute (`macrocell_max_opacity_kernel`,
  macrocell.cu:153-193): the reference scans the alpha LUT per cell with a
  shared-memory staging loop; here the sparse-table RMQ over the alpha LUT
  (utils/tfn.py) answers each cell's range-max in O(1) gathers.
"""
from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from instantvnr_tpu.config import MACROCELL_SIZE_MIP
from instantvnr_tpu.utils.tfn import TransferFunction

MACROCELL_SIZE = 1 << MACROCELL_SIZE_MIP

# Empty-initialized range: lo=+2, hi=-2 (any real update shrinks into [0,1]).
_EMPTY_LO = 2.0
_EMPTY_HI = -2.0


@dataclass(frozen=True)
class MacroCell:
    """Pytree of per-cell arrays, all shaped [mz, my, mx]."""

    value_lo: jnp.ndarray
    value_hi: jnp.ndarray
    max_opacity: jnp.ndarray
    volume_dims: tuple[int, int, int]  # (x, y, z)

    @property
    def dims(self) -> tuple[int, int, int]:
        """(mx, my, mz)"""
        mz, my, mx = self.value_lo.shape
        return (mx, my, mz)

    @property
    def spacings(self) -> tuple[float, float, float]:
        """Cell size in normalized [0,1] coords (MacroCell::set_shape)."""
        dx, dy, dz = self.volume_dims
        return (MACROCELL_SIZE / dx, MACROCELL_SIZE / dy, MACROCELL_SIZE / dz)

    def tree_flatten(self):
        return (self.value_lo, self.value_hi, self.max_opacity), self.volume_dims

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, volume_dims=aux)


jax.tree_util.register_pytree_node(
    MacroCell, MacroCell.tree_flatten, MacroCell.tree_unflatten
)


def macrocell_dims(volume_dims) -> tuple[int, int, int]:
    """(mx, my, mz) = ceil(dims / 16) (MacroCell::set_shape)."""
    dx, dy, dz = volume_dims
    c = MACROCELL_SIZE
    return (-(-dx // c), -(-dy // c), -(-dz // c))


def allocate(volume_dims) -> MacroCell:
    mx, my, mz = macrocell_dims(volume_dims)
    shape = (mz, my, mx)
    return MacroCell(
        value_lo=jnp.full(shape, _EMPTY_LO, jnp.float32),
        value_hi=jnp.full(shape, _EMPTY_HI, jnp.float32),
        max_opacity=jnp.zeros(shape, jnp.float32),
        volume_dims=tuple(int(d) for d in volume_dims),
    )


@jax.jit
def compute_value_ranges(mc: MacroCell, volume: jnp.ndarray) -> MacroCell:
    """Offline full sweep: per-cell min/max over an 18³ window at stride 16.

    Window = [c·W−1, c·W+W+1) per axis (the ±1-voxel trilinear-footprint
    overlap the reference gets from its boundary splat, macrocell.cu:62-73 /
    commented kernel :136-138).
    """
    w = MACROCELL_SIZE
    mz, my, mx = mc.value_lo.shape
    dz, dy, dx = volume.shape
    # pad so that window w+2 starting at c·w−1 is always in bounds
    pad_lo = 1
    pad_hi_z = (mz - 1) * w - 1 + (w + 2) - dz
    pad_hi_y = (my - 1) * w - 1 + (w + 2) - dy
    pad_hi_x = (mx - 1) * w - 1 + (w + 2) - dx

    def windowed(volume, init, op):
        return jax.lax.reduce_window(
            volume,
            init,
            op,
            window_dimensions=(w + 2, w + 2, w + 2),
            window_strides=(w, w, w),
            padding=(
                (pad_lo, max(pad_hi_z, 0)),
                (pad_lo, max(pad_hi_y, 0)),
                (pad_lo, max(pad_hi_x, 0)),
            ),
        )

    # Padding values must not affect the result: pad with ±inf-like extremes.
    hi = windowed(volume, -jnp.inf, jax.lax.max)
    lo = windowed(volume, jnp.inf, jax.lax.min)
    return MacroCell(
        value_lo=lo,
        value_hi=hi,
        max_opacity=mc.max_opacity,
        volume_dims=mc.volume_dims,
    )


@jax.jit
def update_explicit(mc: MacroCell, coords: jnp.ndarray,
                    values: jnp.ndarray) -> MacroCell:
    """Online update from a training batch (macrocell.cu:42-73).

    coords [B,3] in [0,1]³, values [B] or [B,1]. Each sample updates its own
    cell and, when its voxel lies on a cell boundary, the diagonal neighbor
    cells (8-way splat) — one fused scatter-min + scatter-max.
    """
    values = values.reshape(-1)
    b = values.shape[0]
    dims = jnp.array(mc.volume_dims, jnp.float32)  # (x,y,z)
    mx, my, mz = mc.dims
    mdims = jnp.array([mx, my, mz], jnp.int32)

    voxel = jnp.clip(
        jnp.floor(coords * dims).astype(jnp.int32),
        0,
        jnp.array(mc.volume_dims, jnp.int32) - 1,
    )  # [B,3]
    w = MACROCELL_SIZE
    rem = voxel % w
    shift = jnp.where(rem == 0, -1, jnp.where(rem == w - 1, 1, 0))  # [B,3]

    # 8 splat targets: voxel + {0, shift} per axis
    sel = jnp.array(
        [[(c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)],
        jnp.int32,
    )  # [8,3]
    targets = voxel[:, None, :] + sel[None, :, :] * shift[:, None, :]  # [B,8,3]
    cell = targets >> MACROCELL_SIZE_MIP
    valid = jnp.all((cell >= 0) & (cell < mdims[None, None, :]), axis=-1)  # [B,8]
    flat = (cell[..., 2] * my + cell[..., 1]) * mx + cell[..., 0]
    n_cells = mx * my * mz
    flat = jnp.where(valid, flat, n_cells)  # invalid → dropped (out-of-bounds)

    vals8 = jnp.broadcast_to(values[:, None], (b, 8)).reshape(-1)
    flat = flat.reshape(-1)
    lo = (
        mc.value_lo.reshape(-1)
        .at[flat]
        .min(vals8, mode="drop")
        .reshape(mc.value_lo.shape)
    )
    hi = (
        mc.value_hi.reshape(-1)
        .at[flat]
        .max(vals8, mode="drop")
        .reshape(mc.value_hi.shape)
    )
    return MacroCell(value_lo=lo, value_hi=hi, max_opacity=mc.max_opacity,
                     volume_dims=mc.volume_dims)


@jax.jit
def update_max_opacity(mc: MacroCell, tf: TransferFunction) -> MacroCell:
    """Per-cell max opacity over the cell's value range
    (macrocell_max_opacity_kernel, macrocell.cu:153-193): the alpha-LUT index
    range is round(lo)−1 … round(hi)+1, clamped — widened by one entry on
    each side to cover interpolation."""
    from instantvnr_tpu.utils.tfn import max_alpha_in_range

    # Cells never touched by any sample keep opacity 0 (empty).
    touched = mc.value_hi >= mc.value_lo
    opacity = max_alpha_in_range(tf, mc.value_lo, mc.value_hi)
    return MacroCell(
        value_lo=mc.value_lo,
        value_hi=mc.value_hi,
        max_opacity=jnp.where(touched, opacity, 0.0),
        volume_dims=mc.volume_dims,
    )


def build(volume: jnp.ndarray, volume_dims, tf: TransferFunction | None = None
          ) -> MacroCell:
    """allocate + compute_everything + (optional) max-opacity."""
    mc = allocate(volume_dims)
    mc = compute_value_ranges(mc, volume)
    if tf is not None:
        mc = update_max_opacity(mc, tf)
    return mc
