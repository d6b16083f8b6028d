"""Slab-compositing volume renderer — gather-free, MXU-native.

THE TPU-first interactive rendering path. Rationale (measured on TPU v5e):
XLA's gather engine sustains only ~10⁸ random reads/s and Mosaic cannot
express random VMEM gathers at all (tpu.dynamic_gather is a single-vreg
shuffle), so any ray-marcher that fetches samples at arbitrary positions —
the reference's SAMPLE_STREAMING and IN_SHADER modes — is bandwidth-starved
on TPU. This renderer instead reformulates the reference's DECODING mode
(render modes 1/4/7: march a decoded texture, api.h:36-60) as pure dense
linear algebra, the thing the MXU is built for:

  perspective shear-warp factorization (Lacroute-style):
  - choose the principal volume axis (dominant view-direction component) and
    composite axis-aligned slabs front-to-back;
  - the projection of slab k onto the reference plane (the first slab's
    plane, through the eye) is a UNIFORM SCALE about the epipole
    (e_x, e_y): σ_k = (z_ref − e_z)/(z_k − e_z). A uniform scale+offset is
    separable, so each slab resamples with TWO banded interpolation-matrix
    matmuls: M_y [Hi,dy] @ slab [dy,dx] @ M_xᵀ [dx,Wi] — MXU work;
  - transfer-function classification + opacity correction (per-pixel Δt is
    constant across slabs for a pinhole camera — exact, see _pixel_dt) +
    front-to-back blending on the VPU;
  - ONE final 2D projective warp (reference plane → screen), the only
    gather in the frame: H·W bilinear taps.

Per frame at 512² × 128 slabs this is ~11 GFLOP of matmuls + ~70M VPU ops —
hundreds of fps of headroom, independent of the network. The neural volume
feeds this path through progressive blob decoding (models/metrics.decode_slab,
the reference's infer_progressively_decode_volume analog, network.cu:290-326).

Empty-slab skipping: per-slab occupancy from the macrocell (max opacity of
the slab's cell layer) lets the scan body skip classification/blending work
via lax.cond — the analog of macrocell empty-space skipping along z.

Gradient shading: precomputed central-difference gradient volumes (pure
shifts, no gathers) resampled per slab with the same interpolation matmuls,
shaded with the reference scivis model.

Limitation: the eye must lie outside the volume's principal-axis slab range
(orbit cameras — always true); the masked-wavefront ray marcher
(render/raymarch.py) remains the exact-reference path for cameras inside
the volume and for sample-exact comparisons.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import NEARLY_ONE
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.utils.math import normalize
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls


@dataclass(frozen=True)
class SlabSettings:
    sampling_rate: float = 1.0  # used for opacity correction exponent
    density_scale: float = 1.0
    supersample: float = 1.0  # intermediate image resolution multiplier
    skip_empty_slabs: bool = True
    shading: str = "none"  # "none" | "gradient" (scivis, raytracing.h:224-246)
    shading_scale: float = 0.95  # scivis_shading_scale lerp
    light_dir: tuple = (0.7, 0.9, 0.4)  # instantvnr_types.h:148
    shadow_ambient: float = 0.35  # floor when a shadow volume is attached
    # Alternative compositor: batch-resample all slabs, then blend.
    # MEASURED SLOWER on v5e either way (scratch/slab_hybrid.py @512²×128:
    # sequential per-slab scan 17.8 ms; batched+associative_scan 39.0 ms —
    # log D full passes over [D,4,hi,wi]; batched+sequential blend 23.0 ms
    # — the [D,hi,wi] premultiplied intermediate costs more HBM traffic
    # than the per-slab matmuls it hoists). Kept for bigger-volume/
    # other-chip experiments.
    batched_compositor: bool = False
    # batched-compositor blend: "assoc" = associative_scan over; "seq" =
    # one sequential lax.scan that only blends (each slice read once)
    blend_mode: str = "assoc"
    # Fused Pallas compositor (ops/pallas/slab_composite.py): the whole
    # slab loop as one kernel, carry resident in VMEM. "auto" = on TPU;
    # True forces it (interpret on CPU — tests); False keeps the XLA scan.
    # Measured on v5e @512² (scratch/slab_pallas_speed.py +
    # plain_tile_sweep.py): plain 19.5→17.6 ms, shaded 21.3→18.4,
    # shadowed 19.8→17.1, 512³ 32.7→26.4. Caveat: the plain 128³ case is
    # WITHIN TUNNEL NOISE of the XLA scan (one mixed run recorded 27.6 vs
    # 22.2 the other way); the flip rests on clean back-to-back pairs, so
    # a future small regression there is likely measurement noise, not a
    # code bug. The shaded/shadowed/512³ margins are solid.
    pallas_compositor: bool | str = "auto"


def compute_gradient_volumes(volume: jnp.ndarray) -> jnp.ndarray:
    """Central-difference gradient of the decoded grid, world components:
    [3, dz, dy, dx] = (∂/∂x, ∂/∂y, ∂/∂z). Pure shifted subtracts (VPU) —
    the gather-free analog of the per-sample finite differences the
    reference takes during marching (sampleGradient, raytracing.h:112-130).
    Computed once per decode; ~3× the volume's memory."""

    def central(axis):
        a = jnp.concatenate(
            [volume.take(jnp.array([0]), axis=axis),
             volume.take(jnp.arange(volume.shape[axis] - 1), axis=axis)],
            axis=axis,
        )
        b = jnp.concatenate(
            [volume.take(jnp.arange(1, volume.shape[axis]), axis=axis),
             volume.take(jnp.array([volume.shape[axis] - 1]), axis=axis)],
            axis=axis,
        )
        return (b - a) * 0.5

    # volume axes [z, y, x] → world components (x, y, z)
    return jnp.stack([central(2), central(1), central(0)])


def principal_axis(cam: Camera, scale=None) -> tuple[int, bool]:
    """(axis ∈ {0,1,2} for x/y/z, flipped) — host-side, static per jit.

    scale: optional [3] voxel→world scaling; the slab axis must dominate in
    VOXEL space (where the slabs are axis-aligned), so the view direction is
    mapped through S⁻¹ first."""
    eye = np.asarray(cam.eye, np.float32)
    center = np.asarray(cam.center, np.float32)
    d = center - eye
    if scale is not None:
        d = d / np.asarray(scale, np.float32)
    d = d / (np.linalg.norm(d) + 1e-20)
    axis = int(np.argmax(np.abs(d)))
    return axis, bool(d[axis] < 0)


def _permute_volume(volume: jnp.ndarray, axis: int, flipped: bool):
    """Reorder [dz,dy,dx] so the principal axis becomes the slab axis
    (leading) with marching in +direction. Returns (vol [D, Ay, Ax],
    perm) where perm maps (x,y,z) world components to (ax, ay, az)."""
    # volume axes are [z, y, x] = indices [0, 1, 2]; world axis 0=x,1=y,2=z
    if axis == 2:  # march along world z: slabs = axis 0 already
        vol = volume
        perm = (0, 1, 2)  # world (x, y, z) → (in-slab x, in-slab y, slab)
    elif axis == 1:  # world y: [z,y,x] → [y, z, x]
        vol = jnp.transpose(volume, (1, 0, 2))
        perm = (0, 2, 1)
    else:  # world x: [z,y,x] → [x, z, y]
        vol = jnp.transpose(volume, (2, 0, 1))
        perm = (1, 2, 0)
    if flipped:
        vol = vol[::-1]
    return vol, perm


def _interp_matrix(n_out: int, n_in: int, scale, offset):
    """Banded bilinear interpolation matrix M [n_out, n_in]:
    out[i] = Σ_j M[i,j]·in[j], sampling at src = offset + i·scale (texel
    coords, voxel j's center at j+0.5). Out-of-range rows are all-zero
    (transparent outside the volume)."""
    i = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (n_out, n_in), 1)
    src = offset + i * scale - 0.5  # continuous coordinate in voxel index space
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - j))
    # clamp-at-edge: fold the out-of-edge weight back to the edge voxel
    edge_lo = (src < 0.0) & (j == 0)
    edge_hi = (src > n_in - 1.0) & (j == n_in - 1.0)
    in_range = (src > -0.5) & (src < n_in - 0.5)
    w = jnp.where(edge_lo | edge_hi, 1.0, w)
    return jnp.where(in_range, w, 0.0)


def _pixel_dt(xs, ys, e, z_ref, s_perm=None):
    """Per-intermediate-pixel step length: the ray through reference-plane
    point (X, Y) advances (ΔX, ΔY, 1)·(…)/(z_ref−e_z) per unit slab; its 3-D
    length is constant across slabs (Δz = 1 between slabs).

    s_perm: optional [3] permuted voxel→world scale — the step length (used
    for opacity correction) is measured in WORLD units, so each voxel-space
    component is stretched by its scale factor."""
    fx = (xs[None, :] - e[0]) / (z_ref - e[2])
    fy = (ys[:, None] - e[1]) / (z_ref - e[2])
    if s_perm is None:
        return jnp.sqrt(fx * fx + fy * fy + 1.0)
    return jnp.sqrt((fx * s_perm[0]) ** 2 + (fy * s_perm[1]) ** 2
                    + s_perm[2] ** 2)


def _per_slab_state(e, z_ref, xs, ys, d_slab: int, ax_n: int, ay_n: int,
                    z0=0.0):
    """Per-slab separable resampling state — the shear-warp address math
    shared by the batched compositor and the Pallas kernel branches.

    Returns (z_k [D], my_all [D, hi, ay], mx_all [D, wi, ax],
    x_src [D, wi], y_src [D, hi]): slab k's projection onto the reference
    plane is a uniform scale about the epipole, so every slab resamples
    with one banded matrix per axis; x_src/y_src are the permuted-voxel
    source coordinates of each intermediate pixel (coverage/clip masks)."""
    wi = xs.shape[0]
    hi = ys.shape[0]
    z_k = z0 + jnp.arange(d_slab, dtype=jnp.float32) + 0.5
    inv_s = (z_k - e[2]) / (z_ref - e[2])  # 1/σ_k
    off_x = e[0] + (xs[0] - e[0]) * inv_s
    scale_x = (xs[1] - xs[0]) * inv_s
    off_y = e[1] + (ys[0] - e[1]) * inv_s
    scale_y = (ys[1] - ys[0]) * inv_s
    mx_all = jax.vmap(lambda sc, of: _interp_matrix(wi, ax_n, sc, of))(
        scale_x, off_x)  # [D, wi, ax]
    my_all = jax.vmap(lambda sc, of: _interp_matrix(hi, ay_n, sc, of))(
        scale_y, off_y)  # [D, hi, ay]
    x_src = off_x[:, None] + jnp.arange(wi, dtype=jnp.float32)[None, :] \
        * scale_x[:, None]  # [D, wi]
    y_src = off_y[:, None] + jnp.arange(hi, dtype=jnp.float32)[None, :] \
        * scale_y[:, None]  # [D, hi]
    return z_k, my_all, mx_all, x_src, y_src


def _coverage_masks(my_all, mx_all, x_src, y_src, clo, chi, keep):
    """Separable coverage/clip masks for the Pallas kernels: covx [D, wi]
    folds in the per-slab keep mask (occupancy/in-front/z-clip), covy
    [D, hi] carries the row terms; the kernel multiplies them."""
    covx = ((mx_all.sum(2) > 0) & (x_src >= clo[0]) & (x_src <= chi[0])
            & keep[:, None]).astype(jnp.float32)
    covy = ((my_all.sum(2) > 0) & (y_src >= clo[1])
            & (y_src <= chi[1])).astype(jnp.float32)
    return covy, covx


def _composite_batched(vol, tf, e, z_ref, xs, ys, corr_exp,
                       slab_occupancy, shadow_perm, shadow_ambient,
                       clo=None, chi=None, blend_mode="assoc",
                       z0=0.0, return_premult=False):
    """Batched slab pipeline: resample ALL slabs with two batched matmuls,
    classify/correct in one VPU pass, and combine with ONE associative_scan
    of the (associative!) premultiplied `over` operator — turns the
    per-slab lax.scan (128 sequential tiny steps, ~25 ms) into a handful of
    large ops (~3 ms). Used for the unshaded/shadowed paths; gradient
    shading keeps the sequential scan (per-slab view-dir tensors would be
    too large batched)."""
    d_slab, ay_n, ax_n = vol.shape

    # z0 ≠ 0 for slab-sharded chunks (parallel/slab.py)
    z_k, my, mx, x_src, y_src = _per_slab_state(e, z_ref, xs, ys, d_slab,
                                                ax_n, ay_n, z0)

    def resample(field3d):
        tmp = jnp.einsum("dha,dax->dhx", my, field3d,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("dhx,dwx->dhw", tmp, mx,
                          preferred_element_type=jnp.float32)

    vals = resample(vol)  # [D, hi, wi]
    cov = (my.sum(2) > 0)[:, :, None] & (mx.sum(2) > 0)[:, None, :]
    if clo is not None:
        # clip box masks (permuted voxel coords): per-slab z plus the
        # per-pixel source coordinates along the in-slab axes
        in_clip = (((x_src >= clo[0]) & (x_src <= chi[0]))[:, None, :]
                   & ((y_src >= clo[1]) & (y_src <= chi[1]))[:, :, None]
                   & ((z_k >= clo[2]) & (z_k <= chi[2]))[:, None, None])
        cov = cov & in_clip
    rgb, alpha = classify_controls(tf, vals)
    if shadow_perm is not None:
        sh = jnp.clip(resample(shadow_perm), 0.0, 1.0)
        rgb = rgb * (shadow_ambient
                     + (1.0 - shadow_ambient) * sh)[..., None]
    alpha = 1.0 - jnp.power(jnp.maximum(1.0 - alpha, 0.0),
                            corr_exp[None, :, :])
    alpha = jnp.where(cov & slab_occupancy[:, None, None], alpha, 0.0)

    # premultiplied rgba per slab; `over` is associative.
    # channel axis goes SECOND ([D, 4, hi, wi]) so the minor dims stay
    # (hi, wi) — channels-last would lane-pad 4 → 128 (32× memory).
    prem = jnp.concatenate(
        [jnp.moveaxis(rgb, -1, 1) * alpha[:, None], alpha[:, None, :, :]],
        axis=1,
    )  # [D, 4, hi, wi]

    if blend_mode == "seq":
        # one front-to-back pass: each premultiplied slice is read once
        def step(carry, b):
            ta = 1.0 - carry[3:4]
            return carry + ta * b, None

        out, _ = jax.lax.scan(step, jnp.zeros_like(prem[0]), prem,
                              unroll=8)
    else:
        def over(a, b):
            ta = 1.0 - a[:, 3:4]
            return a + ta * b

        out = jax.lax.associative_scan(over, prem, axis=0)[-1]  # [4, hi, wi]
    if return_premult:
        return out
    return jnp.moveaxis(out[:3], 0, -1), out[3]


class _FrameGeometry(NamedTuple):
    """Camera-derived per-frame state of the shear-warp factorization,
    shared by slab_render and the sharded compositor (parallel/slab.py)."""

    e: jnp.ndarray        # eye, permuted voxel space (flip-normalized)
    s_perm: jnp.ndarray   # permuted voxel→world scale
    clo: jnp.ndarray      # clip box, permuted voxel coords
    chi: jnp.ndarray
    z_ref: jnp.ndarray    # reference slab plane
    in_front: jnp.ndarray  # [D] slabs in front of the eye
    bounds: tuple         # (x_lo, x_hi, y_lo, y_hi) intermediate domain
    xs: jnp.ndarray       # [wi] intermediate pixel centers
    ys: jnp.ndarray       # [hi]
    corr_exp: jnp.ndarray  # [hi, wi] opacity-correction exponent


def frame_geometry(dims_w, d_slab: int, ax_n: int, ay_n: int, cam_arrays,
                   xform, perm, flipped: bool, settings: SlabSettings,
                   width: int, height: int) -> _FrameGeometry:
    """Camera/clip-derived frame state in PERMUTED voxel space (see
    slab_render's inline commentary for the geometry derivation)."""
    from instantvnr_tpu.render.transform import clip_bounds

    eye_w = cam_arrays[0] / xform.scale + 0.5 * dims_w
    e = jnp.stack([eye_w[perm[0]], eye_w[perm[1]], eye_w[perm[2]]])
    s_perm = jnp.stack([xform.scale[perm[0]], xform.scale[perm[1]],
                        xform.scale[perm[2]]])
    size_z = dims_w[perm[2]]
    clip_lo_w, clip_hi_w = clip_bounds(xform, dims_w)
    clo = jnp.stack([clip_lo_w[perm[0]], clip_lo_w[perm[1]],
                     clip_lo_w[perm[2]]])
    chi = jnp.stack([clip_hi_w[perm[0]], clip_hi_w[perm[1]],
                     clip_hi_w[perm[2]]])
    if flipped:
        e = e.at[2].set(size_z - e[2])
        clo_z, chi_z = size_z - chi[2], size_z - clo[2]
        clo = clo.at[2].set(clo_z)
        chi = chi.at[2].set(chi_z)

    z_ref = jnp.clip(jnp.floor(e[2] + 0.5), 0.0, d_slab - 1.0) + 0.5
    slab_zs = jnp.arange(d_slab, dtype=jnp.float32) + 0.5
    in_front = slab_zs >= z_ref - 1e-3

    sigma_far = (z_ref - e[2]) / (d_slab - 0.5 - e[2])
    x_lo = jnp.minimum(0.0, e[0] + sigma_far * (0.0 - e[0]))
    x_hi = jnp.maximum(ax_n, e[0] + sigma_far * (ax_n - e[0]))
    y_lo = jnp.minimum(0.0, e[1] + sigma_far * (0.0 - e[1]))
    y_hi = jnp.maximum(ay_n, e[1] + sigma_far * (ay_n - e[1]))

    wi = int(width * settings.supersample)
    hi = int(height * settings.supersample)
    xs = x_lo + (jnp.arange(wi, dtype=jnp.float32) + 0.5) * (x_hi - x_lo) / wi
    ys = y_lo + (jnp.arange(hi, dtype=jnp.float32) + 0.5) * (y_hi - y_lo) / hi

    dt = _pixel_dt(xs, ys, e, z_ref, s_perm)
    # density_scale: SlabSettings has it; IsoSettings (which shares this
    # geometry but ignores corr_exp) does not
    corr_exp = (settings.sampling_rate
                * getattr(settings, "density_scale", 1.0) * dt)
    return _FrameGeometry(e, s_perm, clo, chi, z_ref, in_front,
                          (x_lo, x_hi, y_lo, y_hi), xs, ys, corr_exp)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def slab_render(
    volume: jnp.ndarray,  # [dz, dy, dx] decoded/GT grid
    tf: TransferFunction,
    cam_arrays,  # (eye, center, up, fovy) float32 arrays, WORLD space
    width: int,
    height: int,
    settings: SlabSettings,
    axis: int,
    flipped: bool,
    slab_occupancy: jnp.ndarray | None = None,  # [D] bool, per-slab occupied
    grad_volumes: jnp.ndarray | None = None,  # [3, dz, dy, dx] for shading
    shadow_volume: jnp.ndarray | None = None,  # [dz, dy, dx] transmittance
    xform=None,  # VolumeTransform (render/transform.py): clip box + scaling
) -> jnp.ndarray:
    """Render one frame → rgba [height·width, 4] (row-major, bottom-left
    origin, same layout as render/renderer.py)."""
    from instantvnr_tpu.render.transform import default_transform

    dz, dy, dx = volume.shape
    dims_w = jnp.array([dx, dy, dz], jnp.float32)
    if xform is None:
        xform = default_transform(dims_w)

    vol, perm = _permute_volume(volume, axis, flipped)
    d_slab, ay_n, ax_n = vol.shape
    use_shading = settings.shading == "gradient" and grad_volumes is not None
    if use_shading:
        # stack value + 3 gradient components so each slab resamples with
        # ONE batched einsum instead of 4 separate matmul chains
        fields = jnp.stack(
            [vol] + [_permute_volume(grad_volumes[i], axis, flipped)[0]
                     for i in range(3)])  # [4, D, ay, ax]
    use_shadow = shadow_volume is not None
    if use_shadow:
        svol = _permute_volume(shadow_volume, axis, flipped)[0]

    # camera-derived frame state in permuted voxel space: eye + clip box
    # (flip-normalized), reference plane (split-at-eye for fly-through
    # cameras), intermediate image domain, per-pixel opacity-correction
    # exponents — see frame_geometry
    eye_w = cam_arrays[0] / xform.scale + 0.5 * dims_w
    size_z = dims_w[perm[2]]
    geo = frame_geometry(dims_w, d_slab, ax_n, ay_n, cam_arrays, xform,
                         perm, flipped, settings, width, height)
    e, s_perm, clo, chi, z_ref, in_front = geo[:6]
    (x_lo, x_hi, y_lo, y_hi), xs, ys, corr_exp = geo[6:]
    wi = int(width * settings.supersample)
    hi = int(height * settings.supersample)

    if slab_occupancy is None:
        slab_occupancy = jnp.ones((d_slab,), bool)
    slab_occupancy = slab_occupancy & in_front

    if settings.batched_compositor and not use_shading:
        shadow_perm = svol if use_shadow else None
        color, alpha_img = _composite_batched(
            vol, tf, e, z_ref, xs, ys, corr_exp, slab_occupancy,
            shadow_perm, settings.shadow_ambient, clo, chi,
            blend_mode=settings.blend_mode,
        )
        return _final_warp(color, alpha_img, cam_arrays, width, height,
                           perm, flipped, e, z_ref, x_lo, x_hi, y_lo, y_hi,
                           wi, hi, xform.scale)

    # fused Pallas compositor: carry resident in VMEM across the slab loop
    # (ops/pallas/slab_composite.py); shading/shadow run in the extended
    # kernel variant
    use_pallas = bool(settings.pallas_compositor)
    if settings.pallas_compositor == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from instantvnr_tpu.ops.pallas.slab_composite import (
            composite_slabs, composite_slabs_ext, pack_controls, pack_misc,
            pick_tile_h)
        from instantvnr_tpu.utils.tfn import _CONTROLS_CROSSOVER

        n_fields = (4 if use_shading else 1) + (1 if use_shadow else 0)
        tile_h = pick_tile_h(hi, wi, ay_n, ax_n, n_fields=n_fields)
        ok = (tile_h is not None
              and tf.ctrl_x.shape[0] - 1 <= _CONTROLS_CROSSOVER)
        if settings.pallas_compositor is True and not ok:
            # forced-True config silently losing kernel coverage is how
            # parity tests rot — make the XLA-scan fallback loud
            import warnings

            warnings.warn(
                "pallas_compositor=True but no legal tile/TF fits "
                f"(tile_h={tile_h}, n_ctrl={tf.ctrl_x.shape[0] - 1}); "
                "falling back to the XLA scan compositor", stacklevel=2)
        use_pallas = ok
    if use_pallas:
        z_ks, my_all, mx_all, x_src, y_src = _per_slab_state(
            e, z_ref, xs, ys, d_slab, ax_n, ay_n)
        keep = slab_occupancy & (z_ks >= clo[2]) & (z_ks <= chi[2])
        covy, covx = _coverage_masks(my_all, mx_all, x_src, y_src, clo, chi,
                                     keep)
        interp = jax.default_backend() != "tpu"
        if use_shading or use_shadow:
            f_all = (jnp.moveaxis(fields, 0, 1) if use_shading
                     else vol[:, None])  # [D, C, ay, ax]
            light = jnp.asarray(settings.light_dir, jnp.float32)
            cam_fwd = cam_arrays[1] - cam_arrays[0]
            light = jnp.where(jnp.dot(cam_fwd, light) > 0, -light, light)
            light = light / jnp.linalg.norm(light)
            zw = size_z - z_ks if flipped else z_ks
            misc = pack_misc(settings.shadow_ambient,
                             settings.shading_scale, light, eye_w,
                             xform.scale)
            color, alpha_img = composite_slabs_ext(
                f_all, svol if use_shadow else None, my_all, mx_all,
                covy, covx, corr_exp, x_src, y_src, zw, pack_controls(tf),
                misc, tile_h, perm, use_shading, use_shadow, interp)
        else:
            color, alpha_img = composite_slabs(
                vol, my_all, mx_all, covy, covx, corr_exp,
                pack_controls(tf), tile_h, interp)
        return _final_warp(color, alpha_img, cam_arrays, width, height,
                           perm, flipped, e, z_ref, x_lo, x_hi, y_lo, y_hi,
                           wi, hi, xform.scale)

    def body(carry, k):
        color, trans = carry  # [hi, wi, 3], [hi, wi]
        z_k = k.astype(jnp.float32) + 0.5
        sigma = (z_ref - e[2]) / (z_k - e[2])
        # intermediate pixel (u,v) ← slab texel: x = e_x + (X_u − e_x)/σ
        # expressed as src = offset + i·scale over the xs/ys grids:
        inv_s = 1.0 / sigma
        off_x = e[0] + (xs[0] - e[0]) * inv_s
        scale_x = (xs[1] - xs[0]) * inv_s
        off_y = e[1] + (ys[0] - e[1]) * inv_s
        scale_y = (ys[1] - ys[0]) * inv_s

        def do_slab(color, trans):
            mx = _interp_matrix(wi, ax_n, scale_x, off_x)  # [wi, ax]
            my = _interp_matrix(hi, ay_n, scale_y, off_y)  # [hi, ay]
            if use_shading:
                fk = jax.lax.dynamic_index_in_dim(fields, k, 1, False)
                tmp = jnp.einsum("ha,fax->fhx", my, fk,
                                 preferred_element_type=jnp.float32)
                rs = jnp.einsum("fhx,wx->fhw", tmp, mx,
                                preferred_element_type=jnp.float32)
                vals = rs[0]  # [hi, wi]
            else:
                slab = jax.lax.dynamic_index_in_dim(vol, k, 0, keepdims=False)
                vals = my @ slab @ mx.T  # [hi, wi]  (MXU)
            # coverage: zero-weight rows mean "outside the volume";
            # clip box masks out in-slab samples outside [clo, chi]
            x_src = off_x + jnp.arange(wi, dtype=jnp.float32) * scale_x
            y_src = off_y + jnp.arange(hi, dtype=jnp.float32) * scale_y
            in_clip = (((x_src >= clo[0]) & (x_src <= chi[0]))[None, :]
                       & ((y_src >= clo[1]) & (y_src <= chi[1]))[:, None])
            cov = (my.sum(1) > 0)[:, None] & (mx.sum(1) > 0)[None, :] \
                & in_clip
            rgb, alpha = classify_controls(tf, vals)
            if use_shading:
                # the 3 world-component gradients came out of the same
                # batched resample; shade with the scivis model per slab
                from instantvnr_tpu.render.raymarch import _shade_scivis

                g = jnp.moveaxis(rs[1:], 0, -1)  # [hi, wi, 3]
                # world-space normal: diagonal xfmNormal = divide by scale
                normal = -g / xform.scale
                # per-pixel world position on this slab → view direction
                p_perm = [
                    jnp.broadcast_to(x_src[None, :], (hi, wi)),
                    jnp.broadcast_to(y_src[:, None], (hi, wi)),
                    jnp.full((hi, wi), z_k),
                ]
                if flipped:
                    p_perm[2] = size_z - p_perm[2]
                p_world = [None, None, None]
                for i_ax in range(3):
                    p_world[perm[i_ax]] = p_perm[i_ax]
                p_world = jnp.stack(p_world, axis=-1)  # [hi, wi, 3] voxel
                view = (p_world - eye_w[None, None, :]) * xform.scale
                view = view / jnp.maximum(
                    jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
                light = jnp.asarray(settings.light_dir, jnp.float32)
                cam_fwd = cam_arrays[1] - cam_arrays[0]
                light = jnp.where(jnp.dot(cam_fwd, light) > 0, -light, light)
                shaded = _shade_scivis(view, normal, rgb, light_dir=light)
                s_ = settings.shading_scale
                rgb = s_ * shaded + (1.0 - s_) * rgb
            if use_shadow:
                sh = my @ jax.lax.dynamic_index_in_dim(svol, k, 0, False) \
                    @ mx.T
                amb = settings.shadow_ambient
                rgb = rgb * (amb + (1.0 - amb) * jnp.clip(sh, 0.0, 1.0))[..., None]
            alpha = 1.0 - jnp.power(jnp.maximum(1.0 - alpha, 0.0), corr_exp)
            alpha = jnp.where(cov & (trans > 1.0 - NEARLY_ONE), alpha, 0.0)
            color = color + (trans * alpha)[..., None] * rgb
            trans = trans * (1.0 - alpha)
            return color, trans

        # occupancy folds into the alpha mask (a lax.cond would serialize
        # the scan body on TPU for negligible savings)
        color2, trans2 = do_slab(color, trans)
        keep = slab_occupancy[k] & (z_k >= clo[2]) & (z_k <= chi[2])
        color = jnp.where(keep, color2, color)
        trans = jnp.where(keep, trans2, trans)
        return (color, trans), None

    init = (jnp.zeros((hi, wi, 3), jnp.float32), jnp.ones((hi, wi), jnp.float32))
    (color, trans), _ = jax.lax.scan(body, init, jnp.arange(d_slab),
                                     unroll=4)
    alpha_img = 1.0 - trans
    return _final_warp(color, alpha_img, cam_arrays, width, height, perm,
                       flipped, e, z_ref, x_lo, x_hi, y_lo, y_hi, wi, hi,
                       xform.scale)


def _final_warp(color, alpha_img, cam_arrays, width, height, perm, flipped,
                e, z_ref, x_lo, x_hi, y_lo, y_hi, wi, hi, scale=None):
    """Reference plane → screen (the frame's only gather)."""
    eye = cam_arrays[0]
    direction = normalize(cam_arrays[1] - eye)
    up = cam_arrays[2]
    t2 = 2.0 * jnp.tan(jnp.asarray(cam_arrays[3], jnp.float32) * jnp.pi / 360.0)
    aspect = width / float(height)
    horizontal = t2 * aspect * normalize(jnp.cross(direction, up))
    vertical = jnp.cross(horizontal, direction) / aspect

    py, px = jnp.meshgrid(
        (jnp.arange(height, dtype=jnp.float32) + 0.5) / height,
        (jnp.arange(width, dtype=jnp.float32) + 0.5) / width,
        indexing="ij",
    )
    d = (direction[None, None, :]
         + (px - 0.5)[..., None] * horizontal[None, None, :]
         + (py - 0.5)[..., None] * vertical[None, None, :])  # [H, W, 3]
    if scale is not None:
        d = d / scale  # world → voxel direction (anisotropic scaling)
    # permuted-space components of eye/dir
    d_p = jnp.stack([d[..., perm[0]], d[..., perm[1]], d[..., perm[2]]], -1)
    if flipped:
        d_p = d_p.at[..., 2].multiply(-1.0)
    # intersect the reference plane z = z_ref (voxel space)
    tt = (z_ref - e[2]) / d_p[..., 2]
    hit = tt > 0
    px_ref = e[0] + tt * d_p[..., 0]
    py_ref = e[1] + tt * d_p[..., 1]
    # map to intermediate pixel coordinates
    u = (px_ref - x_lo) / (x_hi - x_lo) * wi - 0.5
    v = (py_ref - y_lo) / (y_hi - y_lo) * hi - 0.5
    rgba_i = jnp.concatenate([color, alpha_img[..., None]], -1)  # [hi, wi, 4]
    out = _bilinear2d(rgba_i, v, u)  # [H, W, 4]
    out = jnp.where(hit[..., None], out, 0.0)
    return out.reshape(height * width, 4)


def _bilinear2d(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """img [H, W, C] sampled at continuous (y, x); zero outside."""
    h, w = img.shape[:2]
    inside = (x > -1.0) & (x < w) & (y > -1.0) & (y < h)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    c0 = c00 * (1 - fx)[..., None] + c10 * fx[..., None]
    c1 = c01 * (1 - fx)[..., None] + c11 * fx[..., None]
    out = c0 * (1 - fy)[..., None] + c1 * fy[..., None]
    return jnp.where(inside[..., None], out, 0.0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def slab_occupancy_from_macrocell(mc, axis: int, flipped: bool,
                                  d_slab: int) -> jnp.ndarray:
    """Per-slab occupancy [D]: does any macrocell in the slab's cell layer
    have nonzero max opacity? (macrocell empty-space skipping along z)"""
    from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE

    occ = mc.max_opacity > 1e-6  # [mz, my, mx]
    if axis == 2:
        layer = occ.any(axis=(1, 2))  # over y, x → [mz]
    elif axis == 1:
        layer = occ.any(axis=(0, 2))  # [my]
    else:
        layer = occ.any(axis=(0, 1))  # [mx]
    # map each (possibly flipped) slab to its ORIGINAL voxel index before
    # binning into cells: reversing the cell-layer array instead would
    # assume the last cell is full, misaligning every slab by
    # d_slab % MACROCELL_SIZE when flipped (e.g. dim 100 → 12 slabs read
    # the wrong cell's occupancy)
    idx = jnp.arange(d_slab)
    if flipped:
        idx = d_slab - 1 - idx
    cell = jnp.minimum(idx // MACROCELL_SIZE, layer.shape[0] - 1)
    return layer[cell]


def eye_outside_slab_range(cam: Camera, dims, axis: int,
                           scale=None) -> bool:
    """v1 validity guard (host-side)."""
    eye = np.asarray(cam.eye, np.float32)
    if scale is not None:
        eye = eye / np.asarray(scale, np.float32)
    eye = eye + np.asarray(dims, np.float32) / 2
    return not (0.0 <= eye[axis] <= float(dims[axis]))


def slab_path_valid(cam: Camera, dims, axis: int, flipped: bool,
                    scale=None, aspect: float = 1.0,
                    margin: float = 0.05) -> bool:
    """Host-side: can the shear-warp factorization render this camera?

    Always true for eyes outside the principal-axis slab range (orbit
    cameras, the v1 case). For fly-through cameras INSIDE the volume the
    split-at-eye path is valid as long as the whole frustum looks forward
    along the principal axis (every corner ray's permuted z-component
    positive) — slabs behind the eye are then invisible and masked out in
    slab_render. Degenerate wide-FOV/oblique cases fall back to the
    wavefront marcher.
    """
    if eye_outside_slab_range(cam, dims, axis, scale):
        return True
    eye = np.asarray(cam.eye, np.float32)
    direction = np.asarray(cam.center, np.float32) - eye
    direction = direction / max(np.linalg.norm(direction), 1e-12)
    up = np.asarray(cam.up, np.float32)
    t2 = 2.0 * np.tan(float(cam.fovy) * np.pi / 360.0)
    h = np.cross(direction, up)
    h = t2 * aspect * h / max(np.linalg.norm(h), 1e-12)
    v = np.cross(h, direction) / max(aspect, 1e-12)
    corners = [direction + sx * h + sy * v
               for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)]
    sgn = -1.0 if flipped else 1.0
    for d in corners:
        dv = d if scale is None else d / np.asarray(scale, np.float32)
        if sgn * dv[axis] <= margin * np.linalg.norm(dv):
            return False
    return True
