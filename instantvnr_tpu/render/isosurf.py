"""First-hit isosurface rendering — slab-sweep, MXU-native.

Capability counterpart of the reference's interactive isosurface app
(`apps/int_isosurface.cu`: marching cubes over the neural field +
OptiX-rasterized mesh, via `core/marching_cube.cu:397-450`). The TPU
redesign renders the isosurface IMPLICITLY instead of meshing+rasterizing:
sweep axis-aligned slabs front-to-back with the same perspective shear-warp
factorization as the slab compositor (render/slabmarch.py), detect each
intermediate-pixel ray's FIRST crossing of the isovalue between consecutive
slab samples, lerp the crossing depth and gradient, and shade with the
scivis model. All hot work is the banded interpolation matmuls the MXU is
built for — no per-sample gathers, no mesh build per camera move, and the
isovalue is a traced scalar so interactive iso edits don't retrace.

Degenerate cameras (frustum not forward along the principal axis,
render/slabmarch.slab_path_valid) fall back to a brute-force fixed-step
first-hit marcher with bisection refinement — also the exact semantics the
NumPy oracle tests compare against.

Mesh EXTRACTION (OBJ export, network-direct variant) lives in
ops/isosurface.py; this module is the interactive *viewing* half.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.render.camera import Camera, camera_rays
from instantvnr_tpu.render.raymarch import _shade_scivis
from instantvnr_tpu.render.slabmarch import (
    _final_warp,
    _interp_matrix,
    _permute_volume,
    compute_gradient_volumes,
    frame_geometry,
    principal_axis,
    slab_path_valid,
)
from instantvnr_tpu.utils.math import ray_box_intersect
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls


@dataclass(frozen=True)
class IsoSettings:
    supersample: float = 1.0
    shading_scale: float = 0.95  # scivis blend (as the volume modes)
    light_dir: tuple = (0.7, 0.9, 0.4)  # instantvnr_types.h:148
    color: tuple | None = None  # fixed albedo; None → TF color at isovalue
    # brute-path knobs
    sampling_rate: float = 2.0  # steps per voxel along the ray
    n_refine: int = 8  # bisection iterations after the crossing
    # fused Pallas sweep (ops/pallas/iso_sweep.py): the whole first-hit
    # scan as one kernel, state resident in VMEM. "auto" = on TPU; True
    # forces it (interpret mode off-TPU — tests); False keeps the XLA scan.
    # Measured on v5e @512²×128³: 18.0→16.8 ms (scratch/slab_pallas_speed.py)
    pallas_sweep: bool | str = "auto"


def _albedo(tf: TransferFunction, isovalue, settings: IsoSettings):
    if settings.color is not None:
        return jnp.asarray(settings.color, jnp.float32)
    rgb, _ = classify_controls(tf, jnp.reshape(isovalue, (1, 1)))
    return rgb[0, 0]


def _flip_light(settings: IsoSettings, cam_arrays):
    light = jnp.asarray(settings.light_dir, jnp.float32)
    fwd = cam_arrays[1] - cam_arrays[0]
    return jnp.where(jnp.dot(fwd, light) > 0, -light, light)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def slab_iso_render(
    volume: jnp.ndarray,  # [dz, dy, dx] decoded/GT grid
    grad_volumes: jnp.ndarray,  # [3, dz, dy, dx] central-difference grads
    tf: TransferFunction,
    width: int,
    height: int,
    settings: IsoSettings,
    axis: int,
    flipped: bool,
    cam_arrays=None,  # (eye, center, up, fovy) float32, world space
    isovalue=None,  # traced f32 scalar
    xform=None,  # VolumeTransform
) -> jnp.ndarray:
    """One frame → rgba [height·width, 4]; alpha = hit mask (bilinearly
    warped, so silhouettes come out antialiased)."""
    from instantvnr_tpu.render.transform import default_transform

    dz, dy, dx = volume.shape
    dims_w = jnp.array([dx, dy, dz], jnp.float32)
    if xform is None:
        xform = default_transform(dims_w)

    vol, perm = _permute_volume(volume, axis, flipped)
    gvols = jnp.stack([_permute_volume(grad_volumes[i], axis, flipped)[0]
                       for i in range(3)])  # [3, D, ay, ax] world components
    # value + gradient slabs stacked so each scan step resamples with ONE
    # batched einsum pair instead of 4 separate matmul chains (the same
    # trick as slab_render's shaded path)
    fields = jnp.concatenate([vol[:, None], jnp.moveaxis(gvols, 0, 1)],
                             axis=1)  # [D, 4, ay, ax]
    d_slab, ay_n, ax_n = vol.shape

    # shear-warp frame state shared with the slab compositor (flip-
    # normalized eye/clip, reference plane, intermediate domain)
    eye_w = cam_arrays[0] / xform.scale + 0.5 * dims_w  # voxel space
    size_z = dims_w[perm[2]]
    geo = frame_geometry(dims_w, d_slab, ax_n, ay_n, cam_arrays, xform,
                         perm, flipped, settings, width, height)
    e, _, clo, chi, z_ref, in_front = geo[:6]
    (x_lo, x_hi, y_lo, y_hi), xs, ys, _ = geo[6:]
    wi = int(width * settings.supersample)
    hi = int(height * settings.supersample)

    iso = jnp.asarray(isovalue, jnp.float32)

    use_pallas = bool(settings.pallas_sweep)
    if settings.pallas_sweep == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from instantvnr_tpu.ops.pallas.iso_sweep import iso_sweep
        from instantvnr_tpu.ops.pallas.slab_composite import pick_tile_h

        tile_h = pick_tile_h(hi, wi, ay_n, ax_n, n_fields=4, out_planes=10)
        if settings.pallas_sweep is True and tile_h is None:
            import warnings

            warnings.warn(
                "pallas_sweep=True but no legal tile height fits "
                f"(hi={hi}, wi={wi}); falling back to the XLA sweep",
                stacklevel=2)
        use_pallas = tile_h is not None
    if use_pallas:
        from instantvnr_tpu.render.slabmarch import (
            _coverage_masks,
            _per_slab_state,
        )

        z_ks, my_all, mx_all, x_src, y_src = _per_slab_state(
            e, z_ref, xs, ys, d_slab, ax_n, ay_n)
        keep = in_front & (z_ks >= clo[2]) & (z_ks <= chi[2])
        covy, covx = _coverage_masks(my_all, mx_all, x_src, y_src, clo, chi,
                                     keep)
        found_f, hit_z, hit_g = iso_sweep(
            fields, my_all, mx_all, covy, covx, iso, tile_h,
            jax.default_backend() != "tpu")
        found = found_f > 0.5
        return _shade_and_warp(found, hit_z, hit_g, tf, iso, settings,
                               cam_arrays, width, height, perm, flipped, e,
                               eye_w, size_z, z_ref, x_lo, x_hi, y_lo, y_hi,
                               xs, ys, wi, hi, xform)

    def body(carry, k):
        prev_v, prev_ok, prev_g, found, hit_z, hit_g = carry
        z_k = k.astype(jnp.float32) + 0.5
        sigma = (z_ref - e[2]) / (z_k - e[2])
        inv_s = 1.0 / sigma
        off_x = e[0] + (xs[0] - e[0]) * inv_s
        scale_x = (xs[1] - xs[0]) * inv_s
        off_y = e[1] + (ys[0] - e[1]) * inv_s
        scale_y = (ys[1] - ys[0]) * inv_s

        mx = _interp_matrix(wi, ax_n, scale_x, off_x)  # [wi, ax]
        my = _interp_matrix(hi, ay_n, scale_y, off_y)  # [hi, ay]
        fk = jax.lax.dynamic_index_in_dim(fields, k, 0, False)  # [4, ay, ax]
        tmp = jnp.einsum("ha,fax->fhx", my, fk,
                         preferred_element_type=jnp.float32)
        rs = jnp.einsum("fhx,wx->fhw", tmp, mx,
                        preferred_element_type=jnp.float32)  # [4, hi, wi]
        vals = rs[0]
        g = jnp.moveaxis(rs[1:], 0, -1)  # [hi, wi, 3] world gradients

        x_src = off_x + jnp.arange(wi, dtype=jnp.float32) * scale_x
        y_src = off_y + jnp.arange(hi, dtype=jnp.float32) * scale_y
        in_clip = (((x_src >= clo[0]) & (x_src <= chi[0]))[None, :]
                   & ((y_src >= clo[1]) & (y_src <= chi[1]))[:, None])
        cov = (my.sum(1) > 0)[:, None] & (mx.sum(1) > 0)[None, :] & in_clip \
            & in_front[k] & (z_k >= clo[2]) & (z_k <= chi[2])

        denom = vals - prev_v
        frac = jnp.where(jnp.abs(denom) > 1e-12, (iso - prev_v) / denom, 0.5)
        frac = jnp.clip(frac, 0.0, 1.0)
        cross = prev_ok & cov & ((prev_v - iso) * (vals - iso) <= 0.0)
        newly = cross & ~found
        z_cross = (z_k - 1.0) + frac  # z_{k-1} = k - 0.5, plane spacing 1
        hit_z = jnp.where(newly, z_cross, hit_z)
        g_cross = prev_g + frac[..., None] * (g - prev_g)
        hit_g = jnp.where(newly[..., None], g_cross, hit_g)
        found = found | newly
        return (vals, cov, g, found, hit_z, hit_g), None

    zero = jnp.zeros((hi, wi), jnp.float32)
    init = (zero, jnp.zeros((hi, wi), bool), jnp.zeros((hi, wi, 3)),
            jnp.zeros((hi, wi), bool), zero, jnp.zeros((hi, wi, 3)))
    # one d_slab-step scan per frame, same shape as slab_render's default
    # compositor scan — measured safe through the tunnel up to 512 slabs
    # (27.6 fps @512³; CLAUDE.md's ≤10-step chunking rule applies to the
    # much longer TRAINING scans, which host-chunk in chunks of 10)
    (_, _, _, found, hit_z, hit_g), _ = jax.lax.scan(
        body, init, jnp.arange(d_slab), unroll=4)
    return _shade_and_warp(found, hit_z, hit_g, tf, iso, settings,
                           cam_arrays, width, height, perm, flipped, e,
                           eye_w, size_z, z_ref, x_lo, x_hi, y_lo, y_hi,
                           xs, ys, wi, hi, xform)


def _shade_and_warp(found, hit_z, hit_g, tf, iso, settings, cam_arrays,
                    width, height, perm, flipped, e, eye_w, size_z, z_ref,
                    x_lo, x_hi, y_lo, y_hi, xs, ys, wi, hi, xform):
    """Shade the first-hit state and warp to the screen (shared by the XLA
    scan and the fused Pallas sweep)."""
    # hit position: the intermediate-pixel ray's intersection with the
    # plane z = hit_z (same mapping the resampling used)
    ratio = (hit_z - e[2]) / (z_ref - e[2])
    x_hit = e[0] + (xs[None, :] - e[0]) * ratio
    y_hit = e[1] + (ys[:, None] - e[1]) * ratio
    p_perm = [x_hit, y_hit, hit_z if not flipped else size_z - hit_z]
    p_world = [None, None, None]
    for i_ax in range(3):
        p_world[perm[i_ax]] = p_perm[i_ax]
    p_world = jnp.stack(p_world, axis=-1)  # [hi, wi, 3] voxel coords
    view = (p_world - eye_w[None, None, :]) * xform.scale
    view = view / jnp.maximum(
        jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)

    normal = -hit_g / xform.scale  # diagonal xfmNormal
    light = _flip_light(settings, cam_arrays)
    base = jnp.broadcast_to(_albedo(tf, iso, settings), (hi, wi, 3))
    shaded = _shade_scivis(view, normal, base, light_dir=light)
    s_ = settings.shading_scale
    color = jnp.where(found[..., None],
                      s_ * shaded + (1.0 - s_) * base, 0.0)
    alpha_img = found.astype(jnp.float32)
    return _final_warp(color, alpha_img, cam_arrays, width, height, perm,
                       flipped, e, z_ref, x_lo, x_hi, y_lo, y_hi, wi, hi,
                       xform.scale)


@partial(jax.jit, static_argnums=(2, 3))
def _brute_init(volume, cam_arrays, width: int, height: int, xform=None):
    """Ray setup for the brute marcher: voxel-space rays + clipped t range."""
    from instantvnr_tpu.render.transform import clip_bounds, rays_to_voxel

    dz, dy, dx = volume.shape
    dims_w = jnp.array([dx, dy, dz], jnp.float32)
    cam = Camera(eye=cam_arrays[0], center=cam_arrays[1], up=cam_arrays[2],
                 fovy=cam_arrays[3])
    org_w, dir_w = camera_rays(cam, width, height)
    org, dirn = rays_to_voxel(xform, dims_w, org_w, dir_w)  # t world-metric
    lo, hi = clip_bounds(xform, dims_w)
    t0, t1, hit = ray_box_intersect(org, dirn, lo, hi)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)
    return org, dirn, dir_w, t0, t1


@partial(jax.jit, static_argnums=(8,))
def _brute_march_chunk(volume, org, dirn, t0, t1, iso, step, carry,
                       chunk: int, i0, n_steps):
    """One bounded scan of `chunk` fixed steps starting at global step i0
    (the march is host-chunked: CLAUDE.md caps device scans at ~10-16
    steps — a 512³ oblique camera needs ~1800 total)."""
    from instantvnr_tpu.ops.trilinear import sample_volume_voxel

    def value_at(t):
        return sample_volume_voxel(volume, org + t[:, None] * dirn)

    def body(carry, i):
        prev_t, prev_v, found, ta, tb, va, vb = carry
        gi = i0 + i
        t = t0 + (gi.astype(jnp.float32) + 1.0) * step
        # test the segment [prev_t, min(t, t1)] whenever it is non-empty:
        # requiring t <= t1 would skip the final PARTIAL segment up to the
        # clip exit and leave silhouette holes near box boundaries
        ok = (prev_t < t1) & (gi < n_steps)
        v = value_at(jnp.minimum(t, t1))
        cross = ok & ~found & ((prev_v - iso) * (v - iso) <= 0.0)
        ta = jnp.where(cross, prev_t, ta)
        tb = jnp.where(cross, jnp.minimum(t, t1), tb)
        va = jnp.where(cross, prev_v, va)
        vb = jnp.where(cross, v, vb)
        found = found | cross
        return (jnp.minimum(t, t1), v, found, ta, tb, va, vb), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(chunk))
    return carry


def brute_iso_render(
    volume: jnp.ndarray,
    tf: TransferFunction,
    width: int,
    height: int,
    settings: IsoSettings,
    n_steps: int,
    cam_arrays=None,
    isovalue=None,
    xform=None,
    chunk: int = 16,
) -> jnp.ndarray:
    """Exact fallback: per-pixel fixed-step first-hit march + bisection.
    Gather-bound (8 taps/step/ray) — the slab sweep is the fast path; this
    covers degenerate cameras and serves as the oracle-equivalent path.
    Host-chunked (one jitted `chunk`-step scan per dispatch, all chunks one
    traced program): must be called OUTSIDE jit."""
    from instantvnr_tpu.ops.trilinear import sample_volume_voxel
    from instantvnr_tpu.render.transform import default_transform

    dz, dy, dx = volume.shape
    dims_w = jnp.array([dx, dy, dz], jnp.float32)
    if xform is None:
        xform = default_transform(dims_w)
    org, dirn, dir_w, t0, t1 = _brute_init(volume, cam_arrays, width,
                                           height, xform)

    iso = jnp.asarray(isovalue, jnp.float32)
    step = (jnp.float32(1.0) * jnp.min(xform.scale)
            / jnp.float32(settings.sampling_rate))

    r = org.shape[0]
    zeros = jnp.zeros((r,), jnp.float32)
    v0 = sample_volume_voxel(volume, org + t0[:, None] * dirn)
    carry = (t0, v0, jnp.zeros((r,), bool), zeros, zeros, zeros, zeros)
    for c in range(-(-n_steps // chunk)):
        carry = _brute_march_chunk(volume, org, dirn, t0, t1, iso, step,
                                   carry, chunk, jnp.int32(c * chunk),
                                   jnp.int32(n_steps))
    _, _, found, ta, tb, va, vb = carry
    return _brute_finish(volume, tf, settings, found, ta, tb, va, vb,
                         org, dirn, dir_w, iso, cam_arrays, xform)


@partial(jax.jit, static_argnums=(2,))
def _brute_finish(volume, tf, settings: IsoSettings, found, ta, tb, va, vb,
                  org, dirn, dir_w, iso, cam_arrays, xform):
    """Bisection refinement + shading of the brute march's crossings."""
    from instantvnr_tpu.ops.trilinear import sample_volume_voxel

    def value_at(t):
        return sample_volume_voxel(volume, org + t[:, None] * dirn)

    def refine(carry, _):
        ta, tb, va, vb = carry
        tm = 0.5 * (ta + tb)
        vm = value_at(tm)
        left = (va - iso) * (vm - iso) <= 0.0
        ta2 = jnp.where(left, ta, tm)
        va2 = jnp.where(left, va, vm)
        tb2 = jnp.where(left, tm, tb)
        vb2 = jnp.where(left, vm, vb)
        return (ta2, tb2, va2, vb2), None

    (ta, tb, va, vb), _ = jax.lax.scan(refine, (ta, tb, va, vb),
                                       None, length=settings.n_refine)
    denom = vb - va
    frac = jnp.where(jnp.abs(denom) > 1e-12, (iso - va) / denom, 0.5)
    t_hit = ta + jnp.clip(frac, 0.0, 1.0) * (tb - ta)
    p = org + t_hit[:, None] * dirn  # voxel coords

    # central-difference normal in voxel space → world via diagonal scale
    def cd(axis_vec):
        d = jnp.asarray(axis_vec, jnp.float32)
        return (sample_volume_voxel(volume, p + d)
                - sample_volume_voxel(volume, p - d)) * 0.5

    g = jnp.stack([cd((1, 0, 0)), cd((0, 1, 0)), cd((0, 0, 1))], axis=-1)
    normal = -g / xform.scale
    light = _flip_light(settings, cam_arrays)
    base = jnp.broadcast_to(_albedo(tf, iso, settings), (org.shape[0], 3))
    view = dir_w / jnp.maximum(
        jnp.linalg.norm(dir_w, axis=-1, keepdims=True), 1e-9)
    shaded = _shade_scivis(view, normal, base, light_dir=light)
    s_ = settings.shading_scale
    color = jnp.where(found[:, None], s_ * shaded + (1.0 - s_) * base, 0.0)
    alpha = found.astype(jnp.float32)
    return jnp.concatenate([color, alpha[:, None]], axis=-1)


class IsoRenderer:
    """Interactive isosurface viewer backend: holds the grid + gradients,
    renders first-hit frames, isovalue edits are traced (no retrace)."""

    def __init__(self, width: int, height: int, grid, tf: TransferFunction,
                 isovalue: float = 0.5, settings: IsoSettings | None = None,
                 transform=None):
        from instantvnr_tpu.render.transform import default_transform

        self.width, self.height = width, height
        self.grid = jnp.asarray(grid, jnp.float32)
        self.tf = tf
        self.settings = settings or IsoSettings()
        self.isovalue = float(isovalue)
        dz, dy, dx = self.grid.shape
        self.volume_dims = (dx, dy, dz)
        self.camera = Camera.default_for_dims(self.volume_dims)
        self._grads = None
        self._frame = None
        self.set_transform(transform or default_transform(self.volume_dims))

    def set_camera(self, cam: Camera):
        self.camera = cam

    def set_isovalue(self, isovalue: float):
        self.isovalue = float(isovalue)

    def set_grid(self, grid):
        """Rebind to a new decoded grid (online training refresh)."""
        self.grid = jnp.asarray(grid, jnp.float32)
        self._grads = None

    def set_transform(self, transform):
        self.transform = transform
        # host copy: the per-frame axis pick must not read a device array
        self._scale_h = np.asarray(transform.scale)

    def render(self):
        cam = self.camera
        cam_arrays = (
            jnp.asarray(cam.eye, jnp.float32),
            jnp.asarray(cam.center, jnp.float32),
            jnp.asarray(cam.up, jnp.float32),
            jnp.float32(cam.fovy),
        )
        scale_h = self._scale_h  # cached host copy
        axis, flipped = principal_axis(cam, scale_h)
        if slab_path_valid(cam, self.volume_dims, axis, flipped, scale_h,
                           aspect=self.width / float(self.height)):
            if self._grads is None:
                self._grads = compute_gradient_volumes(self.grid)
            self._frame = slab_iso_render(
                self.grid, self._grads, self.tf, self.width, self.height,
                self.settings, axis, flipped, cam_arrays,
                jnp.float32(self.isovalue), self.transform,
            )
        else:
            diag = float(np.linalg.norm(
                np.asarray(self.volume_dims, np.float32)
                * np.maximum(scale_h, 1e-9)))
            n_steps = int(np.ceil(diag * self.settings.sampling_rate
                                  / max(float(scale_h.min()), 1e-9)))
            self._frame = brute_iso_render(
                self.grid, self.tf, self.width, self.height, self.settings,
                n_steps, cam_arrays, jnp.float32(self.isovalue),
                self.transform,
            )
        return self._frame

    def mapframe(self) -> np.ndarray:
        return np.asarray(self._frame).reshape(self.height, self.width, 4)
