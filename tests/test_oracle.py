"""Independent NumPy ray-marching oracle (VERDICT round-1 item 7).

A from-scratch, per-ray scalar Python reimplementation of the reference's
adaptive macrocell ray-marching semantics (method_raymarching.cu:263-306 +
raytracing.h:146-194) — floor/min/max arithmetic on NumPy scalars, no JAX —
compared allclose against the production wavefront marcher (`raymarch`), the
compaction driver (`raymarch_compacted`), and loosely against the slab
compositor (different discretization). Exercises the volume transform
(clipping box + anisotropic scaling, render/transform.py) end to end: the
oracle receives only voxel-space rays + t-ranges and marches them, so a
mismatch anywhere in the march/classify/composite chain fails the test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE
from instantvnr_tpu.config import NEARLY_ONE, TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import Camera, RaymarchSettings
from instantvnr_tpu.render.compaction import raymarch_compacted
from instantvnr_tpu.render.raymarch import raymarch
from instantvnr_tpu.render.renderer import _frame_rays, reference_sample_fn
from instantvnr_tpu.render.transform import VolumeTransform, default_transform
from instantvnr_tpu.utils.tfn import bake_transfer_function

_EPS = 1e-6
_PROBE = 1e-3


# ---------------------------------------------------------------------------
# NumPy reimplementations (independent of the JAX code under test)
# ---------------------------------------------------------------------------

def np_trilinear(vol, p):
    """Cell-centered trilinear sample at object coords p [3] (CUDA tex3D
    with the reference remap, raytracing.h:105-110)."""
    dz, dy, dx = vol.shape
    dims = np.array([dx, dy, dz], np.float64)
    pr = p * (1.0 - 1.0 / dims) + 0.5 / dims
    x = np.clip(pr * dims - 0.5, 0.0, dims - 1.0)
    i0 = np.floor(x).astype(int)
    i1 = np.minimum(i0 + 1, (dims - 1).astype(int))
    f = x - i0
    out = 0.0
    for cz, wz in ((i0[2], 1 - f[2]), (i1[2], f[2])):
        for cy, wy in ((i0[1], 1 - f[1]), (i1[1], f[1])):
            for cx, wx in ((i0[0], 1 - f[0]), (i1[0], f[0])):
                out += wz * wy * wx * vol[cz, cy, cx]
    return out


def np_classify(tf_np, value):
    """Dense-LUT transfer function lookup (raytracing.h:148-157)."""
    colors, alphas, lo, hi = tf_np
    r = colors.shape[0]
    v = (min(max(value, lo), hi) - lo) / max(hi - lo, 1e-20)
    x = v * (r - 1)
    i0 = int(np.clip(np.floor(x), 0, r - 2))
    f = x - i0
    rgb = colors[i0] + (colors[i0 + 1] - colors[i0]) * f
    a = alphas[i0] + (alphas[i0 + 1] - alphas[i0]) * f
    return rgb, a


def np_cell_exit(org, dirn, cell, w):
    t = np.inf
    for ax in range(3):
        if dirn[ax] != 0.0:
            boundary = (cell[ax] + (1.0 if dirn[ax] > 0 else 0.0)) * w
            t = min(t, (boundary - org[ax]) / dirn[ax])
    return t


def oracle_ray(vol, occ_grid, tf_np, org, dirn, t0, t1, jitter,
               settings: RaymarchSettings, max_slots=4096):
    """March ONE ray; returns (rgb [3], alpha). Replicates the adaptive
    quantized stepping + empty-cell DDA skipping slot semantics."""
    dz, dy, dx = vol.shape
    dims = np.array([dx, dy, dz], np.float64)
    mz, my, mx = occ_grid.shape
    w = float(MACROCELL_SIZE)
    base = 1.0 / settings.sampling_rate

    def occupancy(cell):
        c = np.clip(cell, 0, [mx - 1, my - 1, mz - 1])
        return occ_grid[c[2], c[1], c[0]]

    t = t0
    t_cell_end = t0
    ss = np.inf
    alpha = 0.0
    color = np.zeros(3)
    if not (t0 < t1):
        return color, alpha
    for _ in range(max_slots):
        # --- the K-slot emission body (bounded skip loop + one emit) ------
        for _ in range(settings.max_skips):
            need_new = t >= t_cell_end - _EPS
            p = org + (t + _PROBE) * dirn
            cell = np.floor(p / w).astype(int)
            o = occupancy(cell)
            t_exit = max(np_cell_exit(org, dirn, cell, w), t + _PROBE)
            empty = o <= _EPS
            in_range = t < t1
            if need_new and in_range and empty:
                t = t_exit
            elif need_new and in_range and not empty:
                # adaptiveSamplingRate + sample_size_scaler quantization,
                # over the cell interval CLAMPED at the march end (the
                # reference dda: cell_t1 = min(ray_t0+t_closest, t_max),
                # dda.h:84)
                t_exit_c = min(t_exit, t1)
                scale15 = 15.0 * base
                rr = abs(np.clip(o, 0.1, 1.0) - 1.0)
                astep = max(base + scale15 * rr * rr, base)
                n = int(np.floor((t_exit_c - t) / astep)) + 1
                ss = (t_exit_c - t) / max(n, 1)
                t_cell_end = t_exit_c
        t_y = min(t + ss, t_cell_end)
        valid = (t_y > t + _EPS) and (t < t1) and (t_cell_end > t)
        t_x = t
        if valid:
            t = t_y
            # --- classify + opacity-correct + front-to-back ---------------
            t_s = t_x + jitter * (t_y - t_x)
            pos = (org + t_s * dirn) / dims
            value = np_trilinear(vol, pos)
            rgb_s, a_s = np_classify(tf_np, value)
            a_s = 1.0 - max(1.0 - a_s, 0.0) ** (
                settings.sampling_rate * (t_y - t_x) * settings.density_scale)
            if alpha < NEARLY_ONE:
                tr = 1.0 - alpha
                color = color + tr * rgb_s * a_s
                alpha = alpha + tr * a_s
        if t >= t1 or alpha >= NEARLY_ONE:
            break
        if not valid:
            break  # stuck rays never un-stick (state is unchanged)
    return color, alpha


def oracle_march(vol, occ_grid, tf_np, org, dirn, t0, t1, jitter, settings):
    out = np.zeros((org.shape[0], 4))
    for i in range(org.shape[0]):
        rgb, a = oracle_ray(vol, occ_grid, tf_np, org[i].astype(np.float64),
                            dirn[i].astype(np.float64), float(t0[i]),
                            float(t1[i]), float(jitter[i]), settings)
        out[i, :3] = rgb
        out[i, 3] = a
    return out


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    tf_np = (np.asarray(tf.colors, np.float64),
             np.asarray(tf.alphas, np.float64),
             float(tf.range_lo), float(tf.range_hi))
    occ = np.asarray(mc.max_opacity, np.float64)
    return vol, tf, mc, tf_np, occ


def _transforms(dims):
    d = jnp.asarray(dims, jnp.float32)
    return {
        "default": default_transform(dims),
        "clip": VolumeTransform(
            scale=jnp.ones(3, jnp.float32),
            clip_lower=jnp.array([4.0, 6.0, 8.0], jnp.float32),
            clip_upper=jnp.array([28.0, 26.0, 20.0], jnp.float32)),
        "scale": VolumeTransform(
            scale=jnp.array([1.0, 1.6, 0.55], jnp.float32),
            clip_lower=jnp.zeros(3, jnp.float32), clip_upper=d),
        "clip+scale": VolumeTransform(
            scale=jnp.array([0.8, 1.3, 1.0], jnp.float32),
            clip_lower=jnp.array([2.0, 0.0, 5.0], jnp.float32),
            clip_upper=jnp.array([30.0, 24.0, 32.0], jnp.float32)),
    }


def _rays_for(xform, dims, n=24):
    cam = Camera(eye=(20.0, 14.0, -70.0), center=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fovy=45.0)
    cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
                  jnp.asarray(cam.center, jnp.float32),
                  jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
    org, dirn, t0, t1, light, lo, hi = _frame_rays(
        n, n, cam_arrays, jnp.asarray(dims, jnp.float32),
        jnp.array([0.7, 0.9, 0.4], jnp.float32), xform)
    jitter = jax.random.uniform(jax.random.PRNGKey(11), (org.shape[0],))
    return org, dirn, t0, t1, jitter, lo, hi


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("case", ["default", "clip", "scale", "clip+scale"])
def test_wavefront_matches_oracle(scene, case):
    vol, tf, mc, tf_np, occ = scene
    xform = _transforms(vol.dims)[case]
    org, dirn, t0, t1, jitter, lo, hi = _rays_for(xform, vol.dims)
    settings = RaymarchSettings(shading="none")

    got = raymarch(lambda p: reference_sample_fn(vol.data, p),
                   org, dirn, t0, t1, mc, tf, jitter, settings,
                   scale=xform.scale, clip_lower=lo, clip_upper=hi)
    want = oracle_march(np.asarray(vol.data, np.float64), occ, tf_np,
                        np.asarray(org), np.asarray(dirn), np.asarray(t0),
                        np.asarray(t1), np.asarray(jitter), settings)
    assert np.asarray(got).shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_compacted_matches_oracle(scene):
    vol, tf, mc, tf_np, occ = scene
    xform = _transforms(vol.dims)["clip+scale"]
    org, dirn, t0, t1, jitter, lo, hi = _rays_for(xform, vol.dims)
    settings = RaymarchSettings(shading="none")

    got = raymarch_compacted(reference_sample_fn, org, dirn, t0, t1, mc, tf,
                             jitter, settings, sample_ctx=vol.data,
                             scale=xform.scale, clip_lower=lo, clip_upper=hi)
    want = oracle_march(np.asarray(vol.data, np.float64), occ, tf_np,
                        np.asarray(org), np.asarray(dirn), np.asarray(t0),
                        np.asarray(t1), np.asarray(jitter), settings)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_clip_only_removes_energy(scene):
    """Clipping can only remove integrated opacity, never add."""
    vol, tf, mc, tf_np, occ = scene
    xforms = _transforms(vol.dims)
    full = _rays_for(xforms["default"], vol.dims)
    clip = _rays_for(xforms["clip"], vol.dims)
    settings = RaymarchSettings(shading="none")
    fn = lambda p: reference_sample_fn(vol.data, p)  # noqa: E731
    a_full = np.asarray(raymarch(fn, *full[:4], mc, tf, full[4], settings))[:, 3]
    a_clip = np.asarray(raymarch(fn, *clip[:4], mc, tf, clip[4], settings,
                                 clip_lower=clip[5], clip_upper=clip[6]))[:, 3]
    assert (a_clip <= a_full + 1e-3).all()
    assert a_clip.sum() < 0.9 * a_full.sum()  # the box meaningfully clips


def test_slab_near_oracle(scene):
    """The slab compositor discretizes differently (slab planes vs ray
    steps) — demand closeness, not equality, on the same clipped+scaled
    scene. An axis-aligned far camera keeps the discretizations comparable."""
    from instantvnr_tpu.render.slabmarch import (
        SlabSettings,
        principal_axis,
        slab_render,
    )

    vol, tf, mc, tf_np, occ = scene
    xform = _transforms(vol.dims)["clip+scale"]
    n = 24
    cam = Camera(eye=(3.0, 2.0, -90.0), center=(0.0, 0.0, 0.0),
                 up=(0.0, 1.0, 0.0), fovy=30.0)
    cam_arrays = (jnp.asarray(cam.eye, jnp.float32),
                  jnp.asarray(cam.center, jnp.float32),
                  jnp.asarray(cam.up, jnp.float32), jnp.float32(cam.fovy))
    scale_h = np.asarray(xform.scale)
    axis, flipped = principal_axis(cam, scale_h)
    frame = slab_render(vol.data, tf, cam_arrays, n, n, SlabSettings(),
                        axis, flipped, None, None, None, xform)

    org, dirn, t0, t1, light, lo, hi = _frame_rays(
        n, n, cam_arrays, jnp.asarray(vol.dims, jnp.float32),
        jnp.array([0.7, 0.9, 0.4], jnp.float32), xform)
    want = oracle_march(np.asarray(vol.data, np.float64), occ, tf_np,
                        np.asarray(org), np.asarray(dirn), np.asarray(t0),
                        np.asarray(t1), 0.5 * np.ones(org.shape[0]),
                        RaymarchSettings(shading="none"))
    got = np.asarray(frame)
    diff = np.abs(got - want)
    assert diff.mean() < 0.02, diff.mean()
    assert np.corrcoef(got[:, 3], want[:, 3])[0, 1] > 0.99
