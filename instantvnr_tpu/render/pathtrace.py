"""Volumetric path tracer — delta tracking with per-macrocell majorants.

TPU redesign of `core/renderer/method_pathtracing.cu`. The CUDA wavefront
suspends/resumes per-ray `DeltaTrackingIter` payloads through atomic queues
(:82-172, :679-813); here every ray advances ONE tracking event per
bulk-synchronous superstep of a masked lax.while_loop:

  event = consume the remaining optical depth τ through the current
  macrocell (majorant = cell max-opacity × density_scale — the per-cell
  varying majorant of delta_tracking, :261-359), which yields one of
    - cell exit   → move to the next cell (τ partially consumed)
    - volume exit → escape lighting / shadow-ray resolution
    - collision candidate → ONE batched volume sample + TF classification,
      accepted with probability σ(x)/majorant

and the per-ray state machine on top is the reference's wavefront program
(path_tracing_traceray, :424-476):
    primary/scatter ray hit → russian roulette (>4 scatters, q=min(.95,
    max(throughput)), :366-376) → move origin, throughput ×= 0.6·albedo
    (PHASE, :35) → fire a SHADOW ray toward the directional light;
    shadow ray resolved (escape adds light_directional_rgb, hit adds
    nothing) → continue with a uniform-sphere scatter direction;
    scatter-ray escape adds throughput·light_ambient (not for primaries).

Progressive: one sample/pixel/frame, averaged by the caller's accumulation
buffer. All volume samples in a superstep form one batched sample_fn call.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE, MacroCell
from instantvnr_tpu.render.camera import Camera, camera_rays
from instantvnr_tpu.render.raymarch import (_PROBE_EPS, _cell_exit_t, _occupancy)
from instantvnr_tpu.utils.math import normalize, ray_box_intersect
from instantvnr_tpu.utils.tfn import TransferFunction, classify_controls

_EPS = 1e-6
RUSSIAN_ROULETTE_LENGTH = 4  # method_pathtracing.cu:33
PHASE_FACTOR = 0.6  # PHASE(albedo) = 0.6·albedo (:35)


@dataclass(frozen=True)
class PathTraceSettings:
    density_scale: float = 1.0
    max_events: int = 512  # superstep bound per frame sample
    light_ambient: float = 1.5  # instantvnr_types.h:146
    light_rgb: tuple = (1.0, 1.0, 1.0)
    light_dir: tuple = (0.7, 0.9, 0.4)  # flipped against view (renderer.cpp:98-100)


class _PTState(NamedTuple):
    org: jnp.ndarray  # [R,3] current segment origin (voxel space)
    dirn: jnp.ndarray  # [R,3]
    t: jnp.ndarray  # [R] position along current segment
    t_far: jnp.ndarray  # [R]
    tau: jnp.ndarray  # [R] remaining optical depth to next candidate
    throughput: jnp.ndarray  # [R,3]
    radiance: jnp.ndarray  # [R,3]
    scatter_index: jnp.ndarray  # [R] int32
    shadow: jnp.ndarray  # [R] bool
    active: jnp.ndarray  # [R] bool


def _uniform_sphere(u: jnp.ndarray) -> jnp.ndarray:
    """uniform_sample_sphere (raytracing.h:263-269). u: [R,2]."""
    phi = 2.0 * jnp.pi * u[:, 0]
    cos_t = 1.0 - 2.0 * u[:, 1]
    sin_t = 2.0 * jnp.sqrt(jnp.maximum(u[:, 1] * (1.0 - u[:, 1]), 0.0))
    return jnp.stack(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )


def _restart_segment(org, dirn, box_lo, box_hi):
    """After a direction change the segment starts at the origin (inside the
    volume): tnear 0, tfar = box exit. The box is the CLIP box when one is
    set (the reference overwrites DeviceVolume::bbox, object.cpp:386-391)."""
    _, t1, hit = ray_box_intersect(org, dirn, box_lo, box_hi)
    return jnp.where(hit, jnp.maximum(t1, 0.0), 0.0)


def pathtrace(
    sample_fn: Callable[[jnp.ndarray], jnp.ndarray],
    org: jnp.ndarray,  # [R,3] voxel-space origins
    dirn: jnp.ndarray,
    t_near: jnp.ndarray,
    t_far: jnp.ndarray,
    mc: MacroCell,
    tf: TransferFunction,
    key: jax.Array,
    settings: PathTraceSettings,
    light_dir_world: jnp.ndarray,
    scale=None,  # [3] voxel→world scaling (render/transform.py)
    clip_lower=None,  # [3] voxel-space clip box
    clip_upper=None,
) -> jnp.ndarray:
    """One progressive sample per ray → radiance rgba [R, 4].

    Under anisotropic scaling the caller hands VOXEL-space rays with
    UNNORMALIZED directions (t stays world-metric, so the optical depth per
    t is unchanged); scatter/shadow directions generated here are drawn in
    world space and mapped through S⁻¹ the same way."""
    r = org.shape[0]
    dims = jnp.array(mc.volume_dims, jnp.float32)
    w = float(MACROCELL_SIZE)
    light_dir = normalize(light_dir_world)
    light_rgb = jnp.asarray(settings.light_rgb, jnp.float32)
    box_lo = jnp.zeros(3) if clip_lower is None else clip_lower
    box_hi = dims if clip_upper is None else clip_upper
    s_inv = (jnp.ones(3, jnp.float32) if scale is None
             else 1.0 / jnp.asarray(scale, jnp.float32))
    light_v = light_dir * s_inv  # world light → voxel marching direction

    k_tau, key = jax.random.split(key)
    state = _PTState(
        org=org,
        dirn=dirn,
        t=t_near,
        t_far=t_far,
        tau=-jnp.log1p(-jax.random.uniform(k_tau, (r,))),
        throughput=jnp.ones((r, 3), jnp.float32),
        radiance=jnp.zeros((r, 3), jnp.float32),
        scatter_index=jnp.zeros((r,), jnp.int32),
        shadow=jnp.zeros((r,), bool),
        active=t_near < t_far,
    )

    def superstep(carry):
        st, key, it = carry
        key, k1, k2, k3, k4, k5 = jax.random.split(key, 6)

        # --- advance τ through the current cell -------------------------
        p = st.org + (st.t + _PROBE_EPS)[:, None] * st.dirn
        cell = jnp.floor(p / w).astype(jnp.int32)
        majorant = _occupancy(mc, cell) * settings.density_scale
        t1 = jnp.minimum(
            jnp.maximum(_cell_exit_t(st.org, st.dirn, cell, w),
                        st.t + _PROBE_EPS),
            st.t_far,
        )
        dtau = (t1 - st.t) * majorant
        crosses = st.tau > dtau  # τ survives the cell → move to next cell
        t_coll = st.t + st.tau / jnp.maximum(majorant, _EPS)
        new_t = jnp.where(crosses, t1, t_coll)
        new_tau = jnp.where(crosses, st.tau - dtau, st.tau)

        exited = crosses & (new_t >= st.t_far - _EPS)
        candidate = ~crosses  # a collision candidate inside this cell

        # --- one batched volume sample for all candidates ----------------
        pos = st.org + new_t[:, None] * st.dirn
        pos_obj = jnp.clip(pos / dims, 0.0, 1.0)
        values = sample_fn(pos_obj)
        rgb, alpha = classify_controls(tf, values)
        u_accept = jax.random.uniform(k1, (r,))
        real = candidate & (
            u_accept * jnp.maximum(majorant, _EPS)
            < alpha * settings.density_scale
        )
        null = candidate & ~real  # null collision: draw a fresh τ, continue
        new_tau = jnp.where(null, -jnp.log1p(-jax.random.uniform(k2, (r,))),
                            new_tau)

        # --- event handling ----------------------------------------------
        act = st.active
        radiance = st.radiance
        throughput = st.throughput
        scatter_index = st.scatter_index
        shadow = st.shadow
        org_new = st.org
        dir_new = st.dirn
        t_new = new_t
        tfar_new = st.t_far
        terminate = jnp.zeros((r,), bool)

        # (1) shadow ray resolved (exit → add light; hit → nothing), then
        #     becomes a scatter ray with a uniform-sphere direction
        shadow_done = act & shadow & (exited | real)
        radiance = jnp.where(
            (shadow_done & exited)[:, None],
            radiance + throughput * light_rgb[None, :],
            radiance,
        )
        sphere = _uniform_sphere(jax.random.uniform(k3, (r, 2))) * s_inv
        dir_new = jnp.where(shadow_done[:, None], sphere, dir_new)
        shadow = jnp.where(shadow_done, False, shadow)

        # (2) scatter/primary ray escaped → ambient light (not primaries)
        escape = act & ~st.shadow & exited
        radiance = jnp.where(
            (escape & (scatter_index > 0))[:, None],
            radiance + throughput * settings.light_ambient,
            radiance,
        )
        terminate = terminate | escape

        # (3) real collision on a scatter/primary ray → russian roulette,
        #     move origin, apply phase, fire shadow ray toward the light
        hit = act & ~st.shadow & real
        # floor keeps the boost division finite when throughput reaches
        # exactly zero (black TF colors) and u draws exactly 0.0 — a NaN
        # here would poison the progressive accumulation permanently
        rr_q = jnp.clip(jnp.max(throughput, axis=-1), 1e-6, 0.95)
        rr_kill = hit & (scatter_index > RUSSIAN_ROULETTE_LENGTH) & (
            jax.random.uniform(k4, (r,)) > rr_q
        )
        rr_boost = hit & (scatter_index > RUSSIAN_ROULETTE_LENGTH) & ~rr_kill
        throughput = jnp.where(
            rr_boost[:, None], throughput / rr_q[:, None], throughput
        )
        terminate = terminate | rr_kill
        hit = hit & ~rr_kill
        scatter_index = jnp.where(hit, scatter_index + 1, scatter_index)
        org_new = jnp.where(hit[:, None], pos, org_new)
        throughput = jnp.where(
            hit[:, None], throughput * PHASE_FACTOR * rgb, throughput
        )
        dir_new = jnp.where(hit[:, None], light_v[None, :], dir_new)
        shadow = jnp.where(hit, True, shadow)

        # segment restarts where the direction changed
        restart = shadow_done | hit
        tfar_restart = _restart_segment(org_new, dir_new, box_lo, box_hi)
        tfar_new = jnp.where(restart, tfar_restart, tfar_new)
        t_new = jnp.where(restart, 0.0, t_new)
        # dedicated key: drawing from the carried `key` would reuse the
        # same key material the next superstep's split consumes, giving
        # mechanically correlated tau/scatter decisions across events
        new_tau2 = jnp.where(
            restart, -jnp.log1p(-jax.random.uniform(k5, (r,))), new_tau
        )

        active = act & ~terminate
        st = _PTState(
            org=org_new, dirn=dir_new, t=t_new, t_far=tfar_new, tau=new_tau2,
            throughput=throughput, radiance=radiance,
            scatter_index=scatter_index, shadow=shadow, active=active,
        )
        return st, key, it + 1

    def cond(carry):
        st, _, it = carry
        return jnp.any(st.active) & (it < settings.max_events)

    state, _, _ = jax.lax.while_loop(cond, superstep,
                                     (state, key, jnp.int32(0)))
    alpha = jnp.where(state.scatter_index > 0, 1.0, 0.0)
    return jnp.concatenate([state.radiance, alpha[:, None]], axis=-1)


@partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(9,))
def _pt_frame(sample_fn, width, height, settings, sample_ctx, cam_arrays,
              mc, tf, key, accum, frame_index, xform=None):
    from instantvnr_tpu.render.transform import (
        clip_bounds,
        default_transform,
        rays_to_voxel,
    )

    cam = Camera(eye=cam_arrays[0], center=cam_arrays[1], up=cam_arrays[2],
                 fovy=cam_arrays[3])
    k_jit, k_pt = jax.random.split(key)
    jit2 = jax.random.uniform(k_jit, (width * height, 2))
    org_w, dirn_w = camera_rays(cam, width, height, jitter=jit2)
    dims = jnp.array(mc.volume_dims, jnp.float32)
    if xform is None:
        xform = default_transform(dims)
    org, dirn = rays_to_voxel(xform, dims, org_w, dirn_w)
    lo, hi = clip_bounds(xform, dims)
    t0, t1, hit = ray_box_intersect(org, dirn, lo, hi)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)

    # flip the light against the view direction (renderer.cpp:98-100)
    view = normalize(cam_arrays[1] - cam_arrays[0])
    light = jnp.asarray(settings.light_dir, jnp.float32)
    light = jnp.where(jnp.dot(view, light) > 0, -light, light)

    rgba = pathtrace(partial(sample_fn, sample_ctx), org, dirn, t0, t1,
                     mc, tf, k_pt, settings, light, scale=xform.scale,
                     clip_lower=lo, clip_upper=hi)
    accum = jnp.where(frame_index == 1, rgba, accum + rgba)
    return accum, accum / frame_index.astype(jnp.float32)


class PathTraceRenderer:
    """Progressive path-tracing frame orchestrator (same surface as
    render.renderer.Renderer)."""

    def __init__(self, width, height, mc: MacroCell, tf: TransferFunction,
                 volume_or_ctx, sample_fn=None,
                 settings: PathTraceSettings | None = None, seed: int = 0,
                 transform=None):
        from instantvnr_tpu.render.renderer import reference_sample_fn
        from instantvnr_tpu.render.transform import default_transform

        self.width, self.height = width, height
        self.mc, self.tf = mc, tf
        self.sample_fn = sample_fn or reference_sample_fn
        self.sample_ctx = volume_or_ctx
        self.settings = settings or PathTraceSettings()
        self.transform = transform or default_transform(mc.volume_dims)
        self.camera = Camera.default_for_dims(mc.volume_dims)
        self._key = jax.random.PRNGKey(seed)
        self._accum = jnp.zeros((width * height, 4), jnp.float32)
        self._frame = self._accum
        self.frame_index = 0

    def set_camera(self, cam: Camera):
        self.camera = cam
        self.frame_index = 0

    def set_transform(self, transform):
        """Clipping box / scaling update (vnrVolumeSetClippingBox /
        vnrVolumeSetScaling through the facade); restarts accumulation."""
        self.transform = transform
        self.frame_index = 0

    def render(self):
        self.frame_index += 1
        self._key, sub = jax.random.split(self._key)
        cam = self.camera
        cam_arrays = (
            jnp.asarray(cam.eye, jnp.float32),
            jnp.asarray(cam.center, jnp.float32),
            jnp.asarray(cam.up, jnp.float32),
            jnp.float32(cam.fovy),
        )
        if self.frame_index == 1:
            self._accum = jnp.zeros((self.width * self.height, 4), jnp.float32)
        self._accum, self._frame = _pt_frame(
            self.sample_fn, self.width, self.height, self.settings,
            self.sample_ctx, cam_arrays, self.mc, self.tf, sub, self._accum,
            jnp.int32(self.frame_index), self.transform,
        )
        return self._frame

    def mapframe(self, denoise: bool = False) -> np.ndarray:
        """Frame readback; denoise=True applies the à-trous filter (the
        reference's optional denoiser hook, renderer.cpp:117-121)."""
        frame = self._frame.reshape(self.height, self.width, 4)
        if denoise:
            from instantvnr_tpu.render.denoise import atrous_denoise

            frame = atrous_denoise(frame)
        return np.asarray(frame)
