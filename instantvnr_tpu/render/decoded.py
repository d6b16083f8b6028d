"""Decoded-volume renderer with progressive neural decoding.

The TPU flagship interactive pipeline, mirroring the reference's DECODING
render modes + `vnrNeuralVolumeDecodeProgressive` loop (api.cpp:228 →
infer_progressively_decode_volume, network.cu:290-326): the network is
decoded into a persistent grid 16-z-slice blob at a time (round-robin), and
every frame slab-composites the current grid (render/slabmarch.py) — so
rendering cost is independent of the network and training progress becomes
visible incrementally, exactly like the reference's GUI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel.macrocell import MacroCell
from instantvnr_tpu.models.metrics import decode_slab
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.slabmarch import (
    SlabSettings,
    principal_axis,
    slab_occupancy_from_macrocell,
    slab_render,
)
from instantvnr_tpu.utils.tfn import TransferFunction


@partial(jax.jit, donate_argnums=(0,))
def _write_blob(decoded, blob, z0):
    return jax.lax.dynamic_update_slice(decoded, blob, (z0, 0, 0))


class DecodedRenderer:
    """Renders a (possibly progressively decoded) grid via slab compositing."""

    def __init__(self, width: int, height: int, mc: MacroCell,
                 tf: TransferFunction, volume_dims,
                 settings: SlabSettings | None = None,
                 field=None, params=None, initial_volume=None,
                 slab_blob: int = 16, transform=None):
        from instantvnr_tpu.render.transform import default_transform

        dx, dy, dz = (int(d) for d in volume_dims)
        self.width, self.height = width, height
        self.mc = mc
        self.tf = tf
        self.volume_dims = (dx, dy, dz)
        self.settings = settings or SlabSettings()
        self.camera = Camera.default_for_dims(self.volume_dims)
        self.field = field
        self.params = None
        self._raw_params = None
        self.set_transform(transform or default_transform(volume_dims))
        if params is not None:
            self.set_params(params)
        self.slab_blob = slab_blob
        self._next_blob = 0
        if initial_volume is not None:
            # copy, not alias: decode_progressive donates this buffer, and
            # an aliased caller-held array would be deleted out from under
            # whoever still renders from it
            self.decoded = jnp.array(initial_volume, jnp.float32)
        else:
            self.decoded = jnp.zeros((dz, dy, dx), jnp.float32)
        self._frame = None
        self._gradients = None  # [3,dz,dy,dx], lazily built for shading
        self.shadow_volume = None  # optional [dz,dy,dx] transmittance
        self._shadow_light = None  # sticky light dir; auto-refresh on decode

    # -- progressive decoding (reference decode-progressive loop) -----------

    @property
    def n_blobs(self) -> int:
        """vnrNeuralVolumeGetNumberOfBlobs (network.cu:969-975)."""
        dz = self.volume_dims[2]
        return (dz + self.slab_blob - 1) // self.slab_blob

    def decode_progressive(self, n_blobs: int = 1):
        """Decode the next n blobs (round-robin) into the grid."""
        assert self.field is not None and self.params is not None
        dz = self.volume_dims[2]
        for _ in range(n_blobs):
            z0 = (self._next_blob % self.n_blobs) * self.slab_blob
            blob = decode_slab(self.field, self.params,
                               jnp.int32(z0), self.volume_dims,
                               slab=self.slab_blob)
            blob = blob[: max(0, min(self.slab_blob, dz - z0))]
            self.decoded = _write_blob(self.decoded, blob, z0)
            self._next_blob += 1
        self._gradients = None  # decoded content changed
        self._refresh_shadows()

    def decode_all(self):
        self.decode_progressive(self.n_blobs)

    def set_params(self, params):
        # bf16-table inference cast (models.network.render_params): decoding
        # is the same gather-bound batched inference as the wavefront, and
        # the reference decodes through tcnn's fp16 inference params
        # (tcnn_network.h:142-156) — ~1.5× fewer gathered bytes.
        # Identity-cached: rebinding the SAME params object (every cached
        # get_decoder() call) must not redo the 93 MB cast + corner packing.
        if params is not None and params is self._raw_params:
            return
        self._raw_params = params
        if (self.field is not None and isinstance(params, dict)
                and "table" in params):
            from instantvnr_tpu.models.network import render_params

            params = render_params(params, self.field)
        self.params = params

    def set_camera(self, cam: Camera):
        self.camera = cam

    def set_transform(self, transform):
        """Clipping box / scaling update (vnrVolumeSetClippingBox /
        vnrVolumeSetScaling, api.cpp:322-351)."""
        self.transform = transform
        # host copy for the per-frame static principal-axis pick — reading
        # a device array every frame costs a tunnel round trip (~1 ms)
        self._scale_h = np.asarray(transform.scale)

    def set_transfer_function(self, tf: TransferFunction):
        """Interactive TF edit (the reference GUI's per-change pipeline:
        re-derive macrocell max opacity + refresh shadows; the decoded grid
        itself is TF-independent so no re-decode is needed)."""
        from instantvnr_tpu.accel import macrocell as mcmod

        self.tf = tf
        self.mc = mcmod.update_max_opacity(self.mc, tf)
        self._refresh_shadows()

    def _refresh_shadows(self):
        """Recompute the sticky shadow volume after grid/TF changes."""
        if self._shadow_light is not None:
            light, rate = self._shadow_light
            self.enable_shadows(light, sampling_rate=rate)

    def enable_shadows(self, light_dir=None, sampling_rate: float = 1.0):
        """Compute the shadow volume from the current decoded grid
        (reference generate_shadow_map / MethodShadowMap, 2-pass). Sticky:
        once enabled, the volume auto-refreshes whenever the decoded grid
        changes — the sheared-cumprod sweep costs only ~3 ms at 128³ on a
        v5e, so shadows stay correct during online training and under
        moving lights (call again with a new light_dir)."""
        from instantvnr_tpu.render.shadow import shadow_volume_for

        light = (light_dir if light_dir is not None
                 else self.settings.light_dir)
        self._shadow_light = (tuple(light), float(sampling_rate))
        self.shadow_volume = shadow_volume_for(
            self.decoded, self.tf, light, sampling_rate
        )

    def disable_shadows(self):
        self._shadow_light = None
        self.shadow_volume = None

    # -- frame loop ---------------------------------------------------------

    def render(self):
        cam = self.camera
        scale_h = self._scale_h  # cached host copy (static axis pick)
        axis, flipped = principal_axis(cam, scale_h)
        from instantvnr_tpu.render.slabmarch import slab_path_valid

        if not slab_path_valid(cam, self.volume_dims, axis, flipped, scale_h,
                               aspect=self.width / float(self.height)):
            # degenerate camera (frustum looks backward along the principal
            # axis) — fall back to the masked-wavefront marcher; ordinary
            # fly-through cameras inside the volume stay on the fast
            # split-at-eye slab path
            return self._render_fallback(cam)
        cam_arrays = (
            jnp.asarray(cam.eye, jnp.float32),
            jnp.asarray(cam.center, jnp.float32),
            jnp.asarray(cam.up, jnp.float32),
            jnp.float32(cam.fovy),
        )
        d_slab = self.decoded.shape[0 if axis == 2 else (1 if axis == 1 else 2)]
        occ = slab_occupancy_from_macrocell(self.mc, axis, flipped, d_slab) \
            if self.settings.skip_empty_slabs else None
        grad = None
        if self.settings.shading == "gradient":
            if self._gradients is None:
                from instantvnr_tpu.render.slabmarch import (
                    compute_gradient_volumes,
                )

                self._gradients = compute_gradient_volumes(self.decoded)
            grad = self._gradients
        self._frame = slab_render(
            self.decoded, self.tf, cam_arrays, self.width, self.height,
            self.settings, axis, flipped, occ, grad, self.shadow_volume,
            self.transform,
        )
        return self._frame

    def _render_fallback(self, cam):
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import (
            _render_frame,
            reference_sample_fn,
        )

        if not hasattr(self, "_fb_accum") or self._fb_accum.shape[0] != \
                self.width * self.height:
            self._fb_accum = jnp.zeros((self.width * self.height, 4),
                                       jnp.float32)
        cam_arrays = (
            jnp.asarray(cam.eye, jnp.float32),
            jnp.asarray(cam.center, jnp.float32),
            jnp.asarray(cam.up, jnp.float32),
            jnp.float32(cam.fovy),
        )
        settings = RaymarchSettings(
            sampling_rate=self.settings.sampling_rate,
            density_scale=self.settings.density_scale,
            # keep shading consistent with the slab path so degenerate
            # cameras don't pop to an unshaded look
            shading=self.settings.shading,
            shading_scale=self.settings.shading_scale,
            light_dir=self.settings.light_dir,
        )
        self._fb_accum, self._frame = _render_frame(
            reference_sample_fn, self.width, self.height, settings,
            self.decoded, cam_arrays, self.mc, self.tf,
            jax.random.PRNGKey(0), self._fb_accum, jnp.int32(1),
            self.transform,
        )
        return self._frame

    def mapframe(self) -> np.ndarray:
        return np.asarray(self._frame).reshape(self.height, self.width, 4)
