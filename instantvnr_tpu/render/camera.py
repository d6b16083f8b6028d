"""Camera model (reference `renderer.cpp:87-96` LaunchParams derivation).

World space: the volume occupies the box [-dims/2, +dims/2] (the reference's
object transform translate(-dims/2)·scale(dims), network.cu:569). Rays are
generated in world units — for an isotropic volume one world unit is one
voxel, so the marching step 1/sampling_rate means "one voxel per step" at
rate 1, exactly like the reference.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from instantvnr_tpu.config import CameraConfig
from instantvnr_tpu.utils.math import normalize


@dataclass(frozen=True)
class Camera:
    eye: tuple[float, float, float]
    center: tuple[float, float, float]
    up: tuple[float, float, float]
    fovy: float = 60.0  # degrees

    @classmethod
    def from_config(cls, cfg: CameraConfig) -> "Camera":
        return cls(eye=tuple(cfg.eye), center=tuple(cfg.center),
                   up=tuple(cfg.up), fovy=cfg.fovy)

    @classmethod
    def default_for_dims(cls, dims) -> "Camera":
        """A sensible default framing the whole volume (apps do similar)."""
        d = max(dims)
        return cls(eye=(0.0, 0.0, -2.2 * d), center=(0.0, 0.0, 0.0),
                   up=(0.0, 1.0, 0.0), fovy=45.0)

    @classmethod
    def from_scene(cls, path: str) -> "Camera":
        """vnrCreateCamera(scene json) (api.cpp:66-86): read the camera
        section of a scene file (either dialect)."""
        from instantvnr_tpu.config import load_scene_config

        return cls.from_config(load_scene_config(path).camera)

    # vnrCameraSet / vnrCameraGet{Position,Focus,UpVec} (api.h:120-125).
    # The dataclass is frozen (it is hashed into jit caches), so set()
    # returns the updated handle.
    def set(self, eye=None, center=None, up=None, fovy=None) -> "Camera":
        from dataclasses import replace

        kw = {}
        if eye is not None:
            kw["eye"] = tuple(float(v) for v in eye)
        if center is not None:
            kw["center"] = tuple(float(v) for v in center)
        if up is not None:
            kw["up"] = tuple(float(v) for v in up)
        if fovy is not None:
            kw["fovy"] = float(fovy)
        return replace(self, **kw)

    @property
    def position(self):
        return self.eye

    @property
    def focus(self):
        return self.center

    @property
    def up_vec(self):
        return self.up


def camera_rays(cam: Camera, width: int, height: int,
                jitter: jnp.ndarray | None = None):
    """Per-pixel rays, reference parameterization (renderer.cpp:87-96):

        t  = 2·tan(fovy/2);  aspect = W/H
        horizontal = t·aspect · normalize(dir × up)
        vertical   = (horizontal × dir)/aspect          (magnitude t)
        ray = dir + (sx−.5)·horizontal + (sy−.5)·vertical,  s ∈ [0,1]²

    Returns (origins [H·W,3], dirs [H·W,3] normalized), row-major with pixel
    (0,0) at the bottom-left (matching the CUDA fbIndex = ix + iy·W layout).
    """
    eye = jnp.asarray(cam.eye, jnp.float32)
    direction = normalize(jnp.asarray(cam.center, jnp.float32) - eye)
    up = jnp.asarray(cam.up, jnp.float32)
    t = 2.0 * jnp.tan(jnp.asarray(cam.fovy, jnp.float32) * jnp.pi / 360.0)
    aspect = width / float(height)
    horizontal = t * aspect * normalize(jnp.cross(direction, up))
    vertical = jnp.cross(horizontal, direction) / aspect

    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    px = xx.reshape(-1)
    py = yy.reshape(-1)
    if jitter is None:
        sx = (px + 0.5) / width
        sy = (py + 0.5) / height
    else:
        sx = (px + jitter[:, 0]) / width
        sy = (py + jitter[:, 1]) / height
    dirs = (
        direction[None, :]
        + (sx - 0.5)[:, None] * horizontal[None, :]
        + (sy - 0.5)[:, None] * vertical[None, :]
    )
    dirs = normalize(dirs)
    origins = jnp.broadcast_to(eye[None, :], dirs.shape)
    return origins, dirs
