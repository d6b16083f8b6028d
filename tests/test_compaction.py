"""Compacted wavefront == plain wavefront (render/compaction.py).

The bucketed-compaction driver reschedules the exact same supersteps the
in-jit while_loop runs, so the two must agree bit-for-bit-ish (float
assoc differences only) on every shading mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import (
    Camera,
    RaymarchSettings,
    Renderer,
    reference_sample_fn,
)
from instantvnr_tpu.render.compaction import _bucket, raymarch_compacted
from instantvnr_tpu.render.raymarch import raymarch
from instantvnr_tpu.utils.math import ray_box_intersect
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    return vol, tf, mc


def _rays(dims, n=64):
    cam = Camera.default_for_dims(dims)
    from instantvnr_tpu.render import camera_rays

    org_w, dirn = camera_rays(cam, n, n)
    d = jnp.array(dims, jnp.float32)
    org = org_w + 0.5 * d
    t0, t1, hit = ray_box_intersect(org, dirn, jnp.zeros(3), d)
    t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
    t1 = jnp.where(hit, t1, 0.0)
    jitter = jax.random.uniform(jax.random.PRNGKey(7), (org.shape[0],))
    return org, dirn, t0, t1, jitter


@pytest.mark.parametrize("shading", ["none", "gradient", "ssh"])
def test_compacted_matches_plain(scene, shading):
    vol, tf, mc = scene
    org, dirn, t0, t1, jitter = _rays(vol.dims)
    settings = RaymarchSettings(shading=shading, max_supersteps=64)
    light = jnp.array([0.7, 0.9, 0.4], jnp.float32)
    light = light / jnp.linalg.norm(light)

    ref = raymarch(lambda p: reference_sample_fn(vol.data, p),
                   org, dirn, t0, t1, mc, tf, jitter, settings,
                   light_dir=light)
    out = raymarch_compacted(reference_sample_fn, org, dirn, t0, t1, mc, tf,
                             jitter, settings, light_dir=light,
                             sample_ctx=vol.data)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_bucket_schedule():
    assert _bucket(1, 1 << 20) == 8192
    assert _bucket(8193, 1 << 20) == 16384
    assert _bucket(1 << 20, 1 << 18) == 1 << 18


def test_renderer_compact_flag(scene):
    """Renderer.render with compact=True equals compact=False (same key)."""
    vol, tf, mc = scene
    frames = []
    for compact in (False, True):
        r = Renderer(48, 48, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(compact=compact), seed=3)
        r.render()
        frames.append(r.mapframe())
    np.testing.assert_allclose(frames[1], frames[0], rtol=1e-4, atol=1e-5)


def test_warmup_precompiles_and_matches(scene):
    """Renderer.warmup() compiles the bucket family without disturbing
    output: a warmed renderer's frame equals an unwarmed one's."""
    vol, tf, mc = scene
    kw = dict(sample_fn=reference_sample_fn, sample_ctx=vol.data,
              settings=RaymarchSettings(n_iters=4, compact=True))
    cam = Camera.default_for_dims(vol.dims)
    r1 = Renderer(96, 96, mc, tf, **kw)  # r=9216 > MIN_BUCKET → 2 buckets
    r1.set_camera(cam)
    from instantvnr_tpu.render.compaction import bucket_sizes

    n = r1.warmup(parallel=True)
    assert n == len(bucket_sizes(96 * 96)) >= 2
    assert r1.frame_index == 0  # accumulation untouched
    f1 = np.asarray(r1.render())
    r2 = Renderer(96, 96, mc, tf, **kw)
    r2.set_camera(cam)
    f2 = np.asarray(r2.render())
    np.testing.assert_allclose(f1, f2, atol=1e-6)
