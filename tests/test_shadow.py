import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.render.shadow import shadow_volume_for
from instantvnr_tpu.utils.tfn import bake_transfer_function


class TestShadowVolume:
    def test_axis_aligned_occluder(self):
        """A dense slab at z∈[8,12) shadows everything behind it for a −z
        light (light at +z, propagating toward −z)."""
        tf = bake_transfer_function(TransferFunctionConfig())
        vol = jnp.zeros((32, 16, 16)).at[20:24].set(0.95)
        s = np.asarray(shadow_volume_for(vol, tf, (0.0, 0.0, 1.0)))
        assert s.shape == (32, 16, 16)
        # in front of the occluder (z > 24, closer to the light): lit
        assert s[26:].min() > 0.95
        # behind it (z < 19): strongly shadowed
        assert s[:19].max() < 0.1
        # inside the slab: attenuating monotonically toward −z
        col = s[18:26, 8, 8]
        assert (np.diff(col) >= -1e-6).all()

    def test_empty_volume_fully_lit(self):
        tf = bake_transfer_function(TransferFunctionConfig())
        vol = jnp.zeros((16, 16, 16))
        s = np.asarray(shadow_volume_for(vol, tf, (0.3, 0.9, 0.2)))
        assert s.min() > 0.999

    def test_oblique_light_shifts_shadow(self):
        """An oblique light displaces the shadow laterally."""
        tf = bake_transfer_function(TransferFunctionConfig())
        vol = jnp.zeros((32, 32, 32)).at[20:23, 14:18, 14:18].set(0.95)
        s = np.asarray(shadow_volume_for(vol, tf, (0.5, 0.0, 1.0)))
        layer = s[8]  # well behind the occluder
        ys, xs = np.where(layer < 0.5)
        assert len(xs) > 0
        # light from +x,+z → shadow shifts toward −x as z decreases
        assert xs.mean() < 14.5, xs.mean()

    def test_side_entry_rays_are_shadowed(self):
        """Regression: voxels whose light ray enters through a SIDE face
        must still accumulate occlusion. Without lateral padding of the
        sheared buffer, a (0.9, 0, 1) light left 87.5% of the deepest layer
        of a fully opaque cube marked fully lit."""
        tf = bake_transfer_function(TransferFunctionConfig())
        vol = jnp.full((32, 32, 32), 1.0)
        s = np.asarray(shadow_volume_for(vol, tf, (0.9, 0.0, 1.0)))
        deep = s[0]  # farthest layer from the light
        # nothing reads back as fully lit (was 87.5% of the layer); the
        # extreme +x edge column's ray exits through the side after a
        # sliver of one voxel, so it alone stays bright — physical
        assert (deep > 0.95).mean() == 0.0
        assert deep[:, :-2].max() < 1e-3, deep[:, :-2].max()
        assert deep.mean() < 0.05, deep.mean()

    def test_shadowed_render_darker(self):
        from instantvnr_tpu.accel import macrocell as mcmod
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.decoded import DecodedRenderer

        vol = synthetic_volume((32, 32, 32), kind="sphere")
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        cam = Camera(eye=(5, 4, -70), center=(0, 0, 0), up=(0, 1, 0))
        r = DecodedRenderer(16, 16, mc, tf, vol.dims, initial_volume=vol.data)
        r.set_camera(cam)
        r.render()
        base = r.mapframe()
        r.enable_shadows(light_dir=(0.2, 0.9, 0.3))
        r.render()
        shadowed = r.mapframe()
        assert np.isfinite(shadowed).all()
        np.testing.assert_allclose(shadowed[..., 3], base[..., 3], atol=1e-3)
        hit = base[..., 3] > 0.2
        assert shadowed[..., :3][hit].mean() < base[..., :3][hit].mean()


class TestTransmittanceOracle:
    """The sheared-cumprod shadow volume vs a brute-force per-point shadow
    ray march (the reference's own transmittance semantics,
    method_optix.cu:111/shadeVolume_shadow: march toward the light,
    accumulate opacity-corrected alpha)."""

    def _brute_transmittance(self, vol, tf, points_v, light_dir, rate=1.0,
                             h=0.25):
        """NumPy oracle: T(p) = Π (1−α(p+t·l))^(rate·h) marching from p
        toward the light until exiting the volume."""
        from instantvnr_tpu.ops.trilinear import sample_volume
        from instantvnr_tpu.utils.tfn import classify_controls

        vol_np = np.asarray(vol)
        dz, dy, dx = vol_np.shape
        dims = np.array([dx, dy, dz], np.float32)
        l = np.asarray(light_dir, np.float32)
        l = l / np.linalg.norm(l)
        out = []
        for p in np.asarray(points_v, np.float32):
            t = h  # exclusive of the starting point itself
            trans = 1.0
            while True:
                q = p + t * l
                if (q < 0).any() or (q >= dims).any():
                    break
                val = float(np.asarray(sample_volume(
                    jnp.asarray(vol_np), jnp.asarray(q[None] / dims)))[0])
                _, a = classify_controls(tf, jnp.asarray([val]))
                a = float(np.asarray(a)[0])
                trans *= (1.0 - a) ** (rate * h)
                t += h
            out.append(trans)
        return np.array(out, np.float32)

    @pytest.mark.parametrize("light", [(0.0, 0.0, 1.0), (0.4, 0.3, 0.9)])
    def test_shadow_volume_matches_brute_march(self, light):
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.ops.trilinear import sample_volume

        vol = synthetic_volume((24, 24, 24), kind="sphere").data
        tf = bake_transfer_function(TransferFunctionConfig())
        s = shadow_volume_for(vol, tf, light)

        rng = np.random.default_rng(0)
        pts = rng.uniform(2.0, 22.0, (24, 3)).astype(np.float32)
        brute = self._brute_transmittance(vol, tf, pts, light)
        got = np.asarray(sample_volume(
            s, jnp.asarray(pts / np.float32(24.0))))
        # shear interpolation + layer quantization vs exact march: agree to
        # ~0.1 absolute, unbiased
        np.testing.assert_allclose(got, brute, atol=0.12)
        assert abs(float(np.mean(got - brute))) < 0.04


class TestFullShadowMode:
    """FULL_SHADOW (reference api.h:39, method_optix.cu:208-215): the
    wavefront's per-sample shadow modulation and both facade modes."""

    def _scene(self):
        from instantvnr_tpu.accel import macrocell as mcmod
        from instantvnr_tpu.data import synthetic_volume

        vol = synthetic_volume((32, 32, 32), kind="sphere")
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        return vol, tf, mc

    def test_wavefront_shadow_modulation_oracle(self):
        """shading='shadow' must equal the plain march with the TF color
        modulated by (1−s) + s·S(pos) — checked against a manual compose
        using S ≡ 0 (fully shadowed): color scales by exactly (1−s),
        alpha unchanged."""
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import (
            Renderer,
            reference_sample_fn,
        )

        vol, tf, mc = self._scene()
        cam = Camera(eye=(5, 4, -70), center=(0, 0, 0), up=(0, 1, 0))

        r0 = Renderer(16, 16, mc, tf, reference_sample_fn,
                      sample_ctx=vol.data,
                      settings=RaymarchSettings(shading="none"), seed=5)
        r0.set_camera(cam)
        r0.render()
        plain = np.asarray(r0._frame)

        rs = Renderer(16, 16, mc, tf, reference_sample_fn,
                      sample_ctx=vol.data,
                      settings=RaymarchSettings(shading="shadow",
                                                shading_scale=0.95), seed=5)
        rs.set_shadow_volume(jnp.zeros((32, 32, 32), jnp.float32))
        rs.set_camera(cam)
        rs.render()
        dark = np.asarray(rs._frame)
        np.testing.assert_allclose(dark[:, :3], plain[:, :3] * 0.05,
                                   atol=1e-5)
        np.testing.assert_allclose(dark[:, 3], plain[:, 3], atol=1e-6)

        # fully lit (S ≡ 1) reproduces the plain march exactly
        rs.set_shadow_volume(jnp.ones((32, 32, 32), jnp.float32))
        rs.render()
        lit = np.asarray(rs._frame)
        # 1e-3: the extra (exactly-1.0) modulation changes XLA fusion, not
        # the math — compose accumulation reassociates slightly
        np.testing.assert_allclose(lit, plain, atol=1e-3)

    def test_wavefront_compacted_shadow_matches_plain(self):
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings
        from instantvnr_tpu.render.renderer import (
            Renderer,
            reference_sample_fn,
        )

        vol, tf, mc = self._scene()
        s = shadow_volume_for(vol.data, tf, (0.4, 0.3, 0.9))
        cam = Camera(eye=(5, 4, -70), center=(0, 0, 0), up=(0, 1, 0))
        frames = {}
        for compact in (False, True):
            r = Renderer(16, 16, mc, tf, reference_sample_fn,
                         sample_ctx=vol.data,
                         settings=RaymarchSettings(shading="shadow",
                                                   compact=compact), seed=2)
            r.set_shadow_volume(s)
            r.set_camera(cam)
            r.render()
            frames[compact] = np.asarray(r._frame)
        np.testing.assert_allclose(frames[True], frames[False], atol=1e-5)

    def test_facade_full_shadow_modes_darker_than_unshadowed(self):
        import dataclasses

        from instantvnr_tpu.api import (
            NeuralVolume,
            RenderMode,
            SimpleVolume,
            VNRenderer,
        )
        from instantvnr_tpu.config import (
            EncodingConfig,
            ModelConfig,
            NetworkConfig,
        )

        simple = SimpleVolume.synthetic(dims=(32, 32, 32), kind="sphere")
        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=16, n_hidden_layers=2))
        nv = NeuralVolume(cfg, simple=simple, train_batch=4096)
        nv.train(50)

        for mode, base_mode, subject in (
                (RenderMode.FULL_SHADOW_REFERENCE,
                 RenderMode.REFERENCE_RAYMARCH, simple),
                (RenderMode.FULL_SHADOW_DECODED,
                 RenderMode.DECODED_SLAB, nv)):
            rb = VNRenderer(subject, width=16, height=16, mode=base_mode)
            rb.render()
            base = rb.mapframe()
            rs = VNRenderer(subject, width=16, height=16, mode=mode)
            rs.render()
            sh = rs.mapframe()
            assert np.isfinite(sh).all()
            # shadows only darken; somewhere measurably
            assert sh[..., :3].sum() < base[..., :3].sum()
            assert sh[..., :3].max() <= base[..., :3].max() + 1e-4
