import jax.numpy as jnp
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import RaymarchSettings, Renderer, reference_sample_fn
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.decoded import DecodedRenderer
from instantvnr_tpu.render.slabmarch import SlabSettings, principal_axis
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="sphere")
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    return vol, tf, mc


class TestPrincipalAxis:
    def test_axes(self):
        c = Camera(eye=(0, 0, -100), center=(0, 0, 0), up=(0, 1, 0))
        assert principal_axis(c) == (2, False)
        c = Camera(eye=(0, 0, 100), center=(0, 0, 0), up=(0, 1, 0))
        assert principal_axis(c) == (2, True)
        c = Camera(eye=(100, 5, 5), center=(0, 0, 0), up=(0, 1, 0))
        assert principal_axis(c) == (0, True)
        c = Camera(eye=(1, -90, 3), center=(0, 0, 0), up=(0, 0, 1))
        assert principal_axis(c) == (1, False)


class TestSlabVsRaymarch:
    @pytest.mark.parametrize("eye", [(0, 0, -70), (0, 0, 70), (70, 8, 4),
                                     (-66, -10, 12), (5, 72, -9)])
    def test_matches_raymarcher(self, scene, eye):
        """Slab compositing ≈ ray marching on a smooth volume (different
        sampling patterns → tolerance, not equality)."""
        vol, tf, mc = scene
        cam = Camera(eye=eye, center=(0, 0, 0), up=(0, 1, 0), fovy=40)

        rm = Renderer(32, 32, mc, tf, reference_sample_fn, sample_ctx=vol.data,
                      settings=RaymarchSettings(n_iters=8, max_supersteps=64),
                      seed=5)
        rm.camera = cam
        img_rm = rm.mapframe() if False else None
        rm.render()
        img_rm = rm.mapframe()

        dr = DecodedRenderer(32, 32, mc, tf, vol.dims,
                             initial_volume=vol.data,
                             settings=SlabSettings())
        dr.set_camera(cam)
        dr.render()
        img_sl = dr.mapframe()

        assert np.isfinite(img_sl).all()
        # both hit the sphere: alpha masses comparable
        a_rm = img_rm[..., 3].mean()
        a_sl = img_sl[..., 3].mean()
        assert a_sl > 0.5 * a_rm, (a_rm, a_sl)
        assert abs(a_sl - a_rm) < 0.25 * max(a_rm, 1e-3), (a_rm, a_sl)
        # pixelwise: mean abs difference small (resampling differences remain)
        assert np.abs(img_sl - img_rm).mean() < 0.03

    def test_empty_volume_transparent(self, scene):
        _, tf, _ = scene
        empty = jnp.zeros((32, 32, 32), jnp.float32)
        mc = mcmod.build(empty, (32, 32, 32), tf)
        dr = DecodedRenderer(16, 16, mc, tf, (32, 32, 32),
                             initial_volume=empty)
        dr.render()
        img = dr.mapframe()
        assert np.abs(img).max() < 1e-5

    def test_eye_inside_falls_back_to_raymarch(self, scene):
        """Inside the volume the slab factorization is invalid; the decoded
        renderer transparently switches to the wavefront marcher."""
        vol, tf, mc = scene
        dr = DecodedRenderer(8, 8, mc, tf, vol.dims, initial_volume=vol.data)
        dr.set_camera(Camera(eye=(1, 2, 3), center=(14, 2, 3), up=(0, 1, 0)))
        dr.render()
        img = dr.mapframe()
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.5  # looking through the dense center


class TestProgressiveDecode:
    def test_blob_decoding_converges_to_full_decode(self):
        import jax

        from instantvnr_tpu.config import (
            EncodingConfig,
            ModelConfig,
            NetworkConfig,
        )
        from instantvnr_tpu.models import NeuralField, decode_volume
        from instantvnr_tpu.models.trainer import create_train_state

        cfg = ModelConfig(
            encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                    log2_hashmap_size=12, base_resolution=4),
            network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
        )
        field = NeuralField.from_config(cfg)
        state = create_train_state(jax.random.PRNGKey(0), field)
        dims = (16, 16, 32)
        tf = bake_transfer_function(TransferFunctionConfig())
        vol = synthetic_volume(dims, kind="sphere")
        mc = mcmod.build(vol.data, dims, tf)

        dr = DecodedRenderer(8, 8, mc, tf, dims, field=field,
                             params=state.params)
        assert dr.n_blobs == 2
        dr.decode_progressive(1)  # half decoded
        half = np.asarray(dr.decoded)
        assert np.abs(half[16:]).max() == 0.0  # second half untouched
        dr.decode_progressive(1)
        full_ref = np.asarray(decode_volume(field, state.params, dims))
        np.testing.assert_allclose(np.asarray(dr.decoded), full_ref,
                                   atol=1e-5)


class TestGradientShading:
    def test_shaded_render_differs_and_is_finite(self, scene):
        vol, tf, mc = scene
        from instantvnr_tpu.render.slabmarch import SlabSettings

        cam = Camera(eye=(10, 8, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
        flat = DecodedRenderer(24, 24, mc, tf, vol.dims,
                               initial_volume=vol.data)
        flat.set_camera(cam)
        img_flat = (flat.render(), flat.mapframe())[1]

        sh = DecodedRenderer(24, 24, mc, tf, vol.dims,
                             initial_volume=vol.data,
                             settings=SlabSettings(shading="gradient"))
        sh.set_camera(cam)
        sh.render()
        img_sh = sh.mapframe()
        assert np.isfinite(img_sh).all()
        # alpha identical (shading changes color only)
        np.testing.assert_allclose(img_sh[..., 3], img_flat[..., 3], atol=1e-3)
        # colors differ where the volume is hit
        hit = img_flat[..., 3] > 0.1
        assert np.abs(img_sh[..., :3][hit] - img_flat[..., :3][hit]).mean() > 0.01

    def test_gradient_volumes_of_linear_ramp(self):
        from instantvnr_tpu.render.slabmarch import compute_gradient_volumes

        z, y, x = np.meshgrid(*(np.arange(8, dtype=np.float32),) * 3,
                              indexing="ij")
        g = compute_gradient_volumes(jnp.asarray(2.0 * x + 3.0 * y + 5.0 * z))
        g = np.asarray(g)
        # interior central differences recover the slopes exactly
        assert np.allclose(g[0][2:-2, 2:-2, 2:-2], 2.0, atol=1e-5)
        assert np.allclose(g[1][2:-2, 2:-2, 2:-2], 3.0, atol=1e-5)
        assert np.allclose(g[2][2:-2, 2:-2, 2:-2], 5.0, atol=1e-5)


class TestBatchedCompositor:
    def test_matches_scan_compositor(self, scene):
        vol, tf, mc = scene
        cam = Camera(eye=(8, 5, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
        a = DecodedRenderer(24, 24, mc, tf, vol.dims, initial_volume=vol.data)
        a.set_camera(cam)
        a.render()
        b = DecodedRenderer(24, 24, mc, tf, vol.dims, initial_volume=vol.data,
                            settings=SlabSettings(batched_compositor=True))
        b.set_camera(cam)
        b.render()
        np.testing.assert_allclose(a.mapframe(), b.mapframe(), atol=2e-3)
        c = DecodedRenderer(24, 24, mc, tf, vol.dims, initial_volume=vol.data,
                            settings=SlabSettings(batched_compositor=True,
                                                  blend_mode="seq"))
        c.set_camera(cam)
        c.render()
        np.testing.assert_allclose(a.mapframe(), c.mapframe(), atol=2e-3)


class TestGradientLightParity:
    """The wavefront and slab gradient-shaded paths must honor the SAME
    settings.light_dir (view-flipped per renderer.cpp:98-100). Regression
    test for the round-1 bug where the wavefront path always shaded with
    the hardcoded default light."""

    L1 = (1.0, 0.0, 0.2)
    L2 = (0.0, 1.0, 0.2)

    @staticmethod
    def _wavefront(scene, light, cam):
        vol, tf, mc = scene
        r = Renderer(24, 24, mc, tf, reference_sample_fn,
                     sample_ctx=vol.data,
                     settings=RaymarchSettings(n_iters=8, max_supersteps=64,
                                               shading="gradient",
                                               light_dir=light))
        r.camera = cam
        r.render()
        return r.mapframe()

    @staticmethod
    def _slab(scene, light, cam):
        vol, tf, mc = scene
        d = DecodedRenderer(24, 24, mc, tf, vol.dims,
                            initial_volume=vol.data,
                            settings=SlabSettings(shading="gradient",
                                                  light_dir=light))
        d.set_camera(cam)
        d.render()
        return d.mapframe()

    def test_wavefront_respects_light_dir(self, scene):
        cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
        a = self._wavefront(scene, self.L1, cam)
        b = self._wavefront(scene, self.L2, cam)
        hit = a[..., 3] > 0.1
        assert np.abs(a[..., :3][hit] - b[..., :3][hit]).mean() > 5e-3

    def test_slab_and_wavefront_agree_per_light(self, scene):
        cam = Camera(eye=(0, 0, -70), center=(0, 0, 0), up=(0, 1, 0), fovy=40)
        for light in (self.L1, self.L2):
            wf = self._wavefront(scene, light, cam)
            sl = self._slab(scene, light, cam)
            assert np.isfinite(wf).all() and np.isfinite(sl).all()
            # same light → the two paths agree to resampling tolerance
            assert np.abs(wf - sl).mean() < 0.035, light
        # cross-light discrimination: each slab render is closer to the
        # same-light wavefront render than to the other light's
        wf1 = self._wavefront(scene, self.L1, cam)
        wf2 = self._wavefront(scene, self.L2, cam)
        sl1 = self._slab(scene, self.L1, cam)
        sl2 = self._slab(scene, self.L2, cam)
        assert np.abs(wf1 - sl1).mean() < np.abs(wf2 - sl1).mean()
        assert np.abs(wf2 - sl2).mean() < np.abs(wf1 - sl2).mean()


class TestEyeInside:
    """Split-at-eye: fly-through cameras inside the volume stay on the slab
    fast path (round-1 fell back to the wavefront marcher; NOTES_ROUND1
    'other round-2 items')."""

    def _scene(self):
        from instantvnr_tpu.accel import macrocell as mcmod
        from instantvnr_tpu.config import TransferFunctionConfig
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.utils.tfn import bake_transfer_function

        vol = synthetic_volume((32, 32, 32), kind="sphere")
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        return vol, tf, mc

    def test_inside_camera_uses_slab_path_and_matches_wavefront(self):
        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.decoded import DecodedRenderer

        vol, tf, mc = self._scene()
        # eye INSIDE the volume (center is origin; dims 32 → half-extent 16)
        cam = Camera(eye=(1.0, 0.5, -10.0), center=(0, 0, 30), up=(0, 1, 0),
                     fovy=45)
        r = DecodedRenderer(48, 48, mc, tf, vol.dims,
                            initial_volume=vol.data)
        r.set_camera(cam)
        fast = np.asarray(r.render()).reshape(48, 48, 4)
        slow = np.asarray(r._render_fallback(cam)).reshape(48, 48, 4)
        assert np.isfinite(fast).all()
        assert fast[..., 3].max() > 0.1  # content visible
        # same scene content, resampling-level agreement
        diff = np.abs(fast - slow).mean()
        assert diff < 0.04, diff

    def test_backward_frustum_still_falls_back(self):
        from instantvnr_tpu.render.slabmarch import slab_path_valid
        from instantvnr_tpu.render.camera import Camera

        # inside, frustum nearly perpendicular to the probed axis → some
        # corner rays have non-positive axis component → invalid
        cam = Camera(eye=(0.0, 0.0, 0.0), center=(10, 0, 1), up=(0, 1, 0),
                     fovy=60)
        assert not slab_path_valid(cam, (32, 32, 32), axis=2, flipped=False)
        # the same camera along its dominant axis is valid
        assert slab_path_valid(cam, (32, 32, 32), axis=0, flipped=False)
        # ordinary forward camera inside is valid along its axis
        cam2 = Camera(eye=(0.0, 0.0, 0.0), center=(0, 0, 10), up=(0, 1, 0),
                      fovy=45)
        assert slab_path_valid(cam2, (32, 32, 32), axis=2, flipped=False)


def test_flipped_occupancy_alignment_non_multiple_dims():
    """Flipped slab occupancy must mirror the unflipped one exactly even
    when the slab count is not a multiple of MACROCELL_SIZE (regression:
    layer[::-1] assumed a full last cell and misaligned 12 of 100 slabs)."""
    import numpy as np

    from instantvnr_tpu.accel import macrocell as mcmod
    from instantvnr_tpu.config import TransferFunctionConfig
    from instantvnr_tpu.render.slabmarch import slab_occupancy_from_macrocell
    from instantvnr_tpu.utils.tfn import bake_transfer_function

    rng = np.random.default_rng(0)
    d = 40  # 3 cells of 16, last covers 8 slabs
    vol = np.zeros((d, 24, 24), np.float32)
    # occupy a few scattered z-ranges so cells differ
    vol[3:6] = rng.uniform(0.5, 1.0, (3, 24, 24)).astype(np.float32)
    vol[33:38] = rng.uniform(0.5, 1.0, (5, 24, 24)).astype(np.float32)
    import jax.numpy as jnp

    # flat-zero alpha head so all-zero cells classify as truly empty
    tf = bake_transfer_function(TransferFunctionConfig(
        alphas=((0.0, 0.0), (0.4, 0.0), (1.0, 1.0))))
    mc = mcmod.build(jnp.asarray(vol), (24, 24, d), tf)
    fwd = np.asarray(slab_occupancy_from_macrocell(mc, 2, False, d))
    rev = np.asarray(slab_occupancy_from_macrocell(mc, 2, True, d))
    np.testing.assert_array_equal(rev, fwd[::-1])
    assert fwd.any() and not fwd.all()  # scene exercises both states
