"""API facade surface tests (the reference C API mapping, api.py)."""
import numpy as np
import pytest

from instantvnr_tpu.api import (
    NeuralVolume,
    RenderMode,
    SimpleVolume,
    VNRenderer,
    memory_query,
)
from instantvnr_tpu.config import (
    EncodingConfig,
    ModelConfig,
    NetworkConfig,
)


@pytest.fixture(scope="module")
def small_model():
    return ModelConfig(
        encoding=EncodingConfig(n_levels=4, n_features_per_level=4,
                                log2_hashmap_size=12, base_resolution=4),
        network=NetworkConfig(n_neurons=32, n_hidden_layers=2),
    )


@pytest.fixture(scope="module")
def trained(small_model):
    simple = SimpleVolume.synthetic(dims=(32, 32, 32), kind="sphere")
    nv = NeuralVolume(small_model, simple=simple, train_batch=4096)
    nv.train(120)
    return simple, nv


class TestNeuralVolumeApi:
    def test_train_and_metrics(self, trained):
        simple, nv = trained
        stats = nv.statistics()
        assert stats.step == 120
        assert np.isfinite(stats.loss)
        assert nv.get_psnr() > 20
        assert 0.5 < nv.get_mssim() <= 1.0
        assert np.isfinite(nv.get_testing_loss())

    def test_blob_api(self, trained):
        _, nv = trained
        assert nv.n_blobs == 2
        nv.decode_progressive(1)

    def test_checkpoint_roundtrip(self, trained, tmp_path):
        simple, nv = trained
        p = tmp_path / "m.bson"
        nv.save_params(str(p))
        nv2 = NeuralVolume.from_checkpoint(str(p))
        assert nv2.step == nv.step
        assert nv2.dims == nv.dims

    @pytest.mark.parametrize("mode", list(RenderMode))
    def test_render_modes(self, trained, mode):
        """Every mode of the condensed matrix (api.h:36-60) renders finite
        pixels through the facade."""
        simple, nv = trained
        subject = (nv if "NEURAL" in mode.name or mode.requires_decoding
                   else simple)
        r = VNRenderer(subject, width=12, height=12, mode=mode)
        r.render()
        img = r.mapframe()
        assert img.shape == (12, 12, 4)
        assert np.isfinite(img).all()

    def test_memory_query(self):
        stats = memory_query()
        assert len(stats) >= 1


class TestVolumeDumps:
    def test_save_inference_and_reference(self, trained, tmp_path):
        import numpy as np

        simple, nv = trained
        pi = tmp_path / "inf.raw"
        pr = tmp_path / "ref.raw"
        nv.save_inference_volume(str(pi))
        nv.save_reference_volume(str(pr))
        inf = np.fromfile(pi, np.float32).reshape(32, 32, 32)
        ref = np.fromfile(pr, np.float32).reshape(32, 32, 32)
        # decode-and-diff (SURVEY §4.2): trained net approximates GT
        assert np.abs(inf - ref).mean() < 0.05

    def test_save_inference_as_vdb_roundtrips(self, trained, tmp_path):
        """A .vdb path exports an OpenVDB FloatGrid of the decoded volume
        that reads back bit-exact through data/vdb.py."""
        import numpy as np

        from instantvnr_tpu.data.vdb import read_vdb

        simple, nv = trained
        p = tmp_path / "inf.vdb"
        nv.save_inference_volume(str(p))
        dense, info = read_vdb(str(p))
        np.testing.assert_array_equal(dense,
                                      np.asarray(nv.decode_volume()))


class TestParamGradients:
    def test_rendered_image_grads_flow_to_network(self, trained):
        """North-star check: pixel gradients w.r.t. hash table and MLP
        params exist and are finite through the differentiable renderer."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from instantvnr_tpu.render.camera import Camera
        from instantvnr_tpu.render.raymarch import RaymarchSettings, raymarch
        from instantvnr_tpu.render import camera_rays, make_neural_sample_fn
        from instantvnr_tpu.utils.math import ray_box_intersect
        from functools import partial

        simple, nv = trained
        sample_fn = make_neural_sample_fn(nv.field)
        cam = Camera.default_for_dims(simple.dims)
        org_w, dirn = camera_rays(cam, 8, 8)
        dims = jnp.array(simple.dims, jnp.float32)
        org = org_w + 0.5 * dims
        t0, t1, hit = ray_box_intersect(org, dirn, jnp.zeros(3), dims)
        t0 = jnp.where(hit, jnp.maximum(t0, 0.0), 1.0)
        t1 = jnp.where(hit, t1, 0.0)
        jit = jnp.full((64,), 0.5)
        settings = RaymarchSettings(n_iters=4, max_supersteps=16,
                                    fixed_steps=True)

        def loss(params):
            rgba = raymarch(partial(sample_fn, params), org, dirn, t0, t1,
                            simple.macrocell, simple.tf, jit, settings)
            return jnp.sum(rgba**2)

        g = jax.grad(loss)(nv.state.params)
        gt = np.asarray(jnp.abs(g["table"]).sum())
        gm = sum(float(jnp.abs(w).sum()) for w in g["mlp"])
        assert np.isfinite(gt) and gt > 0
        assert np.isfinite(gm) and gm > 0


class TestMacrocellPsnr:
    def test_online_macrocell_converges_to_gt(self, trained):
        simple, nv = trained
        p = nv.get_macrocell_psnr()
        # after 120 steps of online updates the sampled ranges approximate
        # the offline sweep (ranges differ by the sampling density only)
        assert p > 10, p


class TestTimeSeries:
    """vnrSimpleVolumeSetCurrentTimeStep / GetNumberOfTimeSteps
    (api.h:118-119; SimpleVolume::set_current_timestep, sampler.cu:20-26)."""

    def test_in_memory_series_switches_data_and_macrocell(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer
        from instantvnr_tpu.data import synthetic_volume

        vols = [synthetic_volume((16, 16, 16), kind="sphere"),
                synthetic_volume((16, 16, 16), kind="vorts")]
        sv = SimpleVolume(vols)
        assert sv.num_timesteps == 2
        assert sv.current_timestep == 0

        r = VNRenderer(sv, width=12, height=12,
                       mode=RenderMode.REFERENCE_RAYMARCH)
        f0 = np.asarray(r.render())

        r.set_current_timestep(1)
        assert sv.current_timestep == 1
        # macrocell rebuilt from the new data (reference recomputes it)
        assert not np.allclose(np.asarray(sv.macrocell.value_hi),
                               np.asarray(r.simple.macrocell.value_lo))
        f1 = np.asarray(r.render())
        assert np.isfinite(f1).all()
        assert not np.allclose(f0, f1)  # different data renders differently

        with pytest.raises(IndexError):
            sv.set_current_timestep(2)

    def test_scene_file_series(self, tmp_path):
        import json

        from instantvnr_tpu.api import SimpleVolume

        for t in range(2):
            (np.full((4, 5, 6), 10.0 * t + 1.0, np.float32)
             .tofile(tmp_path / f"t{t}.raw"))
        scene = {"volume": {"filename": ["t0.raw", "t1.raw"],
                            "dims": {"x": 6, "y": 5, "z": 4},
                            "type": "FLOAT"}}
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(scene))
        sv = SimpleVolume(str(p))
        assert sv.num_timesteps == 2
        v0 = np.asarray(sv.volume.data)
        sv.set_current_timestep(1)
        v1 = np.asarray(sv.volume.data)
        assert v0.shape == v1.shape == (4, 5, 6)
        # constant volumes normalize to zeros in both cases; ranges differ
        assert sv.volume.original_range == (11.0, 11.0)


class TestRendererKnobs:
    """vnrRendererSetVolumeSamplingRate / SetVolumeDensityScale /
    SetDenoiser (batch_renderer.cpp:201-203) on the VNRenderer facade."""

    def test_knobs_affect_reference_render(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer

        sv = SimpleVolume.synthetic(dims=(16, 16, 16), kind="sphere")
        r = VNRenderer(sv, width=12, height=12,
                       mode=RenderMode.REFERENCE_RAYMARCH)
        base = np.asarray(r.render())
        r.set_volume_density_scale(4.0)
        dense = np.asarray(r.render())
        assert np.isfinite(dense).all()
        # higher density -> higher accumulated opacity somewhere
        assert dense[..., 3].sum() > base[..., 3].sum()
        r.set_volume_sampling_rate(0.25)
        sparse = np.asarray(r.render())
        assert np.isfinite(sparse).all()
        assert not np.allclose(sparse, dense)

    def test_denoiser_hook(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer

        sv = SimpleVolume.synthetic(dims=(16, 16, 16), kind="sphere")
        r = VNRenderer(sv, width=12, height=12,
                       mode=RenderMode.PATHTRACE_REFERENCE)
        r.render()
        raw = r.mapframe()
        r.set_denoiser(True)
        den = r.mapframe()
        assert den.shape == raw.shape and np.isfinite(den).all()
        assert not np.allclose(den, raw)  # filter did something


class TestFacadeCompleteness:
    """The remaining vnr* facade functions (api.h:91-188)."""

    def test_value_range_and_require_decoding(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume

        sv = SimpleVolume.synthetic(dims=(8, 8, 8), kind="sphere")
        lo, hi = sv.value_range
        assert lo <= hi
        assert RenderMode.DECODED_SLAB.requires_decoding
        assert RenderMode.PATHTRACE_DECODED.requires_decoding
        assert not RenderMode.NEURAL_WAVEFRONT.requires_decoding
        assert not RenderMode.REFERENCE_RAYMARCH.requires_decoding

    def test_framebuffer_resize(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer

        sv = SimpleVolume.synthetic(dims=(8, 8, 8), kind="sphere")
        r = VNRenderer(sv, width=8, height=8,
                       mode=RenderMode.REFERENCE_RAYMARCH)
        assert r.mapframe().shape == (8, 8, 4)
        r.set_framebuffer_size(12, 10)
        r.render()
        assert r.mapframe().shape == (10, 12, 4)

    def test_renderer_level_tf(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer
        from instantvnr_tpu.config import TransferFunctionConfig

        sv = SimpleVolume.synthetic(dims=(12, 12, 12), kind="sphere")
        r = VNRenderer(sv, width=8, height=8,
                       mode=RenderMode.REFERENCE_RAYMARCH)
        f0 = np.asarray(r.render())
        red = TransferFunctionConfig(
            colors=((0.0, 1.0, 0.0, 0.0), (1.0, 1.0, 0.0, 0.0)))
        r.set_transfer_function(red)
        f1 = np.asarray(r.render())
        assert not np.allclose(f0, f1)
        # red TF → green/blue ≈ 0 wherever opacity accumulated
        hit = f1[..., 3] > 0.05
        assert hit.any()
        assert np.abs(f1[..., 1][hit]).max() < 0.15

    def test_reset_accumulation(self):
        from instantvnr_tpu.api import RenderMode, SimpleVolume, VNRenderer

        sv = SimpleVolume.synthetic(dims=(12, 12, 12), kind="sphere")
        r = VNRenderer(sv, width=8, height=8,
                       mode=RenderMode.PATHTRACE_REFERENCE)
        for _ in range(3):
            r.render()
        assert r._impl.frame_index == 3
        r.reset_accumulation()
        assert r._impl.frame_index == 0
        r.render()
        assert np.isfinite(np.asarray(r.mapframe())).all()


def test_decoded_shading_and_shadows(trained):
    """Facade-level shadows + gradient shading on the decoded path."""
    from instantvnr_tpu.api import RenderMode, VNRenderer

    _simple, nv = trained
    r = VNRenderer(nv, width=16, height=16, mode=RenderMode.DECODED_SLAB)
    base = np.asarray(r.render())
    r.set_slab_shading("gradient")
    shaded = np.asarray(r.render())
    assert np.isfinite(shaded).all()
    assert not np.allclose(base, shaded)
    r.set_slab_shading("none")
    r.enable_shadows()
    shadowed = np.asarray(r.render())
    assert np.isfinite(shadowed).all()
    assert not np.allclose(base, shadowed)


def test_renderer_level_tf_reaches_cached_decoder(trained):
    """TF edits through VNRenderer.set_transfer_function must reach the
    CACHED slab pipeline (get_decoder previously dropped the new tf)."""
    from instantvnr_tpu.api import RenderMode, VNRenderer
    from instantvnr_tpu.config import TransferFunctionConfig

    _simple, nv = trained
    r = VNRenderer(nv, width=12, height=12, mode=RenderMode.DECODED_SLAB)
    f0 = np.asarray(r.render())
    red = TransferFunctionConfig(
        colors=((0.0, 1.0, 0.0, 0.0), (1.0, 1.0, 0.0, 0.0)))
    r.set_transfer_function(red)
    f1 = np.asarray(r.render())
    assert not np.allclose(f0, f1)
    hit = f1[..., 3] > 0.05
    assert hit.any()
    assert np.abs(f1[..., 1][hit]).max() < 0.15  # green gone under red TF


class TestApiSymbolParity:
    """The api.h symbols beyond the core lifecycle (api.h:91-188) — camera
    and TF handle accessors, json doc helpers, set_model/set_params,
    training-stat getters."""

    def test_camera_handle(self, tmp_path):
        from instantvnr_tpu.render.camera import Camera

        cam = Camera.default_for_dims((32, 32, 32))
        cam2 = cam.set(eye=(1, 2, 3), center=(0, 0, 0), up=(0, 1, 0))
        assert cam2.position == (1.0, 2.0, 3.0)
        assert cam2.focus == (0.0, 0.0, 0.0)
        assert cam2.up_vec == (0.0, 1.0, 0.0)
        assert cam2.fovy == cam.fovy  # unchanged fields carry over
        scene = tmp_path / "scene.json"
        scene.write_text("""{
          "version": "1.0",
          "dataSource": [{"fileName": "missing.raw", "dimensions":
            {"x": 4, "y": 4, "z": 4}, "type": "FLOAT32", "endian": "LITTLE",
            "fileUpperLeft": false, "offset": 0}],
          "view": {"camera": {"eye": {"x": 5, "y": 6, "z": 7},
            "center": {"x": 0, "y": 0, "z": 0}, "up": {"x": 0, "y": 1, "z": 0},
            "fovy": 30}}
        }""")
        c3 = Camera.from_scene(str(scene))
        assert c3.position == (5.0, 6.0, 7.0) and c3.fovy == 30

    def test_tf_object_handle(self, trained):
        from instantvnr_tpu.api import TransferFunctionObject

        simple, nv = trained
        tf = TransferFunctionObject()
        tf.set_color([(0.0, 1.0, 0.0, 0.0), (1.0, 1.0, 0.0, 0.0)])
        tf.set_alpha([(0.0, 0.0), (1.0, 0.9)])
        tf.set_value_range(0.0, 1.0)
        assert tf.get_color()[0] == (0.0, 1.0, 0.0, 0.0)
        assert tf.get_alpha()[-1] == (1.0, 0.9)
        assert tf.get_value_range() == (0.0, 1.0)
        r = VNRenderer(nv, width=12, height=12, mode=RenderMode.DECODED_SLAB)
        f0 = np.asarray(r.render())
        r.set_transfer_function(tf)  # the handle, not the config
        f1 = np.asarray(r.render())
        assert np.isfinite(f1).all() and not np.allclose(f0, f1)

    def test_json_doc_helpers(self, tmp_path):
        from instantvnr_tpu.api import load_json, save_json

        doc = {"a": 1, "nested": {"b": [1.5, 2.5], "s": "x"}}
        tpath, bpath = str(tmp_path / "d.json"), str(tmp_path / "d.bson")
        save_json(doc, tpath)
        save_json(doc, bpath)  # extension infers binary
        assert load_json(tpath) == doc
        got = load_json(bpath)
        assert got["a"] == 1 and got["nested"]["s"] == "x"
        # relaxed text: // comments (the reference model files carry them)
        cpath = tmp_path / "c.json"
        cpath.write_text('{\n  // comment\n  "k": 2\n}')
        assert load_json(str(cpath))["k"] == 2

    def test_training_stat_getters(self, trained):
        _, nv = trained
        assert nv.get_training_step() == nv.statistics().step
        assert nv.get_training_loss() == pytest.approx(nv.statistics().loss)

    def test_set_params_existing_volume(self, trained, tmp_path):
        """vnrNeuralVolumeSetParams: load a checkpoint into an EXISTING
        neural volume (path and doc forms) without recreating it."""
        from instantvnr_tpu.api import load_json

        simple, nv = trained
        p = str(tmp_path / "m.bson")
        nv.save_params(p)
        fresh = NeuralVolume(nv.cfg, simple=simple, train_batch=4096)
        psnr_untrained = fresh.get_psnr()
        fresh.set_params(p)
        assert fresh.get_training_step() == nv.get_training_step()
        assert fresh.get_psnr() > max(psnr_untrained, 20)
        # doc form (the reference accepts a vnrJson)
        fresh2 = NeuralVolume(nv.cfg, simple=simple, train_batch=4096)
        fresh2.set_params(load_json(p))
        assert fresh2.get_psnr() > 20

    def test_set_model_resets(self, trained, small_model):
        import dataclasses

        simple, nv = trained
        keep_step = nv.get_training_step()
        other = dataclasses.replace(
            small_model,
            network=dataclasses.replace(small_model.network, n_neurons=16))
        nv2 = NeuralVolume(small_model, simple=simple, train_batch=4096)
        nv2.train(10)
        nv2.set_model(other)
        assert nv2.get_training_step() == 0
        assert nv2.cfg.network.n_neurons == 16
        nv2.train(5)
        assert nv2.get_training_step() == 5
        assert keep_step == nv.get_training_step()  # original untouched


class TestCheckpointRobustness:
    """Review fixes: macrocell-less checkpoints must render (not cull
    everything through an allocate()-empty macrocell), and set_params must
    handle dims like the reference loader (network.cu:886-893)."""

    def test_npz_checkpoint_renders_without_gt(self, trained, tmp_path):
        _, nv = trained
        p = str(tmp_path / "m.npz")
        nv.save_params(p)
        nv2 = NeuralVolume.from_checkpoint(p)  # no ground truth attached
        assert float(np.asarray(nv2.macrocell.max_opacity).max()) > 0
        r = VNRenderer(nv2, width=16, height=16,
                       mode=RenderMode.DECODED_SLAB)
        r.render()
        img = r.mapframe()
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0  # not culled to black

    def test_set_params_dim_mismatch(self, trained, small_model, tmp_path):
        _, nv = trained
        p = str(tmp_path / "m.bson")
        nv.save_params(p)  # 32^3 checkpoint
        other = SimpleVolume.synthetic(dims=(16, 16, 16), kind="sphere")
        nv2 = NeuralVolume(small_model, simple=other, train_batch=512)
        with pytest.raises(ValueError, match="dims"):
            nv2.set_params(p)  # GT bound: refuse, like the reference
        nv3 = NeuralVolume(small_model, dims=(16, 16, 16), train_batch=512)
        nv3.set_params(p)  # no GT: adopt the checkpoint's dims
        assert nv3.dims == (32, 32, 32)
        assert float(np.asarray(nv3.macrocell.max_opacity).max()) > 0

    def test_resize_preserves_slab_knobs(self, trained):
        _, nv = trained
        r = VNRenderer(nv, width=16, height=16,
                       mode=RenderMode.DECODED_SLAB)
        r.set_slab_shading("gradient")
        r.enable_shadows()
        r.set_framebuffer_size(24, 24)
        assert r._impl.settings.shading == "gradient"
        assert r._impl.shadow_volume is not None
        r.render()
        assert np.isfinite(r.mapframe()).all()


class TestFvsrnFacade:
    """The second model family through the vnr* facade
    (vnrCreateNeuralVolume/vnrNeuralVolumeSetModel with an fV-SRN config —
    the reference builds FvsrnNetwork behind the same calls)."""

    def _cfg(self):
        from instantvnr_tpu.models.fvsrn import FvsrnConfig

        return FvsrnConfig(
            latent_res=(8, 8, 8), latent_features=4, fourier_bands=4,
            network=NetworkConfig(n_neurons=16, n_hidden_layers=2,
                                  activation="SnakeAlt"))

    def test_train_render_checkpoint(self, tmp_path):
        simple = SimpleVolume.synthetic(dims=(16, 16, 16), kind="sphere")
        nv = NeuralVolume(self._cfg(), simple=simple, train_batch=512)
        nv.train(20)
        assert np.isfinite(nv.get_training_loss())
        with pytest.raises(ValueError, match="fV-SRN"):
            nv.save_params(str(tmp_path / "x.bson"))  # parity: no BSON
        p = str(tmp_path / "x.npz")
        nv.save_params(p)
        nv2 = NeuralVolume.from_checkpoint(p)
        assert nv2.dims == (16, 16, 16)
        r = VNRenderer(nv2, width=12, height=12,
                       mode=RenderMode.DECODED_SLAB)
        r.render()
        assert np.isfinite(r.mapframe()).all()

    def test_latent_res_validation(self):
        from instantvnr_tpu.models.fvsrn import FvsrnConfig

        with pytest.raises(ValueError, match="latent_res"):
            FvsrnConfig(latent_res=(8, 8, 1))
