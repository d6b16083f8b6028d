"""High-level API facade — the counterpart of the reference C API
(`api.h:91-188`, `api.cpp`). Opaque-handle C style becomes plain Python
objects; the surface (create volume / create neural volume from config or
checkpoint / train / decode / metrics / renderer lifecycle) maps 1:1:

  vnrCreateSimpleVolume          → SimpleVolume(scene | Volume)
  vnrCreateNeuralVolume(cfg,vol) → NeuralVolume(model_cfg, simple=...)
  vnrCreateNeuralVolume(params)  → NeuralVolume.from_checkpoint(path)
  vnrNeuralVolumeTrain           → NeuralVolume.train(steps, fast=...)
  vnrNeuralVolumeDecodeProgressive → NeuralVolume.decode_progressive()
  vnrNeuralVolumeGet{PSNR,MSSIM,TestingLoss} → get_psnr()/get_mssim()/get_testing_loss()
  vnrNeuralVolumeSerializeParams → NeuralVolume.save_params(path)
  vnrNeuralVolumeGetNumberOfBlobs → NeuralVolume.n_blobs
  vnrCreateRenderer/vnrRender/vnrRendererMapFrame → VNRenderer.render()/mapframe()
  vnrMemoryQuery                 → memory_query()

Full api.h symbol table (api.h:91-188 → here):
  vnrCreateJsonText/Binary, vnrLoadJsonText/Binary → load_json()
  vnrSaveJsonText/Binary         → save_json(doc, path, binary=...)
  vnrCreateCamera                → Camera(...) / Camera.from_scene(path)
  vnrCameraSet                   → Camera.set(eye, center, up) (new handle)
  vnrCameraGet{Position,Focus,UpVec} → Camera.{position,focus,up_vec}
  vnrCreateTransferFunction      → TransferFunctionObject(cfg?)
  vnrTransferFunctionSet{Color,Alpha,ValueRange} → .set_color/.set_alpha/.set_value_range
  vnrTransferFunctionGet{Color,Alpha,ValueRange} → .get_color/.get_alpha/.get_value_range
  vnrVolumeGetValueRange         → SimpleVolume.value_range
  vnrVolumeSetClippingBox/SetScaling → {Simple,Neural}Volume.set_clipping_box/set_scaling
  vnrSimpleVolumeSetCurrentTimeStep/GetNumberOfTimeSteps
                                 → SimpleVolume.set_current_timestep/.num_timesteps
  vnrNeuralVolumeSetModel        → NeuralVolume.set_model(cfg | path | dict)
  vnrNeuralVolumeSetParams       → NeuralVolume.set_params(path | doc)
  vnrNeuralVolumeGetTrainingLoss/GetTrainingStep
                                 → NeuralVolume.get_training_loss()/get_training_step()
  vnrNeuralVolumeDecode{Inference,Reference} → save_inference_volume/save_reference_volume
  vnrRendererSet{Mode,Camera,TransferFunction,FramebufferSize,Denoiser,
    VolumeSamplingRate,VolumeDensityScale} → VNRenderer.set_* methods
  vnrRendererResetAccumulation   → VNRenderer.reset_accumulation()
  vnrRequireDecoding             → RenderMode.requires_decoding
  vnrRelease                     → Python GC (+ free_temporary_memory())
  vnrMemoryQueryPrint            → memory_query() (caller prints)
"""
from __future__ import annotations

import enum
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import (
    DEFAULT_TRAIN_BATCH,
    ModelConfig,
    SceneConfig,
    TransferFunctionConfig,
    load_model_config,
)
from instantvnr_tpu.data.volume import Volume, load_volume, synthetic_volume
from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.models.trainer import (
    TrainState,
    create_train_state,
    test_loss,
    train_steps,
)
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.utils.tfn import TransferFunction, bake_transfer_function


class RenderMode(enum.IntEnum):
    """Condensed mode matrix (reference api.h:36-60 has 16 modes: the
    {OptiX-reference, decoding, sample-streaming, in-shader} execution
    strategies × shading; on TPU the strategies collapse to decoded-grid
    (slab, fast) vs network-sampling (wavefront, exact), see render/)."""

    DECODED_SLAB = 0  # reference modes 1/4/7 (DECODING) — interactive path
    NEURAL_WAVEFRONT = 1  # modes 5/8/11 (SAMPLE_STREAMING)
    REFERENCE_RAYMARCH = 2  # modes 0-3 (OptiX ground truth) on the GT grid
    NEURAL_WAVEFRONT_GRADIENT = 3  # gradient-shaded sample streaming
    REFERENCE_GRADIENT = 4
    PATHTRACE_DECODED = 5  # delta-tracking path tracer on the decoded grid
    PATHTRACE_REFERENCE = 6
    NEURAL_WAVEFRONT_SSH = 7  # single-shade heuristic (deferred shadow ray)
    REFERENCE_SSH = 8
    PATHTRACE_NEURAL = 9  # network inference inside the tracking loop
    # (reference mode SAMPLE_STREAMING path tracing,
    # method_pathtracing.cu:679-813)
    ISOSURFACE_DECODED = 10  # first-hit isosurface of the decoded network
    ISOSURFACE_REFERENCE = 11  # first-hit isosurface of the GT grid
    # (interactive half of the reference's vnr_int_isosurface app,
    # apps/int_isosurface.cu — implicit slab-sweep instead of MC+OptiX mesh,
    # render/isosurf.py; mesh extraction/OBJ export stays in ops/isosurface)
    FULL_SHADOW_DECODED = 12  # reference mode 2 (VNR_OPTIX_FULL_SHADOW,
    # api.h:39) on the decoded grid: per-sample directional-light shadow
    # modulation via the precomputed shadow volume on the slab path
    FULL_SHADOW_REFERENCE = 13  # same on the GT grid: shadow-volume-
    # modulated wavefront (method_optix.cu:208-215 semantics)

    @property
    def requires_decoding(self) -> bool:
        """vnrRequireDecoding (api.h:62-88): does the mode render from the
        decoded grid (and therefore need decode/infer before frames)?"""
        return self in (RenderMode.DECODED_SLAB, RenderMode.PATHTRACE_DECODED,
                        RenderMode.ISOSURFACE_DECODED,
                        RenderMode.FULL_SHADOW_DECODED)


class TransferFunctionObject:
    """Mutable transfer-function handle (vnrCreateTransferFunction /
    vnrTransferFunctionSet{Color,Alpha,ValueRange} and the Get* trio,
    api.h:127-137). Wraps the immutable TransferFunctionConfig; pass the
    handle straight to SimpleVolume/VNRenderer.set_transfer_function."""

    def __init__(self, cfg: TransferFunctionConfig | None = None):
        self.cfg = cfg or TransferFunctionConfig()

    def set_color(self, points):
        """points: iterable of (position, r, g, b), positions in [0,1]."""
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg, colors=tuple(tuple(float(v) for v in p) for p in points))

    def set_alpha(self, points):
        """points: iterable of (position, alpha)."""
        import dataclasses

        self.cfg = dataclasses.replace(
            self.cfg, alphas=tuple(tuple(float(v) for v in p) for p in points))

    def set_value_range(self, lo: float, hi: float):
        import dataclasses

        self.cfg = dataclasses.replace(self.cfg, range=(float(lo), float(hi)))

    def get_color(self):
        return self.cfg.colors

    def get_alpha(self):
        return self.cfg.alphas

    def get_value_range(self):
        return self.cfg.range


def _tf_config(tfn_cfg):
    """Accept a TransferFunctionConfig or a TransferFunctionObject handle."""
    if isinstance(tfn_cfg, TransferFunctionObject):
        return tfn_cfg.cfg
    return tfn_cfg


def load_json(path: str):
    """vnrCreateJsonText/Binary + vnrLoadJsonText/Binary (api.cpp:17-61):
    one loader for both encodings — sniffs BSON (leading int32 doc length)
    vs relaxed JSON text (// comments allowed)."""
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) >= 5 and int.from_bytes(raw[:4], "little") == len(raw) \
            and raw[-1] == 0:
        from instantvnr_tpu.utils import bson

        return bson.decode(raw)
    from instantvnr_tpu.config import loads_relaxed_json

    return loads_relaxed_json(raw.decode("utf-8"))


def save_json(doc: dict, path: str, binary: bool | None = None):
    """vnrSaveJsonText (api.cpp:34-39, indent-4 dump) / vnrSaveJsonBinary
    (api.cpp:41-48, nlohmann to_bson). binary=None infers from extension."""
    if binary is None:
        binary = path.endswith((".bson", ".bin", ".params"))
    if binary:
        from instantvnr_tpu.utils import bson

        with open(path, "wb") as f:
            f.write(bson.encode(doc))
    else:
        import json

        with open(path, "w") as f:
            json.dump(doc, f, indent=4)


class SimpleVolume:
    """Ground-truth volume + macrocell (reference SimpleVolumeContext,
    api_internal.h:17-24; SimpleVolume, core/sampler.h:66-94)."""

    def __init__(self, source: Volume | SceneConfig | str, tfn_cfg=None):
        if isinstance(source, str):
            from instantvnr_tpu.config import load_scene_config

            source = load_scene_config(source)
        self._timestep_volumes = None  # in-memory time series (tests/synthetic)
        self._timestep = 0
        if isinstance(source, SceneConfig):
            self.scene = source
            self.volume = load_volume(source.volume)
            tfn_cfg = tfn_cfg or source.tfn
            self.camera_cfg = source.camera
        elif isinstance(source, (list, tuple)):
            # in-memory time series: a list of Volume objects sharing dims
            assert len({v.dims for v in source}) == 1, "timestep dims differ"
            self.scene = None
            self._timestep_volumes = list(source)
            self.volume = self._timestep_volumes[0]
            self.camera_cfg = None
        else:
            self.scene = None
            self.volume = source
            self.camera_cfg = None
        self.tfn_cfg = tfn_cfg or TransferFunctionConfig()
        self.tf: TransferFunction = bake_transfer_function(self.tfn_cfg)
        self.macrocell = mcmod.build(self.volume.data, self.volume.dims, self.tf)
        from instantvnr_tpu.render.transform import default_transform

        self.transform = default_transform(self.dims)

    @classmethod
    def synthetic(cls, dims=(64, 64, 64), kind="vorts", **kw):
        return cls(synthetic_volume(dims, kind=kind), **kw)

    @property
    def dims(self):
        return self.volume.dims

    @property
    def value_range(self):
        """vnrVolumeGetValueRange (api.h): (min, max) in data units."""
        return self.volume.original_range

    def set_transfer_function(self, tfn_cfg):
        tfn_cfg = _tf_config(tfn_cfg)
        self.tfn_cfg = tfn_cfg
        self.tf = bake_transfer_function(tfn_cfg)
        self.macrocell = mcmod.update_max_opacity(self.macrocell, self.tf)

    # -- time series (vnrSimpleVolumeSetCurrentTimeStep /
    #    vnrSimpleVolumeGetNumberOfTimeSteps, api.h:118-119) ---------------

    @property
    def num_timesteps(self) -> int:
        if self._timestep_volumes is not None:
            return len(self._timestep_volumes)
        if self.scene is not None:
            return self.scene.volume.n_timesteps
        return 1

    @property
    def current_timestep(self) -> int:
        return self._timestep

    def set_current_timestep(self, index: int):
        """Switch the active timestep and recompute the macrocell from the
        new data (SimpleVolume::set_current_timestep, sampler.cu:20-26)."""
        n = self.num_timesteps
        if not 0 <= index < n:
            raise IndexError(f"timestep {index} out of range [0,{n})")
        if index == self._timestep:
            return
        if self._timestep_volumes is not None:
            self.volume = self._timestep_volumes[index]
        else:
            self.volume = load_volume(self.scene.volume.at_timestep(index))
        self._timestep = index
        self.macrocell = mcmod.build(self.volume.data, self.volume.dims,
                                     self.tf)

    def set_clipping_box(self, lower, upper):
        """vnrVolumeSetClippingBox (api.cpp:322-338): bounds in voxel
        coordinates [0, dims], like the reference's user-facing convention."""
        import jax.numpy as jnp

        self.transform = self.transform._replace(
            clip_lower=jnp.asarray(lower, jnp.float32),
            clip_upper=jnp.asarray(upper, jnp.float32))

    def set_scaling(self, scale):
        """vnrVolumeSetScaling (api.cpp:340-351): composes scale(s) with the
        existing data transform."""
        import jax.numpy as jnp

        self.transform = self.transform._replace(
            scale=jnp.asarray(scale, jnp.float32) * self.transform.scale)


@dataclass
class TrainingStatistics:
    """NeuralVolume::statistics (network.cu:762-767)."""

    step: int
    loss: float


def _field_from_config(model_config):
    """Model-family dispatch for the facade (reference set_network builds
    either TcnnNetwork or FvsrnNetwork, network.cu:551-603): an FvsrnConfig
    builds the fV-SRN field; everything else (path, dict, ModelConfig)
    resolves to the tcnn-schema NeuralField."""
    from instantvnr_tpu.models.fvsrn import FvsrnConfig, FvsrnField

    if isinstance(model_config, FvsrnConfig):
        return model_config, FvsrnField.from_config(model_config)
    if not isinstance(model_config, ModelConfig):
        model_config = load_model_config(model_config)
    return model_config, NeuralField.from_config(model_config)


class NeuralVolume:
    """The neural representation + trainer (reference NeuralVolumeContext /
    NeuralVolume, core/network.h:29-107)."""

    def __init__(self, model_config, simple: SimpleVolume | None = None,
                 dims=None, seed: int = 0, train_batch=DEFAULT_TRAIN_BATCH):
        self.cfg, self.field = _field_from_config(model_config)
        self.simple = simple
        self.dims = tuple(simple.dims) if simple is not None else tuple(dims)
        self.train_batch = train_batch
        self.state: TrainState = create_train_state(
            jax.random.PRNGKey(seed), self.field
        )
        self.step = 0
        # the inference macrocell, updated online from training batches
        # (reference m_macrocell; fresh unless aliasing the GT one)
        self._mc_needs_rebuild = False
        self.macrocell = mcmod.allocate(self.dims)
        self._decoder = None
        self._full_decode_params = None  # params identity at last decode_all
        self._decode_cache = None  # (params, grid) of last decode_volume
        from instantvnr_tpu.render.transform import default_transform

        self.transform = default_transform(self.dims)

    def set_clipping_box(self, lower, upper):
        """vnrVolumeSetClippingBox on the neural volume (api.cpp:322-338)."""
        self.transform = self.transform._replace(
            clip_lower=jnp.asarray(lower, jnp.float32),
            clip_upper=jnp.asarray(upper, jnp.float32))
        if self._decoder is not None:
            self._decoder.set_transform(self.transform)

    def set_scaling(self, scale):
        """vnrVolumeSetScaling on the neural volume (api.cpp:340-351)."""
        self.transform = self.transform._replace(
            scale=jnp.asarray(scale, jnp.float32) * self.transform.scale)
        if self._decoder is not None:
            self._decoder.set_transform(self.transform)

    # -- training -----------------------------------------------------------

    def train(self, steps: int, fast_mode: bool = False,
              chunk: int = 10) -> TrainingStatistics:
        """Run `steps` training steps (vnrNeuralVolumeTrain, api.cpp:222 →
        Impl::train, network.cu:231-259). fast_mode skips the online
        macrocell update (the reference's `fast` flag skips statistics and
        macrocell refresh)."""
        assert self.simple is not None, "training requires a reference volume"
        vol = self.simple.volume.data
        done = 0
        while done < steps:
            n = min(chunk, steps - done)
            self.state = train_steps(self.field, vol, self.state, n,
                                     self.train_batch)
            done += n
        self.step += steps
        if not fast_mode:
            self._update_macrocell_online()
        return self.statistics()

    def _update_macrocell_online(self):
        """Online macrocell refresh from a fresh sample batch + TF opacity
        (reference updates from the training batch, network.cu:770-779).
        Uses one extra sampled batch so training batches stay fused."""
        assert self.simple is not None  # train() guarantees this
        key = jax.random.fold_in(self.state.key, 0x6d63)
        from instantvnr_tpu.ops.trilinear import sample_volume_tex

        coords = jax.random.uniform(key, (self.train_batch, 3), jnp.float32)
        values = sample_volume_tex(self.simple.volume.data, coords)
        self.macrocell = mcmod.update_explicit(self.macrocell, coords, values)
        self.macrocell = mcmod.update_max_opacity(
            self.macrocell, self.simple.tf
        )

    def statistics(self) -> TrainingStatistics:
        return TrainingStatistics(step=self.step, loss=float(self.state.loss))

    def get_training_loss(self) -> float:
        """vnrNeuralVolumeGetTrainingLoss (api.cpp:300-305)."""
        return float(self.state.loss)

    def get_training_step(self) -> int:
        """vnrNeuralVolumeGetTrainingStep (api.cpp:307-312)."""
        return self.step

    def set_model(self, model_config):
        """vnrNeuralVolumeSetModel (api.cpp:258-267): swap the network
        architecture (path, dict, ModelConfig, or FvsrnConfig) and reset
        training state."""
        self.cfg, self.field = _field_from_config(model_config)
        self.state = create_train_state(jax.random.PRNGKey(0), self.field)
        self.step = 0
        self._decoder = None

    def set_params(self, params):
        """vnrNeuralVolumeSetParams (api.cpp:269-278): load parameters into
        THIS volume from a checkpoint path or an already-decoded doc. The
        optimizer restarts fresh, like the reference's deserialize_params
        (Adam moments are not in the interchange format)."""
        from instantvnr_tpu.models.optimizer import adam_init
        from instantvnr_tpu.serializer import load_checkpoint, load_checkpoint_doc

        if isinstance(params, str):
            field, p, mc, dims, meta = load_checkpoint(params)
        else:
            field, p, mc, dims, meta = load_checkpoint_doc(params)
        if dims is not None and tuple(dims) != tuple(self.dims):
            if self.simple is not None:
                # reference validates checkpoint dims against the volume
                # and refuses a mismatch (network.cu:886-893)
                raise ValueError(
                    f"checkpoint volume dims {tuple(dims)} != this volume's "
                    f"{tuple(self.dims)}")
            # no ground truth bound: adopt the checkpoint's dims (the
            # from_checkpoint semantics) so macrocell/decoder/transform
            # geometry stays consistent
            from instantvnr_tpu.render.transform import default_transform

            self.dims = tuple(dims)
            self.macrocell = mcmod.allocate(self.dims)
            self.transform = default_transform(self.dims)
            self._decoder = None
            self._decode_cache = None
            self._full_decode_params = None
        if field.cfg.encoding != self.cfg.encoding or \
                field.cfg.network != self.cfg.network:
            # the checkpoint carries its own model section — honor it
            self.cfg = field.cfg
            self.field = field
            self._decoder = None
        self.state = self.state._replace(params=p, opt=adam_init(p))
        self.step = int(meta.get("step", 0))
        if mc is not None:
            tf = self.simple.tf if self.simple is not None else \
                bake_transfer_function(TransferFunctionConfig())
            self.macrocell = mcmod.update_max_opacity(mc, tf)
        elif self.simple is None:
            self._mc_needs_rebuild = True  # lazy (see macrocell property)

    # -- inference / decoding ----------------------------------------------

    def get_decoder(self, width=None, height=None, tf=None, settings=None):
        """The progressive decode + slab render pipeline bound to this
        network (lazily created; reuse across frames). width/height default
        to the cached decoder's size (512 on first creation) so that
        size-agnostic calls like decode_progressive() never force a
        rebuild out from under a renderer holding the cached pipeline."""
        from instantvnr_tpu.render.decoded import DecodedRenderer

        if width is None:
            width = self._decoder.width if self._decoder is not None else 512
        if height is None:
            height = self._decoder.height if self._decoder is not None else 512
        if self._decoder is not None and (
            self._decoder.width != width or self._decoder.height != height
        ):
            # size change: rebuild, but carry over ALL pipeline state —
            # decode progress, settings (shading etc.), and sticky shadows —
            # a framebuffer resize must not silently reset knobs
            old = self._decoder
            self._decoder = None
            decoded, next_blob = old.decoded, old._next_blob
            if settings is None:
                settings = old.settings
            shadow_light = old._shadow_light
            mode_shadows = getattr(old, "_mode_shadows", False)
        else:
            old = decoded = next_blob = shadow_light = None
            mode_shadows = False
        if self._decoder is None:
            mc = self.simple.macrocell if self.simple is not None else self.macrocell
            tf = tf or (old.tf if old is not None else None) or \
                (self.simple.tf if self.simple else
                 bake_transfer_function(TransferFunctionConfig()))
            self._decoder = DecodedRenderer(
                width, height, mc, tf, self.dims, settings=settings,
                field=self.field, params=self.state.params,
                initial_volume=decoded, transform=self.transform,
            )
            if next_blob is not None:
                self._decoder._next_blob = next_blob
            if shadow_light is not None:
                light, rate = shadow_light
                self._decoder.enable_shadows(light, sampling_rate=rate)
                # carry shadow OWNERSHIP too: FULL_SHADOW_DECODED-enabled
                # shadows must still be disabled by a later DECODED_SLAB
                # set_mode after a resize rebuild
                self._decoder._mode_shadows = mode_shadows
        else:
            self._decoder.set_params(self.state.params)
            if self._decoder.transform is not self.transform:
                # rebinding an identical transform would pay the host
                # readback of transform.scale (tunnel round trip) per knob
                self._decoder.set_transform(self.transform)
            if tf is not None and tf is not self._decoder.tf:
                # TF edits must reach the cached pipeline (shadow refresh
                # included — decoded.set_transfer_function handles it);
                # identity-unchanged TFs skip the max-opacity + shadow pass
                self._decoder.set_transfer_function(tf)
        return self._decoder

    def ensure_decoded(self, width=None, height=None, tf=None):
        """get_decoder + full decode ONLY when params changed since the
        last full decode — knob-only renderer rebinds (sampling rate, TF,
        density, frame size) skip the multi-second re-decode."""
        dec = self.get_decoder(width, height, tf=tf)
        if self._full_decode_params is not self.state.params:
            dec.decode_all()
            self._full_decode_params = self.state.params
        return dec

    def decode_progressive(self, n_blobs: int = 1):
        """vnrNeuralVolumeDecodeProgressive (api.cpp:228); get_decoder
        already rebinds the current params (identity-cached)."""
        self.get_decoder().decode_progressive(n_blobs)

    @property
    def n_blobs(self) -> int:
        return self.get_decoder().n_blobs

    @property
    def macrocell(self):
        """A checkpoint without a macrocell section (the loaders tolerate
        one; native .npz never has one) would otherwise leave the
        allocate()-empty macrocell, whose all-zero max opacity makes every
        render path cull EVERYTHING — black frames from a well-trained
        network. LAZILY rebuild it from a full decode on first use (the
        reference re-derives max opacity at load, network.cu:918; with no
        stored ranges the decoded grid is the only source). Lazy so that
        non-rendering consumers — headless --resume training, slab-wise
        network isosurface extraction — never pay the full-grid decode."""
        if self._mc_needs_rebuild:
            self._mc_needs_rebuild = False
            tf = bake_transfer_function(TransferFunctionConfig())
            self._macrocell = mcmod.build(self.decode_volume(), self.dims, tf)
        return self._macrocell

    @macrocell.setter
    def macrocell(self, mc):
        self._macrocell = mc
        self._mc_needs_rebuild = False

    def decode_volume(self) -> jnp.ndarray:
        from instantvnr_tpu.models.metrics import decode_volume

        # identity-cached on params: renderer knob changes rebuild their
        # impl through set_mode, which must not re-decode an unchanged
        # network (0.4 s at 128³, seconds at larger dims)
        if (self._decode_cache is not None
                and self._decode_cache[0] is self.state.params):
            return self._decode_cache[1]
        grid = decode_volume(self.field, self.state.params, self.dims)
        self._decode_cache = (self.state.params, grid)
        return grid

    def save_inference_volume(self, path: str):
        """Decode the network over the full grid and dump it
        (vnrNeuralVolumeSerializeVolume → save_inference_volume,
        network.cu:328-408 / api.cpp:234-244). Raw float32 by default;
        a `.vdb` path writes an OpenVDB FloatGrid instead (data/vdb.py —
        round-trips through `vnr_cmd_train --volume`), closing the VDB
        source class in both directions."""
        if path.endswith(".vdb"):
            import numpy as np

            from instantvnr_tpu.data.vdb import write_vdb

            write_vdb(path, np.asarray(self.decode_volume()),
                      compression="zip")
            return
        from instantvnr_tpu.data.volume import save_raw

        save_raw(self.decode_volume(), path)

    def save_reference_volume(self, path: str):
        """Dump the normalized ground-truth volume raw float32
        (save_reference_volume)."""
        from instantvnr_tpu.data.volume import save_raw

        assert self.simple is not None
        save_raw(self.simple.volume.data, path)

    # -- metrics (the de-facto integration tests, SURVEY.md §4) -------------

    def get_psnr(self) -> float:
        from instantvnr_tpu.models.metrics import psnr_arrays

        # decode_volume is identity-cached on params: the usual
        # PSNR-then-SSIM report pays ONE full decode, not two
        return float(psnr_arrays(self.decode_volume(),
                                 self.simple.volume.data))

    def get_mssim(self) -> float:
        from instantvnr_tpu.models.metrics import ssim_arrays

        return float(ssim_arrays(self.decode_volume(),
                                 self.simple.volume.data))

    def get_testing_loss(self) -> float:
        return float(test_loss(self.field, self.simple.volume.data,
                               self.state, self.train_batch))

    def get_macrocell_psnr(self) -> float:
        """PSNR of the ONLINE-built macrocell value ranges vs the ground
        truth macrocell (reference macrocell min/max PSNR,
        network.cu:628-698) — a convergence oracle for the online update."""
        assert self.simple is not None
        gt = self.simple.macrocell
        got = self.macrocell
        touched = np.asarray(got.value_hi >= got.value_lo)
        if not touched.any():
            return 0.0
        err = np.concatenate([
            (np.asarray(got.value_lo) - np.asarray(gt.value_lo))[touched],
            (np.asarray(got.value_hi) - np.asarray(gt.value_hi))[touched],
        ])
        mse = float((err**2).mean())
        return float(10.0 * np.log10(1.0 / max(mse, 1e-20)))

    # -- serialization ------------------------------------------------------

    def save_params(self, path: str):
        """vnrNeuralVolumeSerializeParams. `.npz` paths write the NATIVE
        exact-resume checkpoint (full TrainState incl. Adam moments);
        anything else writes the reference BSON interchange format."""
        if path.endswith(".npz"):
            from instantvnr_tpu.serializer import save_native

            save_native(path, self.field, self.state, volume_dims=self.dims)
            return
        if not hasattr(self.field, "spec"):
            raise ValueError(
                "fV-SRN fields have no BSON interchange layout (the "
                "reference's FvsrnNetwork cannot serialize either, "
                "fvsrn_network.h:10-56); save to a native .npz instead")
        from instantvnr_tpu.serializer import save_checkpoint

        mc = self.simple.macrocell if self.simple is not None else self.macrocell
        save_checkpoint(path, self.field, self.state.params, mc, self.dims,
                        groundtruth_mc=self.simple is not None,
                        step=self.step, loss=float(self.state.loss))

    @classmethod
    def from_checkpoint(cls, path: str, simple: SimpleVolume | None = None):
        """vnrCreateNeuralVolume(params) (api.cpp:206-220): a loaded model
        renders without any ground truth. `.npz` native checkpoints restore
        the full training state (exact resume)."""
        from instantvnr_tpu.serializer import load_checkpoint
        from instantvnr_tpu.models.optimizer import adam_init

        if path.endswith(".npz"):
            from instantvnr_tpu.serializer import load_native

            field, state, dims = load_native(path)
            nv = cls(field.cfg, simple=simple, dims=dims)
            nv.state = state
            nv.step = int(state.opt.step)
            if simple is None:
                # native checkpoints carry no macrocell section
                nv._mc_needs_rebuild = True
            return nv
        field, params, mc, dims, meta = load_checkpoint(path)
        nv = cls(field.cfg, simple=simple, dims=dims)
        nv.state = nv.state._replace(params=params, opt=adam_init(params))
        nv.step = int(meta.get("step", 0))
        if mc is not None:
            tf = simple.tf if simple is not None else bake_transfer_function(
                TransferFunctionConfig())
            nv.macrocell = mcmod.update_max_opacity(mc, tf)
        elif simple is None:
            nv._mc_needs_rebuild = True  # lazy (see macrocell property)
        return nv


class VNRenderer:
    """Renderer handle (reference RendererContext, api_internal.h:37-45).

    Dispatches between the slab (decoded) and wavefront (network/GT) paths
    by RenderMode; owns camera + frame size like MainRenderer."""

    def __init__(self, volume, width=512, height=512,
                 mode: RenderMode = RenderMode.DECODED_SLAB,
                 streaming_cache: str = "auto"):
        self.width, self.height = width, height
        self.mode = mode
        self._impl = None
        self._camera = None
        # vnrRendererSetVolumeSamplingRate / SetVolumeDensityScale /
        # SetDenoiser (api.h renderer knobs; batch_renderer.cpp:201-203)
        self.sampling_rate = 1.0
        self.density_scale = 1.0
        self.denoise = False
        self.isovalue = 0.5  # for the ISOSURFACE_* modes
        # sample-streaming cache policy for the NEURAL_WAVEFRONT* modes:
        # "auto"/"brick" = macrocell-guided decoded-brick pool (fast,
        # decoded-path quality); "hq" = the pool decoded at a 2× nested
        # lattice (trilinear error falls ~h² — much closer to the exact
        # network at ~7.4× pool memory, same per-sample gather count);
        # "lazy" = 1× pool, bricks decoded on first visibility
        # (render/brickcache.LazyBrickCache — faster first frame on big
        # volumes); "none" = exact per-sample network evaluation
        # (reference mode-5 literal semantics). A constructor argument
        # (not only set_streaming_cache) so "lazy" skips the eager build
        # entirely — setting it after __init__ would pay the full decode
        # first, defeating the policy's point.
        assert streaming_cache in ("auto", "brick", "hq", "lazy", "none"), \
            streaming_cache
        self.streaming_cache = streaming_cache
        self._lazy = None  # LazyBrickCache when streaming_cache == "lazy"
        self._tf_override = None  # renderer-level TF (vnrRendererSetTransferFunction)
        if isinstance(volume, NeuralVolume):
            self.neural = volume
            self.simple = volume.simple
        else:
            self.neural = None
            self.simple = volume
        if self.simple is not None and self.simple.camera_cfg is not None:
            self._camera = Camera.from_config(self.simple.camera_cfg)
        self.set_mode(mode)

    def set_mode(self, mode: RenderMode):
        from instantvnr_tpu.render import (
            RaymarchSettings,
            Renderer,
            make_neural_sample_fn,
            reference_sample_fn,
        )
        from instantvnr_tpu.render.decoded import DecodedRenderer
        from instantvnr_tpu.render.pathtrace import PathTraceRenderer

        self.mode = mode
        self._lazy = None  # re-established by _build_streaming_ctx("lazy")
        mc, tf, dims = self._scene_parts()
        xf = (self.neural or self.simple).transform

        import dataclasses as _dc

        if mode == RenderMode.DECODED_SLAB:
            assert self.neural is not None
            impl = self.neural.ensure_decoded(self.width, self.height, tf=tf)
            impl.settings = _dc.replace(
                impl.settings, sampling_rate=self.sampling_rate,
                density_scale=self.density_scale)
            if getattr(impl, "_mode_shadows", False):
                # shadows that FULL_SHADOW_DECODED enabled do not leak into
                # the plain decoded mode (explicit enable_shadows() does);
                # ownership lives on the SHARED cached decoder, not this
                # renderer — other VNRenderers reuse the same impl
                impl.disable_shadows()
                impl.settings = _dc.replace(impl.settings,
                                            shadow_ambient=0.35)
                impl._mode_shadows = False
        elif mode in (RenderMode.NEURAL_WAVEFRONT,
                      RenderMode.NEURAL_WAVEFRONT_GRADIENT,
                      RenderMode.NEURAL_WAVEFRONT_SSH):
            assert self.neural is not None
            shading = {RenderMode.NEURAL_WAVEFRONT: "none",
                       RenderMode.NEURAL_WAVEFRONT_GRADIENT: "gradient",
                       RenderMode.NEURAL_WAVEFRONT_SSH: "ssh"}[mode]
            ctx = (self._build_streaming_ctx(mc)
                   if self.streaming_cache in ("auto", "brick", "hq",
                                               "lazy")
                   else None)
            if ctx is not None:
                # macrocell-guided brick cache (render/brickcache.py): the
                # sample-streaming default — ONE fused pool gather/sample
                # instead of L·8 hash rows, decoded-path quality (round-3
                # measured: 0.82 → 7.1 fps @512² with the K=8/skips=1
                # emit shape + schedule replay).
                # streaming_cache="none" restores exact per-sample network
                # evaluation (the reference's literal mode-5 semantics).
                from instantvnr_tpu.render.brickcache import brick_sample_fn

                # big frames tile into 3 row bands with a 16k tail
                # finisher (bit-identical pure scheduling; 768² measured
                # 2.85 → 5.4 fps with the f16 pool + tiles, then 6.14 →
                # 6.39 fps moving the finisher 64k → 16k once fused
                # whole-frame execution made dispatch free — while 512²
                # prefers the untiled defaults; NOTES_ROUND4 sweeps)
                big = self.width * self.height >= 480_000
                impl = Renderer(
                    self.width, self.height, mc, tf, brick_sample_fn,
                    sample_ctx=ctx,
                    settings=RaymarchSettings(
                        shading=shading, compact=True, n_iters=8,
                        max_skips=1, tiles=3 if big else 1,
                        finish_bucket=16384 if big else None,
                        sampling_rate=self.sampling_rate,
                        density_scale=self.density_scale),
                    transform=xf,
                )
            else:
                from instantvnr_tpu.models.network import render_params
                impl = Renderer(
                    self.width, self.height, mc, tf,
                    make_neural_sample_fn(self.neural.field),
                    sample_ctx=render_params(self.neural.state.params,
                                             self.neural.field),
                    # host-orchestrated ray compaction; n_iters=8 per the
                    # r5 exact sweep under the midpoint ladder (n4 1.083 /
                    # n8 1.197 / n8-fused 1.222 fps @512²,
                    # scratch/exact_sweep_r5.py)
                    settings=RaymarchSettings(
                        shading=shading, compact=True, n_iters=8,
                        sampling_rate=self.sampling_rate,
                        density_scale=self.density_scale),
                    transform=xf,
                )
        elif mode in (RenderMode.REFERENCE_RAYMARCH,
                      RenderMode.REFERENCE_GRADIENT,
                      RenderMode.REFERENCE_SSH):
            assert self.simple is not None
            shading = {RenderMode.REFERENCE_RAYMARCH: "none",
                       RenderMode.REFERENCE_GRADIENT: "gradient",
                       RenderMode.REFERENCE_SSH: "ssh"}[mode]
            impl = Renderer(
                self.width, self.height, mc, tf, reference_sample_fn,
                sample_ctx=self.simple.volume.data,
                # compacted + schedule-replayed like the streaming modes
                # (identical per-ray march, scheduling only)
                settings=RaymarchSettings(shading=shading, compact=True,
                                          sampling_rate=self.sampling_rate,
                                          density_scale=self.density_scale),
                transform=xf,
            )
        elif mode == RenderMode.PATHTRACE_REFERENCE:
            assert self.simple is not None
            impl = PathTraceRenderer(self.width, self.height, mc, tf,
                                     self.simple.volume.data, transform=xf,
                                     settings=self._pt_settings())
        elif mode == RenderMode.PATHTRACE_DECODED:
            assert self.neural is not None
            impl = PathTraceRenderer(self.width, self.height, mc, tf,
                                     self.neural.decode_volume(),
                                     transform=xf,
                                     settings=self._pt_settings())
        elif mode in (RenderMode.ISOSURFACE_DECODED,
                      RenderMode.ISOSURFACE_REFERENCE):
            from instantvnr_tpu.render.isosurf import IsoRenderer, IsoSettings

            if mode == RenderMode.ISOSURFACE_DECODED:
                assert self.neural is not None
                grid = self.neural.decode_volume()
            else:
                assert self.simple is not None
                grid = self.simple.volume.data
            impl = IsoRenderer(self.width, self.height, grid, tf,
                               isovalue=self.isovalue,
                               settings=IsoSettings(
                                   sampling_rate=max(self.sampling_rate, 2.0)),
                               transform=xf)
        elif mode == RenderMode.FULL_SHADOW_DECODED:
            # reference mode 2 on the decoded grid: the slab path's
            # shadow-volume modulation IS the per-sample transmittance
            # (render/shadow.py); ambient floor = 1 − shadingScale to match
            # lerp(shadingScale, c, c·shadow) (method_optix.cu:215)
            assert self.neural is not None
            impl = self.neural.ensure_decoded(self.width, self.height, tf=tf)
            impl.settings = _dc.replace(
                impl.settings, sampling_rate=self.sampling_rate,
                density_scale=self.density_scale, shadow_ambient=0.05)
            self._shadow_light_used = self._flipped_light()
            impl.enable_shadows(self._shadow_light_used,
                                sampling_rate=self.sampling_rate)
            impl._mode_shadows = True
        elif mode == RenderMode.FULL_SHADOW_REFERENCE:
            # reference mode 2 on the GT grid: shadow-volume-modulated
            # wavefront (RaymarchSettings.shading == "shadow")
            assert self.simple is not None
            from instantvnr_tpu.render.shadow import shadow_volume_for

            impl = Renderer(
                self.width, self.height, mc, tf, reference_sample_fn,
                sample_ctx=self.simple.volume.data,
                settings=RaymarchSettings(shading="shadow", compact=True,
                                          sampling_rate=self.sampling_rate,
                                          density_scale=self.density_scale),
                transform=xf,
            )
            self._shadow_light_used = self._flipped_light()
            impl.set_shadow_volume(shadow_volume_for(
                self.simple.volume.data, tf, self._shadow_light_used,
                sampling_rate=self.sampling_rate))
        elif mode == RenderMode.PATHTRACE_NEURAL:
            # network inference inside the tracking loop — the reference's
            # neural path tracing (method_pathtracing.cu:679-813)
            assert self.neural is not None
            from instantvnr_tpu.models.network import render_params
            impl = PathTraceRenderer(
                self.width, self.height, mc, tf,
                render_params(self.neural.state.params, self.neural.field),
                sample_fn=make_neural_sample_fn(self.neural.field),
                transform=xf, settings=self._pt_settings(),
            )
        else:
            raise ValueError(mode)
        if self._camera is not None:
            impl.set_camera(self._camera)
        self._impl = impl

    def _scene_parts(self):
        if self.simple is not None:
            tf = self._tf_override or self.simple.tf
            return self.simple.macrocell, tf, self.simple.dims
        nv = self.neural
        tf = self._tf_override or bake_transfer_function(
            TransferFunctionConfig())
        return nv.macrocell, tf, nv.dims

    def set_camera(self, cam: Camera):
        self._camera = cam
        self._impl.set_camera(cam)
        # FULL_SHADOW: the light flips against the view (renderer.cpp:98-100)
        # and the precomputed shadow volume must follow the flip
        if self.mode == RenderMode.FULL_SHADOW_DECODED:
            light = self._flipped_light()
            # same light-change guard as the REFERENCE branch: most camera
            # moves don't flip the light, and the sheared-cumprod sweep
            # over the full decoded grid is per-interaction device work
            if light != getattr(self, "_shadow_light_used", None):
                self._shadow_light_used = light
                self._impl.enable_shadows(light,
                                          sampling_rate=self.sampling_rate)
        elif self.mode == RenderMode.FULL_SHADOW_REFERENCE:
            light = self._flipped_light()
            if light != getattr(self, "_shadow_light_used", None):
                from instantvnr_tpu.render.shadow import shadow_volume_for

                _, tf, _ = self._scene_parts()
                self._shadow_light_used = light
                self._impl.set_shadow_volume(shadow_volume_for(
                    self.simple.volume.data, tf, light,
                    sampling_rate=self.sampling_rate))

    def _flipped_light(self) -> tuple:
        """The frame light: the default directional light flipped against
        the current view direction (renderer.cpp:98-100)."""
        from instantvnr_tpu.render.raymarch import RaymarchSettings as _RS

        light = np.asarray(_RS().light_dir, np.float32)
        cam = self.camera
        if cam is not None:
            view = np.asarray(cam.center, np.float32) - np.asarray(
                cam.eye, np.float32)
            if float(np.dot(view, light)) > 0:
                light = -light
        return tuple(float(v) for v in light)

    def set_clipping_box(self, lower, upper):
        """vnrVolumeSetClippingBox + renderer refresh (api.cpp:322-338,
        :455). Voxel coordinates in [0, dims]."""
        (self.neural or self.simple).set_clipping_box(lower, upper)
        self._impl.set_transform((self.neural or self.simple).transform)

    def set_scaling(self, scale):
        """vnrVolumeSetScaling + renderer refresh (api.cpp:340-351)."""
        (self.neural or self.simple).set_scaling(scale)
        self._impl.set_transform((self.neural or self.simple).transform)

    def set_current_timestep(self, index: int):
        """vnrSimpleVolumeSetCurrentTimeStep + renderer rebind (api.h:118):
        swaps the active timestep's data and macrocell into the render path
        (compiled programs are reused — only array bindings change)."""
        assert self.simple is not None, "time series requires a SimpleVolume"
        self.simple.set_current_timestep(index)
        self.set_mode(self.mode)

    def _pt_settings(self):
        from instantvnr_tpu.render.pathtrace import PathTraceSettings

        # compacted driver: paths die exponentially (RR after 4 scatters),
        # so bucketed compaction + schedule replay is ~18× the in-jit
        # masked loop at 512² (round 3; bench pathtrace_fps_512)
        return PathTraceSettings(density_scale=self.density_scale,
                                 compact=True)

    def set_volume_sampling_rate(self, rate: float):
        """vnrRendererSetVolumeSamplingRate (batch_renderer.cpp:203)."""
        self.sampling_rate = float(rate)
        self.set_mode(self.mode)

    def set_volume_density_scale(self, scale: float):
        """vnrRendererSetVolumeDensityScale (batch_renderer.cpp:202)."""
        self.density_scale = float(scale)
        self.set_mode(self.mode)

    def set_isovalue(self, isovalue: float):
        """Isovalue for the ISOSURFACE_* modes (the reference app's
        interactive iso slider, int_isosurface.cu). Traced scalar — edits
        never retrace the render program."""
        self.isovalue = float(isovalue)
        if hasattr(self._impl, "set_isovalue"):
            self._impl.set_isovalue(self.isovalue)

    def set_streaming_cache(self, policy: str):
        """Sample-streaming cache policy for NEURAL_WAVEFRONT* modes:
        "auto"/"brick" (macrocell-guided decoded-brick pool, fast),
        "hq" (2×-supersampled pool — near-exact quality, ~7.4× memory),
        "lazy" (same pool, bricks decoded on first visibility) or
        "none" (exact per-sample network evaluation)."""
        assert policy in ("auto", "brick", "hq", "lazy", "none"), policy
        self.streaming_cache = policy
        if self.mode in (RenderMode.NEURAL_WAVEFRONT,
                         RenderMode.NEURAL_WAVEFRONT_GRADIENT,
                         RenderMode.NEURAL_WAVEFRONT_SSH):
            self.set_mode(self.mode)

    def set_denoiser(self, enabled: bool):
        """vnrRendererSetDenoiser (batch_renderer.cpp:201): applies the
        a-trous filter at mapframe time (renderer.cpp:117-121 hook)."""
        self.denoise = bool(enabled)

    def set_framebuffer_size(self, width: int, height: int):
        """vnrRendererSetFramebufferSize (batch_renderer.cpp:199)."""
        self.width, self.height = int(width), int(height)
        self.set_mode(self.mode)

    def set_transfer_function(self, tfn_cfg):
        """vnrRendererSetTransferFunction (batch_renderer.cpp:197):
        renderer-level TF; updates the volume's macrocell opacity when a
        ground-truth volume is attached (SimpleVolume::set_transfer_function
        semantics), then rebinds the render path."""
        tfn_cfg = _tf_config(tfn_cfg)
        if self.simple is not None:
            self.simple.set_transfer_function(tfn_cfg)
            self._tf_override = None
        else:
            self._tf_override = bake_transfer_function(tfn_cfg)
        self.set_mode(self.mode)

    def enable_shadows(self, light_dir=None):
        """Shadow-volume rendering on the decoded path (the reference's
        MethodShadowMap / generate_shadow_map capability): computes a
        transmittance volume from the current decoded grid and keeps it
        fresh across decodes and TF edits (render/shadow.py)."""
        assert self.mode == RenderMode.DECODED_SLAB, "shadows: decoded path"
        self._impl.enable_shadows(light_dir)
        self._impl._mode_shadows = False  # user-owned from here on

    def disable_shadows(self):
        """Turn the decoded-path shadow volume off (mirror of
        enable_shadows — callers must not reach into the impl)."""
        assert self.mode == RenderMode.DECODED_SLAB, "shadows: decoded path"
        self._impl.disable_shadows()

    def set_slab_shading(self, shading: str):
        """Gradient shading on the decoded-slab path ("none"|"gradient");
        wavefront/reference modes carry shading in the RenderMode instead
        (the reference's mode x shading matrix, api.h:36-60)."""
        import dataclasses as _dc

        assert self.mode == RenderMode.DECODED_SLAB
        self._impl.settings = _dc.replace(self._impl.settings,
                                          shading=shading)

    def _build_streaming_ctx(self, mc):
        """Memory-gated brick cache for the sample-streaming modes.

        The pool costs occupied_cells·20³·8·itemsize; at a high-occupancy
        512³ volume that is ~8.6 GB in f32 — more than half a v5e's HBM.
        "auto" therefore degrades: f32 pool while it fits VNR_BRICK_MAX_MB
        (default 4096), f16 at double that (the TF classifies densities in
        [0,1]; f16's 11-bit mantissa is visually lossless there), and None
        past it (caller falls back to exact per-sample network
        evaluation). streaming_cache="brick" forces the f32 build.

        "lazy" allocates the pool but defers each brick's decode to its
        first visibility (render/brickcache.LazyBrickCache): render()
        ensures the camera frustum's bricks per frame (frustum ∪
        light-swept for SSH, whose shadow rays leave the frustum only
        along the light). Same memory gates — lazy saves decode TIME, not
        pool memory.

        Lattice: "auto"/"lazy"/"hq" decode on the EXACT convention
        (pool(p) → net(p), the reference's literal mode-5 field — +6 dB
        vs the exact render at identical cost, NOTES_ROUND4); only
        "brick" keeps the decoded half-texel lattice, as the bit-exact
        DECODED_*-parity escape hatch."""
        import os

        from instantvnr_tpu.render.brickcache import (brick_cache_bytes,
                                                      build_brick_cache)

        self._lazy = None
        args = (self.neural.field, self.neural.state.params, mc)
        if self.streaming_cache == "brick":
            # explicit "brick" keeps the f32 pool — the bit-exact
            # decoded-grid-parity escape hatch
            return build_brick_cache(*args)
        budget = float(os.environ.get("VNR_BRICK_MAX_MB", "4096")) * 2**20
        if self.streaming_cache == "hq":
            # EXACT-convention lattice (brickcache.ctx_convention):
            # pool(p) → net(p), i.e. it approximates the reference's
            # literal mode-5 field rather than the decoded modes'
            # half-texel-warped one. Measured @512² matched-jitter vs the
            # exact render (bench scene): decoded 44.5 dB → exact-1×
            # 50.7 (same memory/fps) → exact-2× 51.8 dB. 2×-supersampled
            # when it fits the memory gate, else the exact-convention 1×
            # pool (supersample degrade visible via
            # streaming_cache_info["supersample"]); one gather/sample
            # either way.
            ss = (2 if brick_cache_bytes(mc, dtype=jnp.float16,
                                         supersample=2) <= budget else 1)
            if brick_cache_bytes(mc, dtype=jnp.float16,
                                 supersample=ss) <= budget:
                return build_brick_cache(*args, dtype=jnp.float16,
                                         supersample=ss,
                                         convention="exact")
        nbytes = brick_cache_bytes(mc)  # f32
        # f16 pool by default: densities are [0,1] and the f16 pool frame
        # measured 105.8 dB vs f32 at bench scale (indistinguishable),
        # while halving the gathered bytes — 6.7 → 8.7 fps @512²,
        # 3.0 → 4.8 @768²·tiles=4 (NOTES_ROUND4 sweep2)
        dtype = jnp.float16 if nbytes / 2 <= budget else None
        if dtype is None:
            return None
        if self.streaming_cache == "lazy":
            from instantvnr_tpu.render.brickcache import LazyBrickCache

            self._lazy = LazyBrickCache(*args, dtype=dtype,
                                        convention="exact")
            return self._lazy.ctx
        return build_brick_cache(*args, dtype=dtype, convention="exact")

    @property
    def streaming_cache_info(self) -> dict:
        """Active sample-streaming cache policy + quality class — makes the
        NEURAL_WAVEFRONT* default (brick pool: decoded-lattice trilinear,
        44.5 dB vs exact at bench scale, matched-jitter) VISIBLE instead
        of silent. The
        reference's mode 5 evaluates the real network per sample; policy
        "none" restores that exactly. Surfaced in the viewer's /api/state
        and README."""
        info = {"policy": self.streaming_cache, "resolved": "n/a",
                "quality": "n/a"}
        if self.mode in (RenderMode.NEURAL_WAVEFRONT,
                         RenderMode.NEURAL_WAVEFRONT_GRADIENT,
                         RenderMode.NEURAL_WAVEFRONT_SSH):
            if self._lazy is not None:
                info["resolved"] = "lazy"
            elif (isinstance(getattr(self._impl, "sample_ctx", None), dict)
                    and "packed" in self._impl.sample_ctx):
                info["resolved"] = "brick"
            else:
                # "none" requested, or "auto" degraded past the memory gate
                info["resolved"] = "none"
            info["quality"] = ("exact-network" if info["resolved"] == "none"
                               else "decoded-trilinear")
            if info["resolved"] != "none":
                from instantvnr_tpu.render.brickcache import ctx_supersample

                ctx = (self._lazy.ctx if self._lazy is not None
                       else self._impl.sample_ctx)
                # f16 pools measured 105.8 dB vs f32 (indistinguishable)
                info["pool_dtype"] = str(ctx["packed"].dtype)
                # >1 ⇒ the "hq" nested-lattice pool (h² less trilinear
                # error vs exact); ==1 under policy "hq" ⇒ memory-gated
                # degrade to the standard pool
                from instantvnr_tpu.render.brickcache import ctx_convention

                info["supersample"] = ctx_supersample(ctx)
                # "exact" = pool approximates net(p) itself (mode-5
                # semantics); "decoded" = the decoding modes' half-texel
                # lattice (bit-exact with DECODED_* renders)
                info["lattice"] = ctx_convention(ctx)
                if info["lattice"] == "exact":
                    # trilinear of the exact field (50.7/51.8 dB vs the
                    # exact render at 1×/2×, bench scale) — not the
                    # decoding modes' warped one
                    info["quality"] = "exact-trilinear"
        return info

    def refresh_params(self, budget_bricks: int | None = None):
        """Rebind the render path to the neural volume's CURRENT parameters
        without retracing — the online-training hook (training steps inside
        the render loop, reference int_dual_volume.cpp:662-674). The
        decoded-slab path re-reads params at render() time already; the
        network-sampling paths swap their sample context here, and the
        decoded path tracer re-decodes its grid.

        budget_bricks (brick streaming-cache mode only): refresh at most
        this many bricks of the pool per call, round-robin across calls
        (render/brickcache.refresh_brick_pool) — bounds the per-frame
        hitch of the online-training loop; un-refreshed bricks show the
        previous epoch's field until the cursor wraps. None = full."""
        if self.neural is None:
            return
        from instantvnr_tpu.models.network import render_params
        from instantvnr_tpu.render.renderer import make_neural_sample_fn

        if self.mode in (RenderMode.NEURAL_WAVEFRONT,
                         RenderMode.NEURAL_WAVEFRONT_GRADIENT,
                         RenderMode.NEURAL_WAVEFRONT_SSH):
            if self._lazy is not None:
                # lazy pool: bounded round-robin re-decode when a budget is
                # given (same hitch contract as the eager pool's
                # refresh_brick_pool); full restale otherwise — the next
                # render()'s ensure_* re-decodes what the frame can see
                # against the NEW params
                self._lazy.refresh(self.neural.state.params,
                                   budget_bricks=budget_bricks)
                self._impl.set_sample_ctx(self._lazy.ctx)
                return
            is_brick = (self.streaming_cache in ("auto", "brick", "hq")
                        and isinstance(self._impl.sample_ctx, dict)
                        and "packed" in self._impl.sample_ctx)
            if is_brick:
                from instantvnr_tpu.render.brickcache import (
                    refresh_brick_pool,
                )

                if budget_bricks is not None:
                    ctx, self._brick_cursor = refresh_brick_pool(
                        self.neural.field, self.neural.state.params,
                        self._impl.sample_ctx,
                        start=getattr(self, "_brick_cursor", 0),
                        n_bricks=budget_bricks)
                    self._impl.set_sample_ctx(ctx)
                    return
                self._brick_cursor = 0
                mc, _, _ = self._scene_parts()
                ctx = self._build_streaming_ctx(mc)
                if ctx is not None:
                    self._impl.set_sample_ctx(ctx)
                else:
                    # the pool budget degraded past f16 (occupancy grew):
                    # fall back to exact per-sample network evaluation
                    self._impl.set_sample_fn(
                        make_neural_sample_fn(self.neural.field),
                        render_params(self.neural.state.params,
                                      self.neural.field))
            else:
                self._impl.set_sample_ctx(
                    render_params(self.neural.state.params,
                                  self.neural.field))
        elif self.mode == RenderMode.PATHTRACE_NEURAL:
            self._impl.sample_ctx = render_params(self.neural.state.params,
                                                  self.neural.field)
            self.reset_accumulation()
        elif self.mode == RenderMode.PATHTRACE_DECODED:
            # set_grid re-applies the construction-time grid→brick-pool
            # policy (assigning the raw grid would desync it from the
            # brick sampler the renderer was wired with)
            self._impl.set_grid(self.neural.decode_volume())
        elif self.mode == RenderMode.ISOSURFACE_DECODED:
            self._impl.set_grid(self.neural.decode_volume())

    def reset_accumulation(self):
        """vnrRendererResetAccumulation (api.h): restart progressive
        accumulation (no-op for the non-accumulating one-shot paths)."""
        impl = self._impl
        if hasattr(impl, "reset_accumulation"):
            # routes through the impl so a deferred-validation pending
            # frame is settled/discarded with the accumulation it belongs to
            impl.reset_accumulation()
        elif hasattr(impl, "frame_index"):
            impl.frame_index = 0
        if hasattr(impl, "_accum"):
            impl._accum = jnp.zeros_like(impl._accum)

    @property
    def camera(self) -> Camera:
        if self._camera is not None:
            return self._camera
        # mid-set_mode (from __init__) there is no impl yet — no camera
        return self._impl.camera if self._impl is not None else None

    def render(self):
        """vnrRender (api.cpp:522)."""
        if (self.mode == RenderMode.DECODED_SLAB and self.neural is not None):
            self._impl.set_params(self.neural.state.params)
        if (self._lazy is not None
                and self._lazy.n_decoded < self._lazy.n_bricks
                and self.mode in (RenderMode.NEURAL_WAVEFRONT,
                                  RenderMode.NEURAL_WAVEFRONT_GRADIENT,
                                  RenderMode.NEURAL_WAVEFRONT_SSH)):
            # lazy streaming cache: decode what this frame can touch before
            # dispatching it. The n_decoded guard keeps the steady state
            # fully host-side (no per-frame device readback — the scale
            # fetch below ships an array over the device link).
            xf = (self.neural or self.simple).transform
            cache = getattr(self, "_scale_host", None)
            if cache is None or cache[0] is not xf:
                cache = (xf, np.asarray(xf.scale))
                self._scale_host = cache
            if self.mode == RenderMode.NEURAL_WAVEFRONT_SSH:
                # SSH shadow rays leave the view frustum, but only along
                # the light: the frustum ∪ light-swept set bounds them
                # (brickcache.light_swept_cells), keeping the lazy policy
                # lazy. Light flip mirrors render/renderer._frame_rays:59.
                light = np.asarray(self._impl.settings.light_dir,
                                   np.float64)
                cam = self.camera
                view = (np.asarray(cam.center, np.float64)
                        - np.asarray(cam.eye, np.float64))
                if float(np.dot(view, light)) > 0:
                    light = -light
                n = self._lazy.ensure_view_ssh(
                    cam, self.width, self.height, light / cache[1],
                    scale=cache[1])
            else:
                n = self._lazy.ensure_view(
                    self.camera, self.width, self.height, scale=cache[1])
            if n:
                self._impl.set_sample_ctx(self._lazy.ctx)
        return self._impl.render()

    def mapframe(self) -> np.ndarray:
        """vnrRendererMapFrame: [H, W, 4] float32 on host (denoised when
        the denoiser is enabled)."""
        frame = self._impl.mapframe()
        if self.denoise:
            from instantvnr_tpu.render.denoise import atrous_denoise

            frame = np.asarray(atrous_denoise(jnp.asarray(frame)))
        return frame


def free_temporary_memory():
    """vnrFreeTemporaryGPUMemory (api.h): drop transient device buffers and
    cached traced programs (the JAX analog of the reference's temporary
    GPU-arena release)."""
    jax.clear_caches()


def memory_query() -> dict:
    """vnrMemoryQuery (api.cpp:532-552): device memory statistics."""
    stats = {}
    for d in jax.devices():
        try:
            m = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": m.get("bytes_in_use", 0),
                "peak_bytes_in_use": m.get("peak_bytes_in_use", 0),
                "bytes_limit": m.get("bytes_limit", 0),
            }
        except Exception:
            stats[str(d)] = {}
    return stats
