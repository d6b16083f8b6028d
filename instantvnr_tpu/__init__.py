"""instantvnr_tpu — TPU-native instant neural representation for volume rendering.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
VIDILabs/instantvnr (reference: /root/reference): multi-resolution
hash-encoded MLP volume compression, macrocell-accelerated differentiable ray
marching and delta-tracking path tracing, in-loop online training, out-of-core
ground-truth streaming, isosurface extraction, and multi-chip sharding via
`jax.sharding.Mesh` + `shard_map`.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  api.py             — high-level facade (reference: api.h / api.cpp)
  render/            — renderers (reference: core/renderer/*)
  models/            — neural representation (reference: core/network.cu, tcnn)
  data/              — samplers / volume IO (reference: core/samplers/*)
  accel/             — macrocell grid (reference: core/macrocell.cu)
  ops/               — pure-JAX + Pallas compute primitives
  parallel/          — device mesh / sharded train+render steps (new design)
  utils/             — math, camera, transfer functions, config, timers
"""

__version__ = "0.1.0"

from instantvnr_tpu.config import (  # noqa: F401
    ModelConfig,
    EncodingConfig,
    NetworkConfig,
    OptimizerConfig,
    LossConfig,
    VolumeDesc,
    CameraConfig,
    TransferFunctionConfig,
    SceneConfig,
    load_model_config,
    load_scene_config,
)
