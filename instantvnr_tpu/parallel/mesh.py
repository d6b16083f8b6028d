"""Device mesh construction (new design — the reference is single-GPU with no
distributed backend at all, SURVEY.md §2.9; this layer replaces CUDA streams +
nothing with `jax.sharding.Mesh` + shard_map over ICI/DCN).

Axis conventions:
  "data"  — rays / pixels / training samples (pure DP; rays are independent)
  "model" — hash-grid levels + first-MLP-layer rows (tensor parallel; only
            engaged when the hash table is too large to replicate)

The default mesh is 1-D ("data",) over all devices; `make_mesh(tp=k)` carves
a 2-D (data × model) mesh. Multi-host: devices are globally ordered, so the
data axis spans hosts and gradient psum rides ICI within a host and DCN
across hosts (XLA places the collectives).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(devices=None, tp: int = 1) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp <= 1:
        return Mesh(np.asarray(devices).reshape(n), ("data",))
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return Mesh(np.asarray(devices).reshape(n // tp, tp), ("data", "model"))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["data"]
