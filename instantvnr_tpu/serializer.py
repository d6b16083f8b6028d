"""Checkpoint (de)serialization in the reference's BSON container format.

Writer/reader mirror `NeuralVolume::save_params_to_json` /
`load_params_from_json` (core/network.cu:827-955):

  root["volume"]["dims"]{x,y,z}
  root["macrocell"]{groundtruth, dims{x,y,z}, spacings{x,y,z},
                    data: binary vec2f per cell}     — ranges stored with the
                    reference's −1/+1 offset trick (macrocell.cu:34-39), so
                    files round-trip bit-compatibly with CUDA-written ones
  root["model"]     — the tcnn-schema model JSON
  root["parameters"]— tcnn Trainer::serialize() layout (flat n_params /
                    params_binary / params_type keys, plus step/loss extras
                    the CUDA loader ignores); params as one fp16 binary blob
                    in tcnn order: MLP matrices first ([out×in] row-major,
                    the output layer zero-padded to 16 rows like
                    FullyFusedMLP), then the hash grid ([entry-major, F
                    features]).

Key order is alphabetical at every level (nlohmann::json backs objects with
std::map, so `json::to_bson` emits sorted keys) — byte-compatibility with
CUDA-written files depends on it. Verified against a hand-built byte-exact
fixture in tests/test_serializer.py.

Native checkpointing (`save_native`/`load_native`, .npz) carries the FULL
TrainState — params, Adam moments, RNG key, step — for bit-exact training
resume (the BSON interchange format, like tcnn's default serialize, drops
optimizer state); this module's BSON half is the interchange format for
parity with the reference.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from instantvnr_tpu.accel.macrocell import MacroCell
from instantvnr_tpu.config import ModelConfig, load_model_config
from instantvnr_tpu.models.network import NeuralField
from instantvnr_tpu.utils import bson

_PAD_OUT = 16  # tcnn pads the MLP output layer to 16 rows


def _vec3(x, y, z, cast=float):
    return {"x": cast(x), "y": cast(y), "z": cast(z)}


def pack_params(field: NeuralField, params: dict) -> bytes:
    """Pack {table, mlp} into one fp16 blob, tcnn layout (network → grid)."""
    chunks = []
    for i, w in enumerate(params["mlp"]):
        m = np.asarray(w, np.float32).T  # [out, in] row-major like tcnn
        if i == len(params["mlp"]) - 1 and m.shape[0] < _PAD_OUT:
            m = np.concatenate(
                [m, np.zeros((_PAD_OUT - m.shape[0], m.shape[1]), np.float32)]
            )
        chunks.append(m.astype(np.float16).ravel())
    chunks.append(np.asarray(params["table"], np.float32).astype(np.float16).ravel())
    return np.concatenate(chunks).tobytes()


def unpack_params(field: NeuralField, blob: bytes) -> dict:
    data = np.frombuffer(blob, np.float16).astype(np.float32)
    cfg = field.cfg.network
    widths = ([field.spec.n_output_dims] + [cfg.n_neurons] * cfg.n_hidden_layers
              + [field.n_output_dims])
    mlp = []
    pos = 0
    for i, (fan_in, fan_out) in enumerate(zip(widths[:-1], widths[1:])):
        rows = fan_out
        if i == len(widths) - 2 and rows < _PAD_OUT:
            rows = _PAD_OUT
        m = data[pos : pos + rows * fan_in].reshape(rows, fan_in)
        pos += rows * fan_in
        mlp.append(jnp.asarray(m[:fan_out].T))
    n_table = field.spec.n_params
    table = data[pos : pos + n_table].reshape(field.spec.n_entries,
                                              field.spec.n_features)
    pos += n_table
    if pos != data.size:
        raise ValueError(f"parameter blob size mismatch: {pos} != {data.size}")
    return {"table": jnp.asarray(table), "mlp": mlp}


def save_checkpoint(path: str, field: NeuralField, params: dict,
                    mc: MacroCell, volume_dims, groundtruth_mc: bool = False,
                    step: int = 0, loss: float = 0.0) -> None:
    mx, my, mz = mc.dims
    sx, sy, sz = mc.spacings
    # apply the reference's storage offset: (lo−1, hi+1), interleaved vec2f
    lo = np.asarray(mc.value_lo, np.float32) - 1.0
    hi = np.asarray(mc.value_hi, np.float32) + 1.0
    ranges = np.stack([lo.ravel(), hi.ravel()], axis=-1).astype("<f4")

    dx, dy, dz = (int(d) for d in volume_dims)
    blob = pack_params(field, params)
    root = {
        "volume": {"dims": _vec3(dx, dy, dz, int)},
        "macrocell": {
            "groundtruth": bool(groundtruth_mc),
            "dims": _vec3(mx, my, mz, int),
            "spacings": _vec3(sx, sy, sz, float),
            "data": bson.Binary(ranges.tobytes()),
        },
        # tcnn Trainer::serialize() (root["parameters"] = m_trainer->serialize(),
        # tcnn_network.h:157): flat keys; step/loss are extras tcnn's
        # deserialize ignores
        "parameters": {
            "loss": float(loss),
            "n_params": len(blob) // 2,
            "params_binary": bson.Binary(blob),
            "params_type": "__half",
            "step": int(step),
        },
        "model": field.cfg.to_json(),
    }
    with open(path, "wb") as f:
        f.write(bson.encode(_sort_keys(root)))


def _sort_keys(v):
    """Recursively sort dict keys (nlohmann std::map ordering → to_bson)."""
    if isinstance(v, dict):
        return {k: _sort_keys(v[k]) for k in sorted(v)}
    if isinstance(v, (list, tuple)) and not isinstance(v, (bytes, bytearray)):
        return [_sort_keys(x) for x in v]
    return v


def load_checkpoint(path: str):
    """Returns (field, params, mc, volume_dims, meta).

    Follows the reference loader's tolerance (network.cu:879-955): missing
    sections are skipped; the 'old format' (parameters at root) is accepted.
    """
    with open(path, "rb") as f:
        root = bson.decode(f.read())
    return load_checkpoint_doc(root)


def load_checkpoint_doc(root: dict):
    """load_checkpoint on an already-decoded document — the in-memory half
    of vnrNeuralVolumeSetParams, which accepts a filename OR a json doc
    (api.cpp:269-278 → load_params / load_params_from_json)."""
    model_cfg: ModelConfig = load_model_config(root["model"]) if "model" in root \
        else ModelConfig()
    field = NeuralField.from_config(model_cfg)

    volume_dims = None
    if "volume" in root:
        d = root["volume"]["dims"]
        volume_dims = (int(d["x"]), int(d["y"]), int(d["z"]))

    mc = None
    if "macrocell" in root and volume_dims is not None:
        from instantvnr_tpu.accel.macrocell import MACROCELL_SIZE

        m = root["macrocell"]
        mdims = (int(m["dims"]["x"]), int(m["dims"]["y"]), int(m["dims"]["z"]))
        expect = tuple(-(-d // MACROCELL_SIZE) for d in volume_dims)
        if mdims != expect:
            # a file written with a different MACROCELL_SIZE_MIP: our cell
            # size is compile-time (like the reference's), so reinterpreting
            # the grid would silently misalign empty-space skipping
            raise ValueError(
                f"checkpoint macrocell grid {mdims} does not match "
                f"{expect} (= ceil(dims/{MACROCELL_SIZE})); it was written "
                "with a different macrocell cell size")
        raw = np.frombuffer(bytes(m["data"]), "<f4").reshape(-1, 2)
        lo = raw[:, 0].reshape(mdims[2], mdims[1], mdims[0]) + 1.0
        hi = raw[:, 1].reshape(mdims[2], mdims[1], mdims[0]) - 1.0
        mc = MacroCell(
            value_lo=jnp.asarray(lo),
            value_hi=jnp.asarray(hi),
            max_opacity=jnp.zeros_like(jnp.asarray(lo)),
            volume_dims=volume_dims,
        )

    psec = root.get("parameters", root)
    # CUDA/tcnn files have params_binary flat in "parameters"
    # (Trainer::serialize); early repo checkpoints nested it in "network"
    net = psec if "params_binary" in psec else psec["network"]
    blob = bytes(net["params_binary"])
    if net.get("params_type", "__half") != "__half":
        raise ValueError(f"unsupported params_type {net['params_type']!r}")
    if "n_params" in net and int(net["n_params"]) != len(blob) // 2:
        raise ValueError("n_params does not match params_binary size")
    params = unpack_params(field, blob)
    meta = {"step": psec.get("step", 0), "loss": psec.get("loss", 0.0)}
    return field, params, mc, volume_dims, meta


# ---------------------------------------------------------------------------
# Native exact-resume checkpoints (.npz)
# ---------------------------------------------------------------------------

def save_native(path: str, field: NeuralField, state,
                volume_dims=None) -> None:
    """Write the FULL TrainState (params + Adam m/v + step + RNG key + loss)
    plus the model config — resuming from this is exact, unlike the BSON
    interchange format (reference --resume also loses optimizer state,
    tcnn Trainer::serialize(serialize_optimizer=false))."""
    import json

    import jax

    leaves, _ = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    if hasattr(field.cfg, "to_json"):
        doc = field.cfg.to_json()
    else:  # fV-SRN family: flat dataclasses, tagged for load dispatch
        import dataclasses

        doc = {"family": "fvsrn", **dataclasses.asdict(field.cfg)}
    arrs["model_json"] = np.frombuffer(json.dumps(doc).encode(), np.uint8)
    if volume_dims is not None:
        arrs["volume_dims"] = np.asarray(volume_dims, np.int32)
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrs)


def load_native(path: str):
    """Returns (field, state, volume_dims) with the exact training state
    restored (volume_dims is None for pre-dims checkpoints)."""
    import json

    import jax

    from instantvnr_tpu.config import model_config_from_dict
    from instantvnr_tpu.models.trainer import create_train_state

    data = np.load(path)
    doc = json.loads(bytes(data["model_json"]))
    if isinstance(doc, dict) and doc.get("family") == "fvsrn":
        from instantvnr_tpu.config import (
            LossConfig,
            NetworkConfig,
            OptimizerConfig,
        )
        from instantvnr_tpu.models.fvsrn import FvsrnConfig, FvsrnField

        cfg = FvsrnConfig(
            latent_res=tuple(doc["latent_res"]),
            latent_features=int(doc["latent_features"]),
            fourier_bands=int(doc["fourier_bands"]),
            network=NetworkConfig(**doc["network"]),
            optimizer=OptimizerConfig(**doc["optimizer"]),
            loss=LossConfig(**doc["loss"]),
            compute_dtype=doc["compute_dtype"],
        )
        field = FvsrnField.from_config(cfg)
    else:
        cfg = model_config_from_dict(doc)
        field = NeuralField.from_config(cfg)
    template = create_train_state(jax.random.PRNGKey(0), field)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if np.shape(ref) != arr.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != model {np.shape(ref)}")
        new_leaves.append(jnp.asarray(arr, jnp.asarray(ref).dtype))
    dims = (tuple(int(d) for d in data["volume_dims"])
            if "volume_dims" in data else None)
    return field, jax.tree_util.tree_unflatten(treedef, new_leaves), dims
