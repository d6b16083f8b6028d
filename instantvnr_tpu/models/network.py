"""The neural representation: hash encoding + MLP = f: [0,1]³ → R.

This is the TPU-native counterpart of the reference's `TcnnNetwork<3,1>`
(`core/networks/tcnn_network.h:98-272`): a NetworkWithInputEncoding built from
the same JSON schema. Parameters live in a plain dict pytree:

    {"table": [T, F] float32, "mlp": [W0, W1, ...]}

so they serialize naturally (orbax / BSON interop in serializer.py) and
shard/replicate trivially under `jax.sharding`.

Inference contexts produced by `render_params` carry two extra keys:
  "_render": ()           — leafless static marker (part of the jit treedef,
                            zero runtime cost); network_apply reads it to
                            select the inference-only fast paths (Pallas
                            fused MLP under mlp_impl="auto", packed gathers)
  "packed": {lvl: [T,8F]} — corner-packed dense-level tables (big schemas)
Contexts built by hand (or round-tripped through a serializer that drops
empty-tuple leaves) lose the marker and silently fall back to the training
MLP path; render factories (make_neural_sample_fn) warn once when that
happens.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.ops.hash_encoding import (
    HashGridSpec,
    hash_encode,
    init_hash_table,
)
from instantvnr_tpu.ops.mlp import init_mlp_params, mlp_apply

Params = dict


@dataclass(frozen=True)
class NeuralField:
    """Static description of the model (hashable; safe as a jit static arg)."""

    cfg: ModelConfig
    spec: HashGridSpec

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "NeuralField":
        return cls(cfg=cfg, spec=HashGridSpec.from_config(cfg.encoding))

    @property
    def n_input_dims(self) -> int:
        return 3

    @property
    def n_output_dims(self) -> int:
        return 1

    def init(self, key: jax.Array) -> Params:
        return init_params(key, self)

    def apply(self, params: Params, coords: jnp.ndarray) -> jnp.ndarray:
        return network_apply(params, coords, self)

    @property
    def n_params(self) -> int:
        from instantvnr_tpu.ops.mlp import mlp_n_params

        return self.spec.n_params + mlp_n_params(
            self.cfg.network, n_input=self.spec.n_output_dims, n_output=1)


def init_params(key: jax.Array, field: NeuralField) -> Params:
    k_table, k_mlp = jax.random.split(key)
    table = init_hash_table(k_table, field.spec)
    mlp = init_mlp_params(
        k_mlp,
        n_input=field.spec.n_output_dims,
        cfg=field.cfg.network,
        n_output=field.n_output_dims,
    )
    return {"table": table, "mlp": mlp}


def network_apply(params: Params, coords: jnp.ndarray,
                  field: NeuralField) -> jnp.ndarray:
    """coords [B,3] in [0,1]³ → values [B,1] float32.

    The reference path: one fused XLA gather for the encoding, bf16 matmuls
    for the MLP (MXU), fp32 accumulation.

    AbstractNetwork dispatch (reference tcnn_network.h:70-95): any field
    exposing `apply_params` (e.g. models.fvsrn.FvsrnField) routes through
    its own forward — trainer, metrics, and renderers stay family-agnostic.
    """
    custom = getattr(field, "apply_params", None)
    if custom is not None:
        return custom(params, coords)
    compute_dtype = jnp.dtype(field.cfg.compute_dtype)
    impl = field.cfg.grid_grad_impl
    if impl == "auto":
        impl = "splat" if jax.default_backend() == "tpu" else "scatter"
    if "packed" in params:
        # inference fast path (render_params): corner-packed dense levels —
        # one gather per dense level instead of 8 (hash_encoding.py notes)
        from instantvnr_tpu.ops.hash_encoding import hash_encode_packed

        feats = hash_encode_packed(params["table"], params["packed"], coords,
                                   field.spec, compute_dtype=compute_dtype)
    elif impl == "splat":
        from instantvnr_tpu.ops.hash_encoding import hash_encode_splat

        fwd = field.cfg.grid_fwd_impl
        # "auto" = plain: measured on v5e (scratch/packed_train.py), the
        # per-step packed-table rebuild never pays for itself in TRAINING —
        # 55.5/91.5/124.7 ms plain vs 55.2/92.0/135.3 packed at 2^14/16/19.
        # (Rendering still packs: render_params packs ONCE per checkpoint
        # and the coherent-coords gather wins +24% wavefront fps at 2^19.)
        packed_fwd = fwd == "packed"
        feats = hash_encode_splat(params["table"], coords, field.spec,
                                  compute_dtype=compute_dtype,
                                  packed_fwd=packed_fwd)
    else:
        feats = hash_encode(params["table"], coords, field.spec,
                            compute_dtype=compute_dtype)
    inference = "_render" in params
    if _use_pallas_mlp(field.cfg.mlp_impl, compute_dtype, inference):
        from instantvnr_tpu.ops.pallas.fused_mlp import fused_mlp_apply

        return fused_mlp_apply(params["mlp"], feats, field.cfg.network)
    return mlp_apply(params["mlp"], feats, field.cfg.network,
                     compute_dtype=compute_dtype)


def render_params(params: Params, field: NeuralField) -> Params:
    """Prepare parameters for the inference-only render path.

    The hash-table gather is the measured bottleneck of sample-streaming
    rendering; the fastest layout is schema-dependent (scratch/packed_e2e.py,
    B=2^16 encode+MLP on v5e):
      - small schemas (2^14: 0.95 M entries, 3.8 MB) gather FASTER in f32
        than bf16 (13.1 vs 18.5 ms — the table is cache-resident and the
        cast only adds conversion work), and corner-packing is neutral;
      - big schemas (2^19 reference schema: 93 MB f32) are HBM-bound: bf16
        halves the gathered bytes and corner-packed dense levels cut the
        row count (29.2 ms f32-plain → 22.7 ms bf16+packed, 1.29×).
    Training keeps the f32 master table; call this once per parameter update
    (the reference equally re-uploads half-precision params to its inference
    pipeline after each training epoch, tcnn_network.h:142-156).

    The returned arrays are always FRESH (never aliases of `params`): the
    training step donates its state buffers (trainer.py donate_argnums), so
    an aliased render ctx would be deleted out from under a live renderer by
    the very next train call.
    """
    fresh = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731

    def cast_fresh(x, dt):
        # astype is a no-op (aliasing!) when dtypes already match — an
        # already-bf16 table would alias the donated training buffer
        return x.astype(dt) if x.dtype != jnp.dtype(dt) else jnp.copy(x)

    # "_render": leafless static marker (empty tuple ⇒ part of the jit
    # treedef, zero runtime cost) — network_apply reads it to select the
    # inference-only fast paths (Pallas MLP kernel under mlp_impl="auto")
    spec = getattr(field, "spec", None)
    if spec is None:  # non-hash-grid families (e.g. fV-SRN): plain bf16 cast
        return {"table": cast_fresh(params["table"], jnp.bfloat16),
                "mlp": fresh(params["mlp"]), "_render": ()}
    big = spec.n_params >= (1 << 22)  # crossover measured between 2^14/2^19
    if not big:
        return {"table": fresh(params["table"]), "mlp": fresh(params["mlp"]),
                "_render": ()}
    from instantvnr_tpu.ops.hash_encoding import packed_dense_tables

    table = cast_fresh(params["table"], jnp.bfloat16)
    out = {"table": table, "mlp": fresh(params["mlp"]), "_render": ()}
    packed = packed_dense_tables(table, spec)
    if packed:
        out["packed"] = packed
    return out


def network_apply_chunked(params: Params, coords: jnp.ndarray,
                          field: NeuralField,
                          chunk: int = 1 << 18) -> jnp.ndarray:
    """network_apply evaluated in fixed-size chunks via lax.map.

    XLA materializes the encoding gather as [B·L·8, F] rows padded to 128
    lanes (16x for F=8): one 4.2M-sample wavefront superstep would allocate
    16+ GB of HBM temp and OOM. Chunking bounds the temp to
    chunk·L·8·128·2 bytes while keeping one traced program.
    """
    b = coords.shape[0]
    if b <= chunk:
        return network_apply(params, coords, field)
    pad = (-b) % chunk
    if pad:
        coords = jnp.concatenate(
            [coords, jnp.zeros((pad, 3), coords.dtype)], axis=0)
    chunks = coords.reshape(-1, chunk, 3)
    out = jax.lax.map(lambda c: network_apply(params, c, field), chunks)
    out = out.reshape(-1, out.shape[-1])
    return out[:b] if pad else out


def _use_pallas_mlp(impl: str, compute_dtype=jnp.bfloat16,
                    inference: bool = False) -> bool:
    """mlp_impl resolution: "pallas" forces the kernel, "xla" forces the
    reference path, "auto" (the default) uses the kernel on TPU backends
    for INFERENCE only (render contexts, marked by render_params):

    - Inference: the kernel wins (0.88 vs 0.99 ms @65536×64×5, v5e).
    - Training: measured STRICTLY WORSE on v5e — 55.0 vs 51.6 ms/step AND
      ~6 dB lower converged PSNR (47.2 vs 52.5 dB at 1000 steps @2^14,
      reproducible across seeds) despite per-step grads matching XLA's
      autodiff to ~2e-3 relative. The tiny 64-wide matmul chain is not
      where the training step's time goes (the encode gather/scatter is),
      so XLA autodiff is both faster and better-conditioned here.

    The kernel computes in bf16 (tcnn's network_precision_t,
    tcnn_network.h:54), so "auto" never selects it for a model configured
    with a different compute dtype — that would silently change numerics."""
    if impl == "auto":
        return (inference and jax.default_backend() == "tpu"
                and jnp.dtype(compute_dtype) == jnp.dtype(jnp.bfloat16))
    return impl == "pallas"
