"""The decoder MLP — pure-JAX reference implementation.

Mirrors tcnn's FullyFusedMLP semantics (reference `example-model.json:26-32`,
`core/networks/tcnn_network.h:98-272`):

- NO biases (tcnn fully-fused MLPs are weight-only)
- `n_hidden_layers` hidden layers of `n_neurons`, so n_hidden_layers+1 weight
  matrices: [in→W], (n_hidden−1)×[W→W], [W→out_padded]
- ReLU hidden activation, linear (None) output
- the output is padded to 16 columns in tcnn; we keep a true n_out matmul and
  pad only inside the Pallas kernel where alignment wants it.

TPU mapping: the batch dimension carries the MXU. With batch 2^16 and width
64, each layer is a [65536×64] @ [64×64] matmul in bf16 — the batch fills the
128×128 systolic array tiles while the tiny weights stay resident (the tcnn
trick, transposed to TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from instantvnr_tpu.config import NetworkConfig


def mlp_widths(cfg: NetworkConfig, n_input: int,
               n_output: int = 1) -> list[int]:
    """The single source of truth for the weight-matrix layout: n_params /
    init / serializers all derive from this list."""
    return [n_input] + [cfg.n_neurons] * cfg.n_hidden_layers + [n_output]


def mlp_n_params(cfg: NetworkConfig, n_input: int, n_output: int = 1) -> int:
    widths = mlp_widths(cfg, n_input, n_output)
    return sum(a * b for a, b in zip(widths[:-1], widths[1:]))


def init_mlp_params(key: jax.Array, n_input: int, cfg: NetworkConfig,
                    n_output: int = 1, dtype=jnp.float32) -> list[jnp.ndarray]:
    """Hidden layers use He-uniform-ish init like tcnn (activation-scaled)."""
    widths = mlp_widths(cfg, n_input, n_output)
    keys = jax.random.split(key, len(widths) - 1)
    params = []
    for k, fan_in, fan_out in zip(keys, widths[:-1], widths[1:]):
        std = (2.0 / fan_in) ** 0.5  # He init for ReLU
        params.append(
            (jax.random.normal(k, (fan_in, fan_out), jnp.float32) * std).astype(dtype)
        )
    return params


def _activation(name: str):
    name = name.lower()
    if name == "relu":
        return lambda x: jnp.maximum(x, 0)
    if name == "sine":
        return jnp.sin
    if name in ("none", "linear", "identity"):
        return lambda x: x
    if name == "squareplus":
        return lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0))
    if name == "snakealt":
        # fV-SRN's SnakeAlt: (x + 1 − cos(2x))/2 — the periodic activation
        # its SRNs train with (volume_interpolation_network semantics)
        return lambda x: 0.5 * (x + 1.0 - jnp.cos(2.0 * x))
    raise ValueError(f"unsupported activation: {name}")


def mlp_apply(params: list[jnp.ndarray], x: jnp.ndarray, cfg: NetworkConfig,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Apply the MLP. x: [B, n_input] → [B, n_output] float32."""
    act = _activation(cfg.activation)
    out_act = _activation(cfg.output_activation)
    # bf16 inputs hit the MXU natively; f32 inputs request full-precision
    # accumulation (otherwise TPU matmuls default to bf16 passes).
    precision = None if compute_dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    h = x.astype(compute_dtype)
    for w in params[:-1]:
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32, precision=precision)
        h = act(h).astype(compute_dtype)
    y = jnp.dot(h, params[-1].astype(compute_dtype),
                preferred_element_type=jnp.float32, precision=precision)
    return out_act(y)
