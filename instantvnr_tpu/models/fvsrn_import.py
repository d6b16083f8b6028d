"""fV-SRN checkpoint importer — inference-only, the reference adapter's role.

The reference's `FvsrnNetwork` loads externally-trained fV-SRN models for
inference (`core/networks/fvsrn_network.cu:88-127`: SceneNetwork::load of a
"volnet" binary compiled by the fV-SRN toolchain). That binary's layout
lives in the fV-SRN submodule, which is absent from the reference checkout
(and unavailable offline) — so this importer targets the artifact one step
UP the same toolchain: the PyTorch checkpoint (torch.save state_dict) that
fV-SRN training produces and from which volnets are exported. Anyone with
an fV-SRN model has this file.

Accepted tensor layout (torch conventions; key names are matched loosely —
any prefix, common synonyms):

  grid / latent_grid / volume : [1, C, Z, Y, X] or [C, Z, Y, X] float —
      the dense latent feature volume (torch grid_sample layout).
      Mapped to table[(z·ry + y)·rx + x, c], nodes spanning [0,1]³
      inclusive (interpolationInObjectSpace = false, fvsrn_network.cu:22).
  fourier_matrix / B          : [M, 3] (or [3, M]) float — frequency matrix;
      features are [sin(2π·F·p), cos(2π·F·p)] over raw [0,1] coords.
      Optional: absent ⇒ the field's default log-linear bands.
  layers.<i>.weight / .bias   : nn.Linear stacks ([out, in] weights); any
      common Sequential prefix (layers / hidden_layers / network / mlp).
      First layer input must equal C + 2M (latent ‖ fourier order).

Returns (FvsrnField, params) ready for the shared renderer/metrics paths
(params carry the "fourier"/"bias" extras apply_params understands).
Verified against a live torch forward of the same module in
tests/test_fvsrn_import.py; byte-level volnet interop remains impossible
to validate in this environment and is documented as such.
"""
from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from instantvnr_tpu.config import NetworkConfig
from instantvnr_tpu.models.fvsrn import FvsrnConfig, FvsrnField

_GRID_KEYS = ("latent_grid", "grid", "volume")
_FOURIER_KEYS = ("fourier_matrix", "fourier", "B", "b_matrix")


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _find_by_suffix(sd: dict, names: tuple[str, ...]):
    for name in names:
        for k, v in sd.items():
            base = k.rsplit(".", 1)[-1]
            if base == name:
                return k, _to_numpy(v)
    return None, None


def _find_linears(sd: dict):
    """Collect nn.Linear weight/bias pairs in Sequential index order."""
    pat = re.compile(r"^(.*?)(\d+)\.weight$")
    layers = {}
    for k in sd:
        m = pat.match(k)
        if not m:
            continue
        prefix, idx = m.group(1), int(m.group(2))
        bias_key = f"{prefix}{idx}.bias"
        layers.setdefault(prefix, []).append(
            (idx, _to_numpy(sd[k]),
             _to_numpy(sd[bias_key]) if bias_key in sd else None))
    if not layers:
        raise ValueError("no nn.Linear 'N.weight' entries found in the "
                         f"state dict (keys: {sorted(sd)[:8]}...)")
    # the MLP is the prefix with the most layers
    prefix = max(layers, key=lambda p: len(layers[p]))
    seq = sorted(layers[prefix])
    ws = [w for _, w, _ in seq]
    bs = [b for _, _, b in seq]
    return ws, bs


def load_fvsrn_torch(path_or_state, activation: str = "SnakeAlt",
                     output_activation: str = "None"):
    """Import an fV-SRN torch checkpoint → (FvsrnField, params).

    path_or_state: path to a torch.save file, or an already-loaded mapping
    (a state_dict, or a checkpoint dict containing one under 'state_dict' /
    'model').
    """
    sd = path_or_state
    if isinstance(sd, (str, bytes)):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=False)
    for container_key in ("state_dict", "model"):
        if isinstance(sd, dict) and container_key in sd and isinstance(
                sd[container_key], dict):
            sd = sd[container_key]
    if hasattr(sd, "state_dict"):  # a whole nn.Module
        sd = sd.state_dict()

    gk, grid = _find_by_suffix(sd, _GRID_KEYS)
    if grid is None:
        raise ValueError(f"no latent grid found (looked for {_GRID_KEYS})")
    if grid.ndim == 5:
        assert grid.shape[0] == 1, f"batched grid? {grid.shape}"
        grid = grid[0]
    assert grid.ndim == 4, f"latent grid must be [C,Z,Y,X], got {grid.shape}"
    c, rz, ry, rx = grid.shape
    # [C,Z,Y,X] → [(z·ry + y)·rx + x, C]
    table = np.moveaxis(grid, 0, -1).reshape(rz * ry * rx, c)

    _, fmat = _find_by_suffix(sd, _FOURIER_KEYS)
    if fmat is not None:
        if fmat.shape[0] == 3 and fmat.shape[1] != 3:
            fmat = fmat.T
        assert fmat.shape[1] == 3, f"fourier matrix must be [M,3]: {fmat.shape}"

    ws, bs = _find_linears(sd)
    n_in = ws[0].shape[1]
    if fmat is not None:
        n_four = 2 * fmat.shape[0]
        if n_in != c + n_four:
            raise ValueError(
                f"first linear expects {n_in} inputs but latent({c}) + "
                f"fourier({n_four}) = {c + n_four} — layout mismatch")
        bands = max(n_four // 6, 1)  # informational (matrix overrides)
    else:
        rem = n_in - c
        if rem % 6 != 0 or rem < 0:
            raise ValueError(
                f"no fourier matrix and first-linear inputs {n_in} − "
                f"latent {c} = {rem} is not 6·bands")
        bands = rem // 6

    cfg = FvsrnConfig(
        latent_res=(rx, ry, rz),
        latent_features=c,
        fourier_bands=bands,
        network=NetworkConfig(
            n_neurons=ws[0].shape[0],
            n_hidden_layers=max(len(ws) - 1, 0),
            activation=activation,
            output_activation=output_activation),
    )
    field = FvsrnField(cfg=cfg)

    params = {
        "table": jnp.asarray(table, jnp.float32),
        # torch [out, in] → our [in, out]
        "mlp": [jnp.asarray(w.T, jnp.float32) for w in ws],
    }
    if fmat is not None:
        params["fourier"] = jnp.asarray(fmat, jnp.float32)
    if any(b is not None for b in bs):
        params["bias"] = [
            jnp.asarray(b if b is not None else np.zeros(w.shape[0]),
                        jnp.float32) for w, b in zip(ws, bs)]
    return field, params
