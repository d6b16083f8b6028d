"""fV-SRN torch-checkpoint importer (models/fvsrn_import.py): import a real
torch.save checkpoint and match a live torch forward of the same module —
the inference-adapter role of the reference's FvsrnNetwork
(fvsrn_network.cu:88-127)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from instantvnr_tpu.models.fvsrn_import import load_fvsrn_torch  # noqa: E402


def _snake_alt(x):
    return (x + 1.0 - torch.cos(2.0 * x)) / 2.0


class TinyFvsrn(torch.nn.Module):
    """The documented layout: latent grid [1,C,Z,Y,X], fourier matrix
    [M,3], Sequential of nn.Linear with SnakeAlt hidden activations."""

    def __init__(self, c=8, res=(6, 5, 4), m=4, width=16, hidden=2):
        super().__init__()
        g = torch.Generator().manual_seed(3)
        rx, ry, rz = res
        self.latent_grid = torch.nn.Parameter(
            torch.randn(1, c, rz, ry, rx, generator=g) * 0.3)
        self.fourier_matrix = torch.nn.Parameter(
            torch.randn(m, 3, generator=g))
        dims = [c + 2 * m] + [width] * hidden + [1]
        self.layers = torch.nn.ModuleList(
            [torch.nn.Linear(i, o) for i, o in zip(dims[:-1], dims[1:])])
        self.res = res

    def forward(self, p):
        """p [B,3] in [0,1]³ — latent trilinear (nodes spanning [0,1]
        inclusive) ‖ fourier [sin(2πFp), cos(2πFp)], SnakeAlt MLP."""
        rx, ry, rz = self.res
        lat = []
        grid = self.latent_grid[0]  # [C,Z,Y,X]
        x = p * torch.tensor([rx - 1, ry - 1, rz - 1], dtype=p.dtype)
        c0 = torch.clamp(x.floor().long(), max=torch.tensor(
            [rx - 2, ry - 2, rz - 2]))
        c0 = torch.clamp(c0, min=torch.tensor([0, 0, 0]))
        f = x - c0.to(p.dtype)
        out = torch.zeros(p.shape[0], grid.shape[0], dtype=p.dtype)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((f[:, 0] if dx else 1 - f[:, 0])
                         * (f[:, 1] if dy else 1 - f[:, 1])
                         * (f[:, 2] if dz else 1 - f[:, 2]))
                    v = grid[:, c0[:, 2] + dz, c0[:, 1] + dy,
                             c0[:, 0] + dx].T
                    out = out + w[:, None] * v
        lat = out
        ang = 2.0 * math.pi * (p @ self.fourier_matrix.T)
        h = torch.cat([lat, torch.sin(ang), torch.cos(ang)], dim=-1)
        for lin in self.layers[:-1]:
            h = _snake_alt(lin(h))
        return self.layers[-1](h)


class TestFvsrnImport:
    def test_import_matches_torch_forward(self, tmp_path):
        net = TinyFvsrn()
        p = tmp_path / "fvsrn.pt"
        torch.save(net.state_dict(), str(p))

        field, params = load_fvsrn_torch(str(p))
        assert field.cfg.latent_res == (6, 5, 4)
        assert field.cfg.latent_features == 8
        assert "fourier" in params and "bias" in params

        rng = np.random.default_rng(0)
        pts = rng.random((256, 3)).astype(np.float32)
        with torch.no_grad():
            want = net(torch.from_numpy(pts)).numpy()[:, 0]
        import dataclasses

        # f32 compute for the comparison (bf16 is the TPU default)
        field = dataclasses.replace(
            field, cfg=dataclasses.replace(field.cfg,
                                           compute_dtype="float32"))
        got = np.asarray(field.apply(params, jnp.asarray(pts)))[:, 0]
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_import_through_shared_renderer(self, tmp_path):
        """The imported field renders through the shared wavefront path
        (AbstractNetwork dispatch) — the adapter's actual job."""
        from instantvnr_tpu.accel import macrocell as mcmod
        from instantvnr_tpu.config import TransferFunctionConfig
        from instantvnr_tpu.data import synthetic_volume
        from instantvnr_tpu.models.metrics import decode_volume
        from instantvnr_tpu.render import (
            RaymarchSettings,
            Renderer,
            make_neural_sample_fn,
        )
        from instantvnr_tpu.utils.tfn import bake_transfer_function

        net = TinyFvsrn()
        p = tmp_path / "fvsrn.pt"
        torch.save(net.state_dict(), str(p))
        field, params = load_fvsrn_torch(str(p))

        grid = decode_volume(field, params, (16, 16, 16))
        assert np.isfinite(np.asarray(grid)).all()

        vol = synthetic_volume((16, 16, 16), kind="sphere")
        tf = bake_transfer_function(TransferFunctionConfig())
        mc = mcmod.build(vol.data, vol.dims, tf)
        r = Renderer(8, 8, mc, tf, make_neural_sample_fn(field),
                     sample_ctx=params,
                     settings=RaymarchSettings(n_iters=4, max_supersteps=16))
        img = np.asarray(r.render())
        assert np.isfinite(img).all()

    def test_wrapped_checkpoint_and_no_bias(self, tmp_path):
        """Checkpoints wrapped under 'state_dict' and bias-free linears."""
        net = TinyFvsrn()
        wrapped = {"epoch": 7, "state_dict": net.state_dict()}
        p = tmp_path / "wrapped.pt"
        torch.save(wrapped, str(p))
        field, params = load_fvsrn_torch(str(p))
        assert params["mlp"][0].shape == (16, 16)

    def test_rejects_mismatched_layout(self):
        sd = {
            "latent_grid": torch.zeros(1, 8, 4, 4, 4),
            "fourier_matrix": torch.zeros(4, 3),
            "layers.0.weight": torch.zeros(16, 99),  # wrong input width
            "layers.0.bias": torch.zeros(16),
        }
        with pytest.raises(ValueError, match="layout mismatch"):
            load_fvsrn_torch(sd)
