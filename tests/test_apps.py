"""App-level smoke tests: run the CLIs as subprocesses on tiny configs.

These exercise argument parsing, the end-to-end wiring, and file outputs —
the reference has no app tests at all."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APPS = os.path.join(REPO, "apps")


def run_app(name, *args, timeout=280):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # has no effect pre-sitecustomize; belt
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = ['{name}'] + {list(args)!r};"
        f"sys.path.insert(0, '{APPS}'); sys.path.insert(0, '{REPO}');"
        f"import runpy; runpy.run_path('{os.path.join(APPS, name)}', "
        "run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], timeout=timeout,
                          capture_output=True, text=True, env=env)


class TestApps:
    def test_train_render_view_pipeline(self, tmp_path):
        ckpt = str(tmp_path / "m.bson")
        png = str(tmp_path / "f.png")
        r = run_app("vnr_cmd_train.py", "--synthetic", "sphere", "--dims",
                    "32", "--max-num-steps", "40", "--batch", "2048",
                    "--save", ckpt)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert os.path.exists(ckpt)

        r = run_app("view_model.py", ckpt)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "total params" in r.stdout

        r = run_app("vnr_cmd_render.py", "--load", ckpt, "--size", "32",
                    "--num-frames", "2", "--warmup", "1", "--output", png)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "fps average" in r.stdout
        assert os.path.exists(png) or os.path.exists(png + ".npy")

    def test_isosurface_app(self, tmp_path):
        obj = str(tmp_path / "iso.obj")
        r = run_app("vnr_cmd_isosurface.py", "--synthetic", "sphere",
                    "--dims", "24", "--isovalue", "0.5", "--output", obj)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        text = open(obj).read()
        assert text.count("\nf ") > 100

    def test_env_knob_n_iters(self, monkeypatch):
        from instantvnr_tpu.render.raymarch import RaymarchSettings

        assert RaymarchSettings().n_iters == 16
        monkeypatch.setenv("VNR_RM_N_ITERS", "4")
        assert RaymarchSettings().n_iters == 4
