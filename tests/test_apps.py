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

        r = run_app("vnr_cmd_render.py", "--load", ckpt, "--mode",
                    "isosurface", "--isovalue", "0.4", "--size", "32",
                    "--num-frames", "1", "--warmup", "0", "--output", png)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "fps average" in r.stdout

    def test_train_on_vdb_volume(self, tmp_path):
        """`vnr_cmd_train --volume foo.vdb` — the OpenVKL VDB source class
        (neural_sampler.cpp:756-770) through the CLI."""
        from instantvnr_tpu.data.vdb import write_vdb

        z, y, x = np.meshgrid(*(np.linspace(0, 1, 24),) * 3, indexing="ij")
        d = np.exp(-((x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2) * 14)
        vdb = str(tmp_path / "blob.vdb")
        write_vdb(vdb, d.astype(np.float32), compression="zip+mask",
                  active_threshold=0.02)
        ckpt = str(tmp_path / "m.bson")
        r = run_app("vnr_cmd_train.py", "--volume", vdb, "--max-num-steps",
                    "40", "--batch", "2048", "--save", ckpt,
                    "--report-psnr")
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "PSNR" in r.stdout
        assert os.path.exists(ckpt)

    def test_train_vdb_out_of_core(self, tmp_path):
        """.vdb feeds the OOC descriptor too: densified raw sidecar +
        native block loader (VERDICT r4 #6's second half)."""
        from instantvnr_tpu.data.vdb import write_vdb

        rng = np.random.default_rng(3)
        d = rng.random((24, 24, 24), np.float32)
        vdb = str(tmp_path / "blob.vdb")
        write_vdb(vdb, d)
        ckpt = str(tmp_path / "m.bson")
        r = run_app("vnr_cmd_train.py", "--volume", vdb, "--sampling-mode",
                    "out-of-core", "--max-num-steps", "30", "--batch",
                    "2048", "--save", ckpt)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "out-of-core" in r.stdout
        assert os.path.exists(ckpt)
        assert os.path.exists(vdb + ".raw")  # densified sidecar

    def test_render_orbit(self, tmp_path):
        png = str(tmp_path / "o.png")
        r = run_app("vnr_cmd_render.py", "--synthetic", "sphere", "--dims",
                    "16", "--mode", "reference", "--size", "24",
                    "--num-frames", "4", "--warmup", "1", "--orbit",
                    "--output", png)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "fps average" in r.stdout

    def test_isosurface_app(self, tmp_path):
        obj = str(tmp_path / "iso.obj")
        r = run_app("vnr_cmd_isosurface.py", "--synthetic", "sphere",
                    "--dims", "24", "--isovalue", "0.5", "--output", obj)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        text = open(obj).read()
        assert text.count("\nf ") > 100

    def test_precompile_app(self, tmp_path):
        r = run_app("vnr_precompile.py", "--synthetic", "sphere", "--dims",
                    "16", "--size", "16", "--modes", "slab", "wavefront",
                    "--cache-dir", str(tmp_path / "cache"))
        assert r.returncode == 0, r.stderr[-2000:]
        assert "total:" in r.stderr

    def test_precompile_warms_fused_whole_frame(self, tmp_path):
        """vnr_precompile compiles the FUSED whole-frame executable into an
        isolated persistent cache; a fresh session with that cache engages
        fused within one settle depth (VERDICT r4 #5)."""
        cache = str(tmp_path / "cache")
        r = run_app("vnr_precompile.py", "--synthetic", "sphere", "--dims",
                    "24", "--size", "48", "--modes", "wavefront",
                    "--cache-dir", cache, "--cache-min-secs", "0",
                    timeout=540)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "wavefront-fused" in r.stderr, r.stderr[-2000:]
        assert os.path.isdir(cache) and os.listdir(cache)

        # fresh process, same cache: fused must engage within a few frames
        code = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', {cache!r})
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import sys; sys.path.insert(0, {REPO!r})
from instantvnr_tpu.api import NeuralVolume, RenderMode, VNRenderer
from instantvnr_tpu.config import ModelConfig
from instantvnr_tpu.api import SimpleVolume
from instantvnr_tpu.render.compaction import wait_fused_compiles
simple = SimpleVolume.synthetic(dims=(24, 24, 24), kind='sphere')
nv = NeuralVolume(ModelConfig(), simple=simple, train_batch=1 << 14)
nv.train(1)
r = VNRenderer(nv, width=48, height=48, mode=RenderMode.NEURAL_WAVEFRONT)
depth = getattr(r._impl, '_fused_depth', 3)
for i in range(3 + depth):
    r.render()
    wait_fused_compiles()
print('fused_frames', r._impl._sched_cache.get('fused_frames', 0))
"""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run([sys.executable, "-c", code], timeout=540,
                             capture_output=True, text=True, env=env)
        assert out.returncode == 0, out.stderr[-2000:]
        n = int(out.stdout.strip().rsplit(" ", 1)[-1])
        assert n >= 1, out.stdout + out.stderr[-1000:]

    def test_env_knob_n_iters(self, monkeypatch):
        from instantvnr_tpu.render.raymarch import RaymarchSettings

        assert RaymarchSettings().n_iters == 16
        monkeypatch.setenv("VNR_RM_N_ITERS", "4")
        assert RaymarchSettings().n_iters == 4


class TestViewer:
    """The interactive web viewer (vnr_int_viewer.py): start it on a tiny
    online-training scene, drive the HTTP API like the browser does."""

    def test_viewer_end_to_end(self):
        import io
        import json as jsonlib
        import time
        import urllib.request

        env = dict(os.environ)
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv = ['vnr_int_viewer.py', '--synthetic',"
            " 'sphere', '--dims', '24', '--size', '48', '--batch', '512',"
            " '--train-steps-per-frame', '2', '--infer-blobs-per-frame',"
            " '1', '--port', '0'];"
            f"sys.path.insert(0, '{APPS}'); sys.path.insert(0, '{REPO}');"
            f"import runpy; runpy.run_path("
            f"'{os.path.join(APPS, 'vnr_int_viewer.py')}',"
            " run_name='__main__')"
        )
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True, env=env)
        try:
            line = proc.stdout.readline()
            assert "serving on http://" in line, line
            base = line.split("serving on ")[1].strip().rstrip("/")

            def get(path, timeout=240):
                deadline = time.time() + timeout
                while True:
                    try:
                        with urllib.request.urlopen(base + path,
                                                    timeout=30) as r:
                            if r.status == 200:
                                return r.read()
                    except Exception:
                        pass
                    assert time.time() < deadline, f"timed out on {path}"
                    assert proc.poll() is None, proc.stderr.read()[-2000:]
                    time.sleep(1.0)

            page = get("/")
            assert b"instantvnr-tpu viewer" in page

            png = get("/frame.png")  # waits through jit compiles
            from PIL import Image
            img = Image.open(io.BytesIO(png))
            assert img.size == (48, 48)

            st = jsonlib.loads(get("/api/state"))
            assert st["mode"] == "DECODED_SLAB"
            assert "NEURAL_WAVEFRONT" in st["modes"]
            assert st["training"] is True

            # training advances inside the render loop (int_dual semantics)
            deadline = time.time() + 240
            while True:
                st2 = jsonlib.loads(get("/api/state"))
                if st2["step"] > 0:
                    break
                assert time.time() < deadline, "training never advanced"
                time.sleep(1.0)

            # camera edit is transactional and re-renders
            frame0 = jsonlib.loads(get("/api/state"))["frame"]
            assert get("/api/camera?yaw=2.5&dist=60") == b"ok"
            deadline = time.time() + 240
            while jsonlib.loads(get("/api/state"))["frame"] <= frame0:
                assert time.time() < deadline, "no frame after camera edit"
                time.sleep(0.5)
            st3 = jsonlib.loads(get("/api/state"))
            assert abs(st3["camera"]["yaw"] - 2.5) < 1e-6

            # live training curve (int_dual implot parity): the ring
            # buffer carries (step, loss, fps) points by now
            cv = jsonlib.loads(get("/api/curve"))
            assert len(cv["step"]) >= 1
            assert len(cv["step"]) == len(cv["loss"]) == len(cv["fps"])
            assert cv["step"] == sorted(cv["step"])
            assert all(l > 0 for l in cv["loss"])

            # streaming-cache quality is surfaced in state (decoded-grade
            # default must be visible, not silent)
            sc = st3["streaming_cache"]
            assert sc["policy"] == "auto"
            assert sc["quality"] == "n/a"  # DECODED_SLAB: not a streaming mode

            # pause training, then quit
            assert get("/api/training?on=0") == b"ok"

            # isosurface mode switch + traced iso edit (int_isosurface
            # interactivity) — frame keeps advancing in the new mode
            assert get("/api/mode?name=ISOSURFACE_DECODED") == b"ok"
            assert get("/api/iso?value=0.35") == b"ok"
            deadline = time.time() + 240
            while True:
                st4 = jsonlib.loads(get("/api/state"))
                if st4["mode"] == "ISOSURFACE_DECODED" and \
                        abs(st4["isovalue"] - 0.35) < 1e-6:
                    break
                assert time.time() < deadline, st4
                time.sleep(1.0)

            # TF edit (the GUI TF-editor path) and density slider
            spec = jsonlib.dumps({"alphas": [[0.0, 0.1], [1.0, 0.9]]})
            req = urllib.request.Request(base + "/api/tf",
                                         data=spec.encode(), method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                assert resp.read() == b"ok"
            assert get("/api/density?value=1.5") == b"ok"
            frame_tf = jsonlib.loads(get("/api/state"))["frame"]
            deadline = time.time() + 240
            while jsonlib.loads(get("/api/state"))["frame"] <= frame_tf:
                assert time.time() < deadline, "no frame after TF edit"
                time.sleep(1.0)

            assert get("/api/quit") == b"bye"
            proc.wait(timeout=120)
            assert proc.returncode == 0
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
