"""Golden-statistics regression tests: fixed scenes rendered through every
path, with image statistics pinned. Catches silent numeric drift in the
renderers (the reference had no tests at all — SURVEY §4 — so these pins
were captured from the verified round-1 implementation).

These pins are DRIFT DETECTORS only; correctness lives in the independent
NumPy marcher of tests/test_oracle.py. When an INTENTIONAL numerics change
lands (new TF classification, different sampling semantics), re-verify
against the oracle first, then regenerate the pins by printing the fresh
statistics and updating the approx() targets:

    python -m pytest tests/test_golden.py -q   # see which pins moved
    python - <<'PY'
    # rerun each test body by hand and print stats(img) — the fixtures
    # below are plain constructors, no hidden state
    PY
"""
import numpy as np
import pytest

from instantvnr_tpu.accel import macrocell as mcmod
from instantvnr_tpu.config import TransferFunctionConfig
from instantvnr_tpu.data import synthetic_volume
from instantvnr_tpu.render import RaymarchSettings, Renderer, reference_sample_fn
from instantvnr_tpu.render.camera import Camera
from instantvnr_tpu.render.decoded import DecodedRenderer
from instantvnr_tpu.utils.tfn import bake_transfer_function


@pytest.fixture(scope="module")
def scene():
    vol = synthetic_volume((32, 32, 32), kind="vorts", seed=0)
    tf = bake_transfer_function(TransferFunctionConfig())
    mc = mcmod.build(vol.data, vol.dims, tf)
    cam = Camera(eye=(5, 3, -66), center=(0, 0, 0), up=(0, 1, 0), fovy=45)
    return vol, tf, mc, cam


def stats(img):
    return (float(img[..., 3].mean()), float(img[..., :3].mean()),
            float(img.max()))


class TestGoldenStats:
    def test_raymarch_reference(self, scene):
        vol, tf, mc, cam = scene
        r = Renderer(24, 24, mc, tf, reference_sample_fn, sample_ctx=vol.data,
                     settings=RaymarchSettings(n_iters=8, max_supersteps=64),
                     seed=11)
        r.camera = cam
        r.render()
        a, rgb, mx = stats(r.mapframe())
        # pinned from the verified implementation (round 1)
        assert a == pytest.approx(0.1685, abs=0.015)
        assert rgb == pytest.approx(0.0562, abs=0.008)

    def test_slab_decoded(self, scene):
        vol, tf, mc, cam = scene
        r = DecodedRenderer(24, 24, mc, tf, vol.dims, initial_volume=vol.data)
        r.set_camera(cam)
        r.render()
        a, rgb, mx = stats(r.mapframe())
        assert a == pytest.approx(0.1636, abs=0.015)
        assert rgb == pytest.approx(0.0545, abs=0.008)
