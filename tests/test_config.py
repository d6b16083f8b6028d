import json

import numpy as np
import pytest

from instantvnr_tpu.config import (
    ModelConfig,
    load_model_config,
    loads_relaxed_json,
    model_config_from_dict,
)


REFERENCE_MODEL_JSON = """
{
    "optimizer": {
        "otype": "ExponentialDecay",
        "decay_start": 2000,
        "decay_interval": 1000,
        "decay_base": 0.99,
        "nested": {
            "otype": "Adam",
            "learning_rate": 5e-3,
            "beta1": 0.9,
            "beta2": 0.999,
            "epsilon": 1e-15,
            "l2_reg": 1e-6
        }
    },
    "loss": { "otype": "L1" },
    "encoding": {
        "otype": "HashGrid",
        "n_levels": 8,
        "n_features_per_level": 8,
        "log2_hashmap_size": 19,
        "base_resolution": 16
    },
    // a trailing comment like the reference example-model.json has
    "network": {
        "otype": "FullyFusedMLP",
        "activation": "ReLU",
        "n_neurons": 64,
        "n_hidden_layers": 4,
        "output_activation": "None"
    }
}
"""


def test_relaxed_json_strips_comments():
    obj = loads_relaxed_json('{"a": 1, // comment\n "b": "http://x" /* c */}')
    assert obj == {"a": 1, "b": "http://x"}


def test_model_config_parses_reference_schema():
    cfg = model_config_from_dict(loads_relaxed_json(REFERENCE_MODEL_JSON))
    assert cfg.encoding.n_levels == 8
    assert cfg.encoding.n_features_per_level == 8
    assert cfg.encoding.log2_hashmap_size == 19
    assert cfg.encoding.base_resolution == 16
    assert cfg.encoding.per_level_scale == 2.0  # tcnn default
    assert cfg.network.n_neurons == 64
    assert cfg.network.n_hidden_layers == 4
    assert cfg.optimizer.learning_rate == pytest.approx(5e-3)
    assert cfg.optimizer.epsilon == pytest.approx(1e-15)
    assert cfg.optimizer.decay_start == 2000
    assert cfg.loss.otype == "L1"


def test_model_config_roundtrip():
    cfg = model_config_from_dict(loads_relaxed_json(REFERENCE_MODEL_JSON))
    cfg2 = model_config_from_dict(cfg.to_json())
    assert cfg == cfg2


def test_scene_config_diva_dialect(tmp_path):
    from instantvnr_tpu.config import load_scene_config

    vol_file = tmp_path / "vol.raw"
    np.zeros((4, 4, 4), np.float32).tofile(vol_file)
    scene = {
        "volume": {
            "filename": str(vol_file),
            "dims": {"x": 4, "y": 4, "z": 4},
            "type": "FLOAT",
        }
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene))
    cfg = load_scene_config(str(p))
    assert cfg.volume.dims == (4, 4, 4)
    assert cfg.volume.np_dtype == np.float32
    assert cfg.volume.value_range is None  # no "range" → data-derived


def test_scene_config_diva_range_key(tmp_path):
    """diva scenes carry a 'range' normalization key (reference
    serializer.cpp:141-146, required there); both the {x,y} object and
    [lo,hi] array spellings parse into VolumeDesc.value_range."""
    from instantvnr_tpu.config import load_scene_config

    vol_file = tmp_path / "vol.raw"
    np.zeros((4, 4, 4), np.float32).tofile(vol_file)
    for spelling in ({"x": -3e4, "y": 7e5}, [-3e4, 7e5]):
        scene = {"volume": {"filename": str(vol_file),
                            "dims": {"x": 4, "y": 4, "z": 4},
                            "type": "FLOAT", "range": spelling}}
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(scene))
        cfg = load_scene_config(str(p))
        assert cfg.volume.value_range == (-3e4, 7e5)


def test_scene_config_vidi_dialect(tmp_path):
    from instantvnr_tpu.config import load_scene_config

    vol_file = tmp_path / "vol.raw"
    np.zeros((8, 6, 4), np.uint8).tofile(vol_file)
    scene = {
        "dataSource": [
            {
                "fileName": str(vol_file),
                "dimensions": {"x": 4, "y": 6, "z": 8},
                "type": "UNSIGNED_BYTE",
                "offset": 0,
                "endian": "LITTLE_ENDIAN",
            }
        ],
        "view": {
            "camera": {
                "eye": {"x": 0, "y": 0, "z": -2},
                "center": {"x": 0, "y": 0, "z": 0},
                "up": {"x": 0, "y": 1, "z": 0},
                "fovy": 45,
            },
            "volume": {
                "scalarMappingRange": {"minimum": 0.0, "maximum": 0.5},
                "transferFunction": {
                    "opacityControls": [
                        {"position": 0.0, "value": 0.0},
                        {"position": 1.0, "value": 1.0},
                    ],
                    "colorControls": [
                        {"position": 0.0, "r": 0.0, "g": 0.0, "b": 1.0},
                        {"position": 1.0, "r": 1.0, "g": 0.0, "b": 0.0},
                    ],
                },
            },
        },
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene))
    cfg = load_scene_config(str(p))
    assert cfg.volume.dims == (4, 6, 8)
    assert cfg.camera.fovy == 45
    # uint8 scalarMappingRange scales by 255 (serializer.cpp:222-226)
    assert cfg.tfn.range == (0.0, 0.5 * 255.0)
    assert len(cfg.tfn.alphas) == 2


def test_scene_config_diva_time_series(tmp_path):
    """A 'filename' ARRAY is a time series: one file per timestep
    (serializer.cpp:148-155 pushes each entry as a MultiVolume::File)."""
    from instantvnr_tpu.config import load_scene_config

    files = []
    for t in range(3):
        f = tmp_path / f"vol_t{t}.raw"
        np.full((4, 4, 4), t, np.float32).tofile(f)
        files.append(f.name)  # relative → resolved against the scene dir
    scene = {
        "volume": {
            "filename": files,
            "dims": {"x": 4, "y": 4, "z": 4},
            "type": "FLOAT",
        }
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(scene))
    cfg = load_scene_config(str(p))
    assert cfg.volume.n_timesteps == 3
    assert cfg.volume.filename == str(tmp_path / "vol_t0.raw")
    d1 = cfg.volume.at_timestep(1)
    assert d1.filename == str(tmp_path / "vol_t1.raw")
    assert d1.n_timesteps == 1
