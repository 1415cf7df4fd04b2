from pathlib import Path

import pytest
import yaml

from deepcoro_clip_tpu.configs import ClipConfig, LinearProbingConfig
from deepcoro_clip_tpu.configs.parser import parse_config
from deepcoro_clip_tpu.registry import register_all

register_all()

REFERENCE_CLIP_YAML = Path("/root/reference/config/clip/base_config.yaml")


def test_from_dict_coercion_and_extra():
    cfg = ClipConfig.from_dict(
        {
            "epochs": "5",
            "lr": "0.001",
            "multi_video": "true",
            "recall_k": [1, 5],
            "unknown_key": 123,
        }
    )
    assert cfg.epochs == 5 and isinstance(cfg.epochs, int)
    assert cfg.lr == pytest.approx(1e-3)
    assert cfg.multi_video is True
    assert cfg.recall_k == [1, 5]
    assert cfg.get("unknown_key") == 123


@pytest.mark.skipif(not REFERENCE_CLIP_YAML.exists(), reason="no reference mount")
def test_reference_yaml_loads_directly():
    """Config portability contract: reference YAMLs load as-is (SURVEY.md §7)."""
    cfg = ClipConfig.from_yaml(REFERENCE_CLIP_YAML)
    assert cfg.pipeline_project == "DeepCORO_clip"
    assert cfg.frames == 16
    assert cfg.model_name == "mvit"
    assert cfg.recall_k == [1, 5, 10, 50]
    assert cfg.temperature == pytest.approx(0.05881384886977135)


def test_parser_cli_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    yaml.safe_dump(
        {"pipeline_project": "DeepCORO_clip", "epochs": 3, "lr": 0.01}, p.open("w")
    )
    cfg = parse_config(
        ["--base_config", str(p), "--epochs", "9", "--loss_name", "siglip"]
    )
    assert isinstance(cfg, ClipConfig)
    assert cfg.epochs == 9
    assert cfg.lr == pytest.approx(0.01)
    assert cfg.loss_name == "siglip"
    assert cfg.world_size >= 1


def test_parser_selects_pipeline_class(tmp_path):
    p = tmp_path / "lp.yaml"
    yaml.safe_dump(
        {
            "pipeline_project": "DeepCORO_video_linear_probing",
            "head_structure": {"stenosis": 1},
            "loss_structure": {"stenosis": "huber"},
        },
        p.open("w"),
    )
    cfg = parse_config(["--base_config", str(p)])
    assert isinstance(cfg, LinearProbingConfig)
    assert cfg.head_structure == {"stenosis": 1}


def test_save_roundtrip(tmp_path):
    cfg = ClipConfig.from_dict({"epochs": 4, "custom_field": "abc"})
    cfg.save_yaml(tmp_path / "out.yaml")
    loaded = ClipConfig.from_yaml(tmp_path / "out.yaml")
    assert loaded.epochs == 4
    assert loaded.get("custom_field") == "abc"
