"""Config manager tests (reference behavior: src/.../utils/config.py:11-256)."""

import pytest

from pgica_tpu.utils.config import Config, coerce_env_value


def test_load_from_file(temp_config_file):
    cfg = Config(temp_config_file)
    assert cfg.get("data.image_size") == 32
    assert cfg.get("model.projection_dim") == 32


def test_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        Config(tmp_path / "nope.yaml")


@pytest.mark.parametrize("section", ["data", "model", "training", "evaluation", "targets"])
def test_missing_required_section(config_dict, section):
    del config_dict[section]
    with pytest.raises(ValueError, match=section):
        Config(config_dict=config_dict)


def test_missing_required_key(config_dict):
    del config_dict["model"]["projection_dim"]
    with pytest.raises(ValueError, match="projection_dim"):
        Config(config_dict=config_dict)


def test_missing_stage(config_dict):
    del config_dict["training"]["stage2"]
    with pytest.raises(ValueError, match="stage1 and stage2"):
        Config(config_dict=config_dict)


def test_dot_get_set(config):
    assert config.get("training.stage1.batch_size") == 4
    assert config.get("nonexistent.path", "fallback") == "fallback"
    config.set("training.stage1.batch_size", 16)
    assert config.get("training.stage1.batch_size") == 16
    config.set("brand.new.key", 7)
    assert config.get("brand.new.key") == 7


def test_stage_accessors(config):
    assert config.get_stage1_config()["learning_rate"] == pytest.approx(1e-3)
    assert config.get_stage2_config()["dpo_beta"] == pytest.approx(0.1)
    assert config.get_targets()["cider_score"] == pytest.approx(1.15)


def test_env_override(config_dict, monkeypatch):
    monkeypatch.setenv("CAPTION_ALIGNMENT_BATCH_SIZE", "64")
    monkeypatch.setenv("CAPTION_ALIGNMENT_LEARNING_RATE", "3e-4")
    monkeypatch.setenv("CAPTION_ALIGNMENT_PIN_MEMORY", "false")
    cfg = Config(config_dict=config_dict)
    assert cfg.get("training.stage1.batch_size") == 64
    assert cfg.get("training.stage1.learning_rate") == pytest.approx(3e-4)
    assert cfg.get("data.pin_memory") is False


def test_coerce_env_value():
    assert coerce_env_value("true") is True
    assert coerce_env_value("OFF") is False
    assert coerce_env_value("42") == 42
    assert coerce_env_value("1.5") == pytest.approx(1.5)
    assert coerce_env_value("5e-5") == pytest.approx(5e-5)
    assert coerce_env_value("hello") == "hello"


def test_save_roundtrip(config, tmp_path):
    out = tmp_path / "saved" / "config.yaml"
    config.set("training.stage1.num_epochs", 3)
    config.save(out)
    reloaded = Config(out)
    assert reloaded.get("training.stage1.num_epochs") == 3


def test_default_yaml_is_valid():
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    for name in ("default.yaml", "ablation.yaml"):
        cfg = Config(root / "configs" / name)
        assert cfg.get("model.vision_model") == "openai/clip-vit-base-patch32"
    abl = Config(root / "configs" / "ablation.yaml")
    assert abl.get("training.stage2.num_epochs") == 0
    assert abl.get("targets.cider_score") == pytest.approx(1.10)
