"""Shared pytest fixtures.

Tests run on a virtual 8-device CPU mesh — the JAX analog of the reference's
mocked Accelerator seam (reference tests/test_training.py:62-77), except it
actually exercises the collectives (all_gather for global NT-Xent, psum for
metric reductions) instead of mocking them.
"""

import os

# Must be set before jax import anywhere in the test process.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# In this environment the axon TPU plugin ignores the JAX_PLATFORMS env var;
# only the config API reliably pins the backend to host CPU.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run over the TPU tunnel"

import json
from pathlib import Path

import numpy as np
import pytest
import yaml


TINY_MODEL = {
    "vision_model": "tiny-vit",
    "text_model": "tiny-gpt2",
    "projection_dim": 32,
    "temperature": 0.5,
    "dropout": 0.1,
    "freeze_vision_backbone": True,
    "freeze_text_backbone": False,
    "share_text_tower": False,
}


def make_config_dict(**overrides):
    cfg = {
        "data": {
            "conceptual_captions_path": "data/conceptual",
            "ultrafeedback_path": "data/preferences.json",
            "image_size": 32,
            "max_caption_length": 16,
            "train_split": 0.8,
            "val_split": 0.1,
            "test_split": 0.1,
            "num_workers": 0,
            "pin_memory": False,
            "prefetch_factor": 2,
        },
        "model": dict(TINY_MODEL),
        "training": {
            "stage1": {
                "batch_size": 4,
                "learning_rate": 1e-3,
                "weight_decay": 0.01,
                "num_epochs": 1,
                "warmup_steps": 2,
                "gradient_accumulation_steps": 1,
                "max_grad_norm": 1.0,
                "contrastive_loss_weight": 1.0,
            },
            "stage2": {
                "batch_size": 4,
                "learning_rate": 1e-4,
                "weight_decay": 0.01,
                "num_epochs": 1,
                "warmup_steps": 2,
                "gradient_accumulation_steps": 1,
                "max_grad_norm": 1.0,
                "preference_loss_weight": 1.0,
                "dpo_beta": 0.1,
                "reference_free": False,
                "length_normalized": False,
                "label_smoothing": 0.0,
            },
            "seed": 42,
            "logging_steps": 1,
            "early_stopping_patience": 3,
        },
        "evaluation": {
            "metrics": ["bleu", "rouge", "cider"],
            "generate_config": {
                "max_length": 16,
                "num_beams": 2,
                "temperature": 0.8,
                "do_sample": False,
                "top_p": 0.9,
                "repetition_penalty": 1.1,
                "length_penalty": 1.0,
            },
        },
        "targets": {
            "cider_score": 1.15,
            "preference_win_rate": 0.72,
            "human_eval_helpfulness": 4.2,
            "latency_ms_p95": 150,
        },
        "mesh": {"data": -1, "fsdp": 1, "model": 1},
        "pallas": {"enabled": False},
        "paths": {
            "output_dir": "./outputs",
            "cache_dir": "./cache",
            "log_dir": "./logs",
            "checkpoint_dir": "./checkpoints",
        },
    }
    for path, value in overrides.items():
        node = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return cfg


@pytest.fixture
def config_dict():
    return make_config_dict()


@pytest.fixture
def config(config_dict):
    from pgica_tpu.utils.config import Config

    return Config(config_dict=config_dict)


@pytest.fixture
def temp_config_file(tmp_path, config_dict):
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(config_dict))
    return path


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_model():
    """Shared tiny flagship-shaped model (session-scoped: init is jit-heavy)."""
    from pgica_tpu.data.tokenizer import CaptionTokenizer
    from pgica_tpu.models import PreferenceGuidedCaptioningModel

    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
        tokenizer=CaptionTokenizer(), max_caption_length=8, image_size=32, seed=0,
    )


def _write_image(path: Path, rng: np.random.Generator, size=(32, 32)):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size[0], size[1], 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def temp_dataset_dir(tmp_path, rng):
    """Caption dataset on disk: annotations.json + real image files."""
    root = tmp_path / "captions"
    (root / "images").mkdir(parents=True)
    records = []
    captions = [
        "a red bird sitting on a branch",
        "two dogs playing in the park",
        "a bowl of fresh fruit on a table",
        "a city skyline at night",
        "children flying a kite on the beach",
        "an old car parked near a barn",
        "a cup of coffee next to a laptop",
        "mountains covered in snow under blue sky",
    ]
    for i, cap in enumerate(captions):
        img = root / "images" / f"img_{i}.jpg"
        _write_image(img, rng)
        records.append({"image_path": f"images/img_{i}.jpg", "caption": cap})
    (root / "annotations.json").write_text(json.dumps(records))
    return root


@pytest.fixture
def temp_preference_dataset(tmp_path, rng):
    """Preference dataset on disk: preferences.json + image files."""
    root = tmp_path / "prefs"
    (root / "images").mkdir(parents=True)
    records = []
    for i in range(6):
        img = root / "images" / f"img_{i}.jpg"
        _write_image(img, rng)
        records.append(
            {
                "image_path": f"images/img_{i}.jpg",
                "preferred_caption": f"a detailed caption describing scene {i}",
                "rejected_caption": f"thing {i}",
                "preference_score": 0.9,
            }
        )
    (root / "preferences.json").write_text(json.dumps(records))
    return root / "preferences.json"


# ---------------------------------------------------------------------------
# Fast gate: `pytest -m "not slow"` (time re-measured each round; see
# PARITY.md C23 for the current number — the CP/ZeRO equivalence suites
# pushed the FULL suite past 45 min). Tests below were measured >=8 s each
# (jit-compile heavy: full trainer loops, 8-device mesh steps, end-to-end
# converters); the full suite runs them too, just not in the quick gate.
# Re-measure with `pytest -m "not slow" --durations=40`.
# ---------------------------------------------------------------------------

_SLOW_NODEIDS = (
    "test_integration_learning.py",                    # 300-step overfit proofs
    "test_training.py::TestTrainer",
    "test_training.py::TestStage1Step",
    "test_training.py::TestStage2Step",
    "test_training.py::TestGradientAccumulation",
    "test_training.py::TestReviewRegressions",
    "test_training.py::TestPreemptionRecovery",
    "test_training.py::TestContextParallelTrainer",
    "test_training.py::TestOptim::test_frozen_params_unchanged_after_step",
    "test_parallel.py::TestDCNAxis::test_stage1_and_stage2_step_on_dcn_mesh",
    "test_parallel.py::TestContextParallelStage2::test_train_step_matches_unsharded",
    "test_parallel.py::TestZero1",
    "test_parallel.py::TestContextParallelStage2::test_fused_ce_path_matches",
    "test_parallel.py::TestContextParallelStage2::test_cp_composed_with_data_parallelism",
    "test_parallel.py::TestContextParallelStage2::test_loss_and_grads_match_unsharded",
    "test_parallel.py::TestContextParallelLM::test_lm_forward_matches_unsharded",
    "test_training.py::TestZero1Trainer::test_stage1_trains_and_checkpoints",
    "test_training.py::TestZero1Trainer::test_stage2_trains_with_frozen_reference",
    "test_parallel.py::TestScaledConfigShapes",
    "test_parallel.py::TestShardedTraining",
    "test_parallel.py::TestVocabParallelFusedCE::test_grads_with_padded_vocab",
    "test_lora.py::test_lora_stage2_trains_adapters_only",
    "test_lora.py::test_lora_gradient_flows_and_changes_output",
    "test_convert.py::TestLoadPretrainedTowers::test_end_to_end_local_checkpoint_import",
    "test_model.py::TestComposedModel::test_gradient_flow_contrastive",
    "test_model.py::TestSharedTextTower",
    "test_metrics.py::TestRunner::test_run_evaluation_end_to_end",
    # round-4 trim (VERDICT item 9): the r3/r4 ZeRO-3 / scan-layers / CP x TP
    # equivalence suites pushed the "not slow" gate to ~18 min; each class
    # below was measured >=17 s (pytest --durations=40, 2026-08-19) and has a
    # faster sibling still in the gate (scan forward parity, packing wiring,
    # ring-attention forward, trainer smoke).
    "test_training.py::TestZero3Trainer",
    "test_training.py::TestDropUnusedTower::test_loss_identical_and_tower_merged_back",
    "test_training.py::TestStage0Warmup",
    "test_training.py::TestStage2ReferencePersistence",
    "test_scan_layers.py::TestZero3",
    "test_scan_layers.py::TestScanFSDP::test_stage1_and_stage2_steps_on_fsdp_mesh",
    "test_parallel.py::TestContextParallelStage2::test_tp_cp_composition_matches_unsharded",
    "test_parallel.py::TestRingAttention::test_grads_match_single_device",
    "test_packing.py::TestExactness",
    "test_cli_helpers.py::TestCaptionService::test_submit_batches_and_stats",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(frag in item.nodeid for frag in _SLOW_NODEIDS):
            item.add_marker(pytest.mark.slow)
