"""Functional LoRA adapter tests (reference peft usage, model.py:352-394)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models import PreferenceGuidedCaptioningModel
from pgica_tpu.models.lora import apply_lora, count_lora_params, init_lora


@pytest.fixture(scope="module")
def model():
    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
        tokenizer=CaptionTokenizer(), max_caption_length=8, image_size=32, seed=0,
    )


def test_init_targets_only_attention_kernels(model):
    lora = init_lora(model.params, jax.random.PRNGKey(0), rank=4)
    assert lora, "no LoRA targets found"
    assert all(p.endswith("/kernel") for p in lora)
    assert all("q_proj" in p or "v_proj" in p for p in lora)
    assert count_lora_params(lora) > 0


def test_zero_init_is_identity(model):
    lora = init_lora(model.params, jax.random.PRNGKey(0), rank=4)
    merged = apply_lora(model.params, lora, alpha=32.0, rank=4)
    q = model.params["text_encoder"]["backbone"]["block_0"]["attn"]["q_proj"]["kernel"]
    q2 = merged["text_encoder"]["backbone"]["block_0"]["attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q2))  # B=0 -> no-op


def test_lora_gradient_flows_and_changes_output(model):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 250, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)

    lora = init_lora(model.params, jax.random.PRNGKey(0), rank=4)

    def loss_fn(lora_params):
        merged = apply_lora(model.params, lora_params, alpha=32.0, rank=4)
        out = model.module.apply({"params": merged}, images, ids, mask, mode="contrastive")
        return jnp.sum(out["image_embeddings"] * out["text_embeddings"])

    grads = jax.grad(loss_fn)(lora)
    total = sum(float(jnp.abs(g).sum()) for a, b in grads.values() for g in (a, b))
    assert total > 0

    # a perturbed adapter actually changes the model output
    perturbed = {k: (a, b + 0.1) for k, (a, b) in lora.items()}
    merged = apply_lora(model.params, perturbed, alpha=32.0, rank=4)
    out0 = model.module.apply({"params": model.params}, images, ids, mask, mode="contrastive")
    out1 = model.module.apply({"params": merged}, images, ids, mask, mode="contrastive")
    assert not np.allclose(
        np.asarray(out0["text_embeddings"]), np.asarray(out1["text_embeddings"])
    )

# ---------------------------------------------------------------- end-to-end


def _lora_config_dict():
    from pgica_tpu.models.lora import normalize_lora_config

    return normalize_lora_config(
        {"r": 4, "lora_alpha": 8, "target_modules": ["c_attn", "c_proj"], "lora_dropout": 0.0}
    )


def test_normalize_lora_config_translates_peft_names():
    cfg = _lora_config_dict()
    assert cfg["rank"] == 4 and cfg["alpha"] == 8.0
    assert set(cfg["targets"]) == {"q_proj", "k_proj", "v_proj", "out_proj", "fc_out"}
    from pgica_tpu.models.lora import normalize_lora_config

    assert normalize_lora_config(None) is None
    assert normalize_lora_config({}) is None


def test_scope_excludes_vision_tower(model):
    lora = init_lora(model.params, jax.random.PRNGKey(0), rank=4)
    assert lora and not any(p.startswith("vision_encoder") for p in lora)


def test_lora_roundtrip_tree_encoding(model):
    from pgica_tpu.models.lora import lora_from_tree, lora_to_tree

    lora = init_lora(model.params, jax.random.PRNGKey(0), rank=4)
    back = lora_from_tree(lora_to_tree(lora))
    assert set(back) == set(lora)
    for k in lora:
        np.testing.assert_array_equal(np.asarray(lora[k][0]), np.asarray(back[k][0]))


def test_lora_stage2_trains_adapters_only(tmp_path):
    """End-to-end: a LoRA stage-2 run updates ONLY adapter factors, keeps the
    base frozen, checkpoints base+factors, and restores them (VERDICT item 2)."""
    from pgica_tpu.training.checkpoint import CheckpointManager, effective_params
    from pgica_tpu.training.trainer import PreferenceGuidedTrainer
    from pgica_tpu.utils.config import Config
    from pgica_tpu.utils.factories import DummyPreferenceDataset, create_processors
    from pgica_tpu.data.loader import DataLoader

    cfg = Config("configs/smoke.yaml")
    cfg.set("model.lora_config", {"r": 4, "lora_alpha": 8, "target_modules": ["c_attn"]})
    cfg.set("training.stage2.num_epochs", 1)
    cfg.set("training.load_best_model_at_end", False)
    cfg.set("paths.output_dir", str(tmp_path / "out"))
    cfg.set("paths.checkpoint_dir", str(tmp_path / "ckpt"))

    from pgica_tpu.utils.factories import create_model, create_tokenizer

    tokenizer = create_tokenizer(cfg)
    model = create_model(cfg, tokenizer)
    assert model.lora is not None and model.lora_config["rank"] == 4

    image_processor, text_processor = create_processors(cfg, tokenizer)
    ds = DummyPreferenceDataset(image_processor, text_processor, num_samples=8, seed=0)
    loader = DataLoader(ds, batch_size=4)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), model.params)
    lora_before = jax.tree.map(lambda x: np.asarray(x).copy(), model.lora)

    trainer = PreferenceGuidedTrainer(
        model, cfg, preference_train_loader=loader, preference_val_loader=loader,
        output_dir=str(tmp_path / "out"),
    )
    trainer.train_stage2()

    # base untouched, adapters moved
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(base_before),
        jax.tree_util.tree_leaves_with_path(model.params),
    ):
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=str(pa))
    moved = any(
        not np.allclose(np.asarray(lora_before[k][1]), np.asarray(model.lora[k][1]))
        for k in lora_before
    )
    assert moved, "no adapter factor changed during LoRA training"

    # checkpoint carries base + factors; effective_params merges them
    ckpt = CheckpointManager(tmp_path / "ckpt").restore("checkpoint_stage2_epoch0")
    assert ckpt.get("lora"), "LoRA factors missing from checkpoint"
    merged = effective_params(ckpt)
    q_base = base_before["caption_decoder"]["lm"]["block_0"]["attn"]["q_proj"]["kernel"]
    q_merged = np.asarray(merged["caption_decoder"]["lm"]["block_0"]["attn"]["q_proj"]["kernel"])
    assert not np.allclose(q_base, q_merged), "merged params identical to base"


class TestLoraDropout:
    """lora_dropout as adapter-input DropConnect (reference peft schema
    lora_dropout, configs/default.yaml:24-29; deviation documented in
    models/lora.py:apply_lora)."""

    def _nonzero_lora(self, model, rank=4):
        lora = init_lora(model.params, jax.random.PRNGKey(0), rank=rank)
        # make B nonzero so the delta (and hence the mask) is observable
        return {p: (a, jnp.ones_like(b) * 0.1) for p, (a, b) in lora.items()}

    def test_rng_none_disables_dropout(self, model):
        lora = self._nonzero_lora(model)
        m1 = apply_lora(model.params, lora, alpha=8.0, rank=4, dropout=0.5, rng=None)
        m2 = apply_lora(model.params, lora, alpha=8.0, rank=4)
        for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dropout_masks_rows_with_inverted_scaling(self, model):
        lora = self._nonzero_lora(model)
        path = sorted(lora)[0]
        sub = {path: lora[path]}
        rng = jax.random.PRNGKey(3)
        dropped = apply_lora(model.params, sub, alpha=8.0, rank=4, dropout=0.5, rng=rng)
        plain = apply_lora(model.params, sub, alpha=8.0, rank=4)
        base = model.params
        get = lambda t: np.asarray(
            jax.tree_util.tree_flatten_with_path(t)[0][
                [i for i, (kp, _) in enumerate(jax.tree_util.tree_flatten_with_path(base)[0])
                 if "/".join(str(getattr(k, "key", k)) for k in kp) == path][0]
            ][1]
        )
        d_drop = get(dropped) - get(base)
        d_plain = get(plain) - get(base)
        # every input row is either zeroed or scaled by exactly 1/keep
        row_drop = np.abs(d_drop).sum(axis=tuple(range(1, d_drop.ndim)))
        row_plain = np.abs(d_plain).sum(axis=tuple(range(1, d_plain.ndim)))
        zeroed = row_drop < 1e-7
        kept = ~zeroed
        assert zeroed.any() and kept.any(), "p=0.5 mask should mix kept/dropped rows"
        np.testing.assert_allclose(row_drop[kept], row_plain[kept] * 2.0, rtol=1e-4)

    def test_train_step_dropout_changes_loss_and_resamples(self, model):
        from pgica_tpu.training.train_step import stage1_loss_fn

        lora = self._nonzero_lora(model)
        rng = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
            "caption_ids": jnp.asarray(rng.integers(0, 64, (2, 8)).astype(np.int32)),
            "caption_mask": jnp.ones((2, 8), jnp.int32),
        }
        def loss(key, dropout):
            l, _ = stage1_loss_fn(
                lora, batch, key, model.module, 0.07, False, None,
                model.params, (8.0, 4, dropout),
            )
            return float(l)

        k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
        assert loss(k1, 0.9) != loss(k1, 0.0), "dropout inert in the train step"
        assert loss(k1, 0.9) != loss(k2, 0.9), "mask not resampled across rng keys"
        # the 2-tuple static form still works (back-compat, no dropout)
        l2, _ = stage1_loss_fn(
            lora, batch, k1, model.module, 0.07, False, None, model.params, (8.0, 4),
        )
        assert np.isfinite(float(l2))
