"""Trainer and train-step tests (mirrors reference tests/test_training.py).

The reference mocks Accelerate (test_training.py:62-77); here the distributed
seam is a REAL 8-device CPU mesh exercising actual collectives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pgica_tpu.data.loader import DataLoader
from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models import PreferenceGuidedCaptioningModel
from pgica_tpu.training.optim import create_optimizer, freeze_labels, warmup_cosine_schedule
from pgica_tpu.training.train_step import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
    stage1_loss_fn,
)
from pgica_tpu.training.trainer import PreferenceGuidedTrainer
from pgica_tpu.utils.config import Config

SEQ, PROJ, IMG, B = 10, 16, 32, 4


@pytest.fixture(scope="module")
def tokenizer():
    return CaptionTokenizer()


@pytest.fixture()
def model(tokenizer):
    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
        tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
    )


def contrastive_batch(tokenizer, n=B, seed=0):
    rng = np.random.default_rng(seed)
    ids, mask = tokenizer.encode_batch([f"caption {i} words" for i in range(n)], SEQ)
    return {
        "image": jnp.asarray(rng.normal(size=(n, IMG, IMG, 3)).astype(np.float32)),
        "caption_ids": jnp.asarray(ids),
        "caption_mask": jnp.asarray(mask),
    }


def preference_batch(tokenizer, n=B, seed=0):
    rng = np.random.default_rng(seed)
    p_ids, p_mask = tokenizer.encode_batch([f"a good long caption {i}" for i in range(n)], SEQ)
    r_ids, r_mask = tokenizer.encode_batch([f"bad {i}" for i in range(n)], SEQ)
    return {
        "image": jnp.asarray(rng.normal(size=(n, IMG, IMG, 3)).astype(np.float32)),
        "preferred_ids": jnp.asarray(p_ids),
        "preferred_mask": jnp.asarray(p_mask),
        "rejected_ids": jnp.asarray(r_ids),
        "rejected_mask": jnp.asarray(r_mask),
    }


class TestOptim:
    def test_schedule_warmup_and_decay(self):
        sched = warmup_cosine_schedule(1e-3, warmup_steps=10, total_steps=100)
        assert float(sched(0)) == pytest.approx(0.0, abs=1e-6)
        assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
        assert float(sched(99)) < 1e-4

    def test_freeze_labels(self, model):
        labels = freeze_labels(model.params, True, False)
        assert labels["vision_encoder"]["backbone"]["cls_token"] == "frozen"
        assert labels["text_encoder"]["backbone"]["wte"]["embedding"] == "train"
        assert labels["caption_decoder"]["lm"]["wte"]["embedding"] == "train"

    def test_frozen_params_unchanged_after_step(self, model, tokenizer):
        opt = create_optimizer(
            1e-2, total_steps=10, warmup_steps=1, params_for_freezing=model.params,
            freeze_vision_backbone=True,
        )
        state = TrainState.create(model.params, opt)
        step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))
        before_frozen = np.asarray(model.params["vision_encoder"]["backbone"]["cls_token"])
        before_train = np.asarray(model.params["text_encoder"]["projection"]["fc1"]["kernel"])
        for _ in range(3):  # step 0 has lr=0 (warmup), so take a few steps
            state, _ = step(state, contrastive_batch(tokenizer), jax.random.PRNGKey(0))
        np.testing.assert_array_equal(
            np.asarray(state.params["vision_encoder"]["backbone"]["cls_token"]), before_frozen
        )
        assert not np.allclose(
            np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"]), before_train
        )


class TestStage1Step:
    def test_gradients_flow_and_update_params(self, tokenizer):
        """Finite nonzero grads reach both towers; params move; steps vary.

        (Short-horizon loss *descent* is init-luck at tiny scale — the actual
        learning proof is tests/test_integration_learning.py, which overfits
        to near-perfect retrieval over 300 steps.)
        """
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            freeze_vision_backbone=False,
        )
        batch = contrastive_batch(tokenizer)
        grads = jax.grad(
            lambda p: stage1_loss_fn(p, batch, jax.random.PRNGKey(0), model.module, 0.5, False)[0]
        )(model.params)
        for tower in ("vision_encoder", "text_encoder"):
            norm = float(optax.global_norm(grads[tower]))
            assert np.isfinite(norm) and norm > 0, f"dead gradient in {tower}"

        opt = create_optimizer(5e-3, total_steps=60, warmup_steps=1)
        state = TrainState.create(model.params, opt)
        step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))
        before = np.asarray(model.params["text_encoder"]["projection"]["fc1"]["kernel"])
        losses = []
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(metrics["loss"]))
        assert not np.allclose(
            np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"]), before
        )
        assert len(set(losses)) > 1, "loss frozen across updates"

    def test_nan_batch_skipped(self, model, tokenizer):
        """NaN input -> update skipped, params unchanged, counter bumped."""
        opt = create_optimizer(1e-3, total_steps=10, warmup_steps=1)
        state = TrainState.create(model.params, opt)
        step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))
        batch = contrastive_batch(tokenizer)
        bad = dict(batch)
        bad["image"] = batch["image"].at[0, 0, 0, 0].set(jnp.nan)
        before = np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"])
        state, metrics = step(state, bad, jax.random.PRNGKey(0))
        assert int(state.skipped) == 1
        np.testing.assert_array_equal(
            np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"]), before
        )
        # recovery: a clean batch still trains
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert int(state.skipped) == 1
        assert np.isfinite(float(metrics["loss"]))

    def test_augmentation_uses_rng(self, model, tokenizer):
        loss_a = stage1_loss_fn(
            model.params, contrastive_batch(tokenizer), jax.random.PRNGKey(0),
            model.module, 0.5, True,
        )[0]
        loss_b = stage1_loss_fn(
            model.params, contrastive_batch(tokenizer), jax.random.PRNGKey(1),
            model.module, 0.5, True,
        )[0]
        assert float(loss_a) != float(loss_b)


class TestStage2Step:
    def test_dpo_step_runs_and_improves_margin(self, model, tokenizer):
        opt = create_optimizer(5e-3, total_steps=30, warmup_steps=1)
        params = model.params
        ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        state = TrainState.create(params, opt)
        step = jax.jit(
            make_stage2_train_step(model.module, opt, beta=0.5, augment=False)
        )
        batch = preference_batch(tokenizer)
        margins = []
        for _ in range(10):
            state, metrics = step(state, ref_params, batch, jax.random.PRNGKey(0))
            margins.append(float(metrics["reward_margin"]))
        assert margins[-1] > margins[0]
        assert float(metrics["loss"]) < float(np.log(2)) + 0.1  # below chance

    def test_reference_free_variant(self, model, tokenizer):
        opt = create_optimizer(1e-3, total_steps=10, warmup_steps=1)
        state = TrainState.create(model.params, opt)
        step = jax.jit(
            make_stage2_train_step(
                model.module, opt, beta=0.1, reference_free=True,
                length_normalized=True, augment=False,
            )
        )
        state, metrics = step(state, None, preference_batch(tokenizer), jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


class _ListDS:
    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture
def tiny_trainer(model, tokenizer, config_dict, tmp_path):
    config_dict["training"]["stage1"]["num_epochs"] = 1
    config_dict["training"]["stage2"]["num_epochs"] = 1
    config_dict["paths"] = {
        "output_dir": str(tmp_path / "out"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
    }
    cfg = Config(config_dict=config_dict)

    def np_batchify(batch_fn, n_batches):
        items = []
        for b in range(n_batches):
            batch = batch_fn(tokenizer, n=B, seed=b)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        return items

    c_items = np_batchify(contrastive_batch, 2)
    p_items = np_batchify(preference_batch, 2)
    return PreferenceGuidedTrainer(
        model, cfg,
        train_loader=DataLoader(_ListDS(c_items), B, shuffle=True, drop_last=True, prefetch=0),
        val_loader=DataLoader(_ListDS(c_items[:B]), B, prefetch=0),
        preference_train_loader=DataLoader(_ListDS(p_items), B, drop_last=True, prefetch=0),
        preference_val_loader=DataLoader(_ListDS(p_items[:B]), B, prefetch=0),
        output_dir=str(tmp_path / "out"),
    )


class TestTrainer:
    def test_full_pipeline(self, tiny_trainer):
        results = tiny_trainer.train()
        assert np.isfinite(results["stage1"]["best_val_loss"])
        assert np.isfinite(results["stage2"]["best_val_loss"])
        # per-stage best tracking (fixes reference shared-state bug §2.4.6)
        assert tiny_trainer.best_val_loss[1] != float("inf")
        assert tiny_trainer.best_val_loss[2] != float("inf")
        # starvation detector: every epoch records its loader-wait fraction,
        # and results.json surfaces the worst one (round-4 verdict item 8)
        import json as _json

        for stage in ("stage1", "stage2"):
            for rec in tiny_trainer.history[stage]:
                assert 0.0 <= rec["input_wait_fraction"] <= 1.0
        payload = _json.loads((tiny_trainer.output_dir / "results.json").read_text())
        assert 0.0 <= payload["input_wait_fraction"] <= 1.0

    def test_checkpoint_roundtrip(self, tiny_trainer):
        tiny_trainer.train_stage1()
        before = np.asarray(
            tiny_trainer.model.params["text_encoder"]["projection"]["fc1"]["kernel"]
        ).copy()
        # clobber params, restore, verify
        tiny_trainer.model.params = jax.tree.map(jnp.zeros_like, tiny_trainer.model.params)
        meta = tiny_trainer.load_checkpoint("best_model_stage1")
        after = np.asarray(
            tiny_trainer.model.params["text_encoder"]["projection"]["fc1"]["kernel"]
        )
        np.testing.assert_array_equal(before, after)
        assert meta["stage"] == 1

    def test_early_stopping_counter(self, tiny_trainer):
        tiny_trainer.best_val_loss[1] = 0.1
        assert tiny_trainer._check_early_stopping(1, 0.5, 0) == 1
        assert tiny_trainer._check_early_stopping(1, 0.5, 1) == 2
        assert tiny_trainer._check_early_stopping(1, 0.05, 2) == 0

    def test_stage2_disabled(self, tiny_trainer):
        tiny_trainer.config.set("training.stage2.num_epochs", 0)
        out = tiny_trainer.train_stage2()
        assert out.get("skipped") is True


class TestDropUnusedTower:
    """training.stage2.drop_unused_tower: the contrastive text tower is held
    out of the stage-2 policy/reference trees (it is outside the generation
    graph; dropping it is loss-identical) and merged back on every sync."""

    def _build(self, tokenizer, config_dict, tmp_path, sub, drop):
        import copy

        cfg_d = copy.deepcopy(config_dict)
        cfg_d["training"]["stage2"]["drop_unused_tower"] = drop
        cfg_d["training"]["stage2"]["num_epochs"] = 1
        cfg_d["paths"] = {
            "output_dir": str(tmp_path / sub / "out"),
            "checkpoint_dir": str(tmp_path / sub / "ckpt"),
        }
        mdl = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
        )
        items = []
        for b in range(2):
            batch = preference_batch(tokenizer, n=B, seed=b)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        trainer = PreferenceGuidedTrainer(
            mdl, Config(config_dict=cfg_d),
            preference_train_loader=DataLoader(
                _ListDS(items), B, drop_last=True, prefetch=0
            ),
            preference_val_loader=DataLoader(_ListDS(items[:B]), B, prefetch=0),
            output_dir=cfg_d["paths"]["output_dir"],
        )
        return mdl, trainer

    def test_loss_identical_and_tower_merged_back(self, tokenizer, config_dict, tmp_path):
        model_a, tr_a = self._build(tokenizer, config_dict, tmp_path, "full", False)
        model_b, tr_b = self._build(tokenizer, config_dict, tmp_path, "drop", True)
        tower_before = jax.tree.map(np.asarray, model_b.params["text_encoder"])

        tr_a.train_stage2()
        tr_b.train_stage2()

        # The dropped tower is outside stage 2's gradient AND forward graphs,
        # so every train/val loss must match the full-tree run.
        for key in ("train_loss", "val_loss"):
            la = [r[key] for r in tr_a.history["stage2"]]
            lb = [r[key] for r in tr_b.history["stage2"]]
            np.testing.assert_allclose(lb, la, rtol=1e-6, err_msg=key)

        # Merge-back: the model carries the full tree again, tower bit-exact.
        assert "text_encoder" in model_b.params
        jax.tree.map(
            np.testing.assert_array_equal, tower_before,
            jax.tree.map(np.asarray, model_b.params["text_encoder"]),
        )
        # Same trajectory: the trained decoder ends up identical either way.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            ),
            model_a.params["caption_decoder"], model_b.params["caption_decoder"],
        )
        # Checkpoints carry the full tree: clobber, restore, compare.
        model_b.params = jax.tree.map(jnp.zeros_like, model_b.params)
        tr_b.load_checkpoint("best_model_stage2")
        jax.tree.map(
            np.testing.assert_array_equal, tower_before,
            jax.tree.map(np.asarray, model_b.params["text_encoder"]),
        )

    def test_rejected_under_zero_paths(self, tokenizer, config_dict, tmp_path):
        _, tr = self._build(tokenizer, config_dict, tmp_path, "z", True)
        tr.config.set("mesh.zero1", True)
        with pytest.raises(ValueError):
            tr.train_stage2()


class TestGradientAccumulation:
    def test_params_update_only_every_k_steps(self, model, tokenizer):
        opt = create_optimizer(
            1e-2, total_steps=10, warmup_steps=0, gradient_accumulation_steps=2
        )
        state = TrainState.create(model.params, opt)
        step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))
        batch = contrastive_batch(tokenizer)
        before = np.asarray(model.params["text_encoder"]["projection"]["fc1"]["kernel"])

        state, _ = step(state, batch, jax.random.PRNGKey(0))
        mid = np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"])
        np.testing.assert_array_equal(mid, before)  # accumulating, no update yet

        # 3 more micro-steps = 2 applied updates; the first lands in warmup
        # (lr ~ 0) so check after the second.
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(0))
        after = np.asarray(state.params["text_encoder"]["projection"]["fc1"]["kernel"])
        assert not np.allclose(after, before)


class TestReviewRegressions:
    def test_epoch_mean_excludes_nan_skipped(self, tiny_trainer, tokenizer):
        """A poisoned batch must not corrupt the epoch train-loss average."""
        items = tiny_trainer.train_loader.dataset
        # poison one item's image with NaN
        poisoned = items[0]
        poisoned["image"] = np.full_like(poisoned["image"], np.nan)
        result = tiny_trainer.train_stage1()
        assert np.isfinite(result["history"][0]["train_loss"])

    def test_checkpoint_carries_opt_state_and_resumes(self, tiny_trainer):
        tiny_trainer.train_stage1()
        payload = tiny_trainer.checkpoints.restore("checkpoint_stage1_epoch0")
        assert "opt_state" in payload  # Adam moments + schedule counter saved
        tiny_trainer.load_checkpoint("checkpoint_stage1_epoch0")
        assert tiny_trainer._restored_opt_state is not None
        # next stage start consumes it without error
        tiny_trainer.train_stage1()


class TestPreemptionRecovery:
    """Async mid-epoch autosave + resume (VERDICT item 8)."""

    def _make_trainer(self, tokenizer, tmp_path, save_steps):
        from pgica_tpu.utils.config import Config

        cfg = Config("configs/smoke.yaml")
        cfg.set("training.stage1.num_epochs", 2)
        cfg.set("training.save_steps", save_steps)
        cfg.set("training.save_strategy", "steps")
        cfg.set("training.load_best_model_at_end", False)
        cfg.set("paths.checkpoint_dir", str(tmp_path / "ckpt"))
        model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
        )

        class _Ds:
            def __init__(self, n):
                rng = np.random.default_rng(0)
                self.images = rng.normal(size=(n, IMG, IMG, 3)).astype(np.float32)
                ids, mask = tokenizer.encode_batch([f"cap {i}" for i in range(n)], SEQ)
                self.ids, self.mask = ids, mask

            def __len__(self):
                return len(self.images)

            def __getitem__(self, i):
                return {
                    "image": self.images[i], "caption_ids": self.ids[i],
                    "caption_mask": self.mask[i], "raw_caption": "", "image_path": "",
                }

        loader = DataLoader(_Ds(16), batch_size=4, shuffle=True, seed=7)
        return PreferenceGuidedTrainer(
            model, cfg, train_loader=loader, val_loader=None,
            output_dir=str(tmp_path / "out"),
        ), cfg

    def test_autosave_written_and_mid_epoch_resume(self, tokenizer, tmp_path):
        trainer, cfg = self._make_trainer(tokenizer, tmp_path, save_steps=3)
        trainer.train_stage1()  # 2 epochs x 4 steps = 8 steps; autosaves at 3, 6
        trainer.checkpoints.wait()
        auto = tmp_path / "ckpt" / "autosave_stage1"
        assert auto.exists(), "autosave checkpoint missing"
        payload = trainer.checkpoints.restore(auto)
        meta = payload["meta"]
        assert meta["global_step"] == 6 and meta["step_in_epoch"] == 2 and meta["epoch"] == 1

        # Resume from the autosave: must restart INSIDE epoch 1 at step 2,
        # running only the remaining 2 steps of epoch 1.
        trainer2, _ = self._make_trainer(tokenizer, tmp_path, save_steps=0)
        trainer2.load_checkpoint(auto)
        assert trainer2.global_step == 6
        trainer2.train_stage1()
        assert trainer2.global_step == 8, "resume should complete exactly the remaining steps"
        assert trainer2.current_epoch == 1

    def test_epoch_checkpoint_resumes_next_epoch(self, tokenizer, tmp_path):
        trainer, cfg = self._make_trainer(tokenizer, tmp_path, save_steps=0)
        trainer.train_stage1()
        ck = tmp_path / "ckpt" / "checkpoint_stage1_epoch0"
        assert ck.exists()
        trainer2, _ = self._make_trainer(tokenizer, tmp_path, save_steps=0)
        trainer2.load_checkpoint(ck)
        trainer2.train_stage1()  # should run only epoch 1 (4 steps)
        assert trainer2.global_step == 4 + 4  # restored 4 + one epoch

    def test_loader_set_epoch_reproduces_order(self, tokenizer):
        from pgica_tpu.data.loader import DataLoader as DL

        class _Tiny:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                return {"x": np.asarray([i], np.int64)}

        a = DL(_Tiny(), batch_size=2, shuffle=True, seed=3, prefetch=0)
        b = DL(_Tiny(), batch_size=2, shuffle=True, seed=3, prefetch=0)
        a.set_epoch(5)
        b.set_epoch(5)
        order_a = [batch["x"].ravel().tolist() for batch in a]
        order_b = [batch["x"].ravel().tolist() for batch in b]
        assert order_a == order_b

    def test_optimizer_state_actually_resumes(self, tokenizer, tmp_path, caplog):
        """Regression: orbax flattens optax namedtuples to dicts; the resume
        path must rebuild the typed state (Adam moments + schedule count), not
        silently fall back to a fresh optimizer."""
        import logging as _logging

        trainer, _ = self._make_trainer(tokenizer, tmp_path, save_steps=3)
        trainer.train_stage1()
        trainer.checkpoints.wait()
        trainer2, _ = self._make_trainer(tokenizer, tmp_path, save_steps=0)
        trainer2.load_checkpoint(tmp_path / "ckpt" / "autosave_stage1")
        with caplog.at_level(_logging.INFO, logger="pgica_tpu.training.trainer"):
            trainer2.train_stage1()
        messages = " ".join(r.message for r in caplog.records)
        assert "Resumed optimizer state" in messages, messages
        assert "starting fresh" not in messages


class TestContextParallelTrainer:
    """mesh.seq > 1 routes stage 2 through the CP shard_map step."""

    def test_stage2_trains_under_seq_mesh(self, model, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 1
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("data.max_caption_length", SEQ)
        cfg.set("mesh.seq", 2)

        items = []
        for b in range(2):
            batch = preference_batch(tokenizer, n=B, seed=b)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        mesh = MeshContext(data=4, seq=2)
        assert mesh.shape["seq"] == 2
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            preference_train_loader=DataLoader(_ListDS(items), B, drop_last=True, prefetch=0),
            preference_val_loader=DataLoader(_ListDS(items[:B]), B, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=mesh,
        )
        out = trainer.train_stage2()
        assert np.isfinite(out["best_val_loss"])

    def test_seq_mesh_rejects_lora(self, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        from pgica_tpu.models.lora import normalize_lora_config

        lora_model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            lora_config=normalize_lora_config({"r": 2, "lora_alpha": 4}),
        )
        config_dict["training"]["stage2"]["num_epochs"] = 1
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.seq", 2)
        items = []
        batch = preference_batch(tokenizer, n=B, seed=0)
        for i in range(B):
            items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        trainer = PreferenceGuidedTrainer(
            lora_model, cfg,
            preference_train_loader=DataLoader(_ListDS(items), B, drop_last=True, prefetch=0),
            preference_val_loader=DataLoader(_ListDS(items[:B]), B, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=4, seq=2),
        )
        with pytest.raises(ValueError, match="LoRA"):
            trainer.train_stage2()


class TestZero1Trainer:
    """mesh.zero1 routes both stages through the explicit reduce-scatter
    ZeRO-1 step (parallel/zero1.py): flat data-axis-sharded Adam state."""

    def _items(self, maker, tokenizer, n):
        items = []
        for seed in range(n // B):
            batch = maker(tokenizer, n=B, seed=seed)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        return items

    def test_stage1_trains_and_checkpoints(self, model, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        config_dict["training"]["stage1"]["num_epochs"] = 1
        config_dict["training"]["stage1"]["warmup_steps"] = 1
        config_dict["training"]["stage1"]["learning_rate"] = 1e-2
        config_dict["training"]["stage2"]["num_epochs"] = 0
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.zero1", True)
        items = self._items(contrastive_batch, tokenizer, 16)
        before_train = np.asarray(
            model.params["text_encoder"]["projection"]["fc1"]["kernel"]
        ).copy()
        before_frozen = np.asarray(
            model.params["vision_encoder"]["backbone"]["cls_token"]
        ).copy()
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            train_loader=DataLoader(_ListDS(items), 8, drop_last=True, prefetch=0),
            val_loader=DataLoader(_ListDS(items[:8]), 8, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=8),
        )
        out = trainer.train_stage1()
        assert np.isfinite(out["best_val_loss"])
        after = np.asarray(model.params["text_encoder"]["projection"]["fc1"]["kernel"])
        assert not np.allclose(after, before_train), "ZeRO-1 step did not update params"
        # Frozen vision backbone stays frozen through the flat update mask.
        np.testing.assert_array_equal(
            np.asarray(model.params["vision_encoder"]["backbone"]["cls_token"]),
            before_frozen,
        )
        ckpt = tmp_path / "ckpt" / "best_model_stage1"
        assert ckpt.exists(), "gathered-params checkpoint missing under ZeRO-1"

    def test_stage2_trains_with_frozen_reference(self, model, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 1
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.zero1", True)
        items = self._items(preference_batch, tokenizer, 16)
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            preference_train_loader=DataLoader(_ListDS(items), 8, drop_last=True, prefetch=0),
            preference_val_loader=DataLoader(_ListDS(items[:8]), 8, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=8),
        )
        out = trainer.train_stage2()
        assert np.isfinite(out["best_val_loss"])

    def test_zero1_rejects_grad_accum_and_lora(self, model, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        from pgica_tpu.models.lora import normalize_lora_config

        config_dict["training"]["stage1"]["num_epochs"] = 1
        config_dict["training"]["stage1"]["gradient_accumulation_steps"] = 2
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.zero1", True)
        items = self._items(contrastive_batch, tokenizer, 16)
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            train_loader=DataLoader(_ListDS(items), 8, drop_last=True, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=8),
        )
        with pytest.raises(ValueError, match="accumulation"):
            trainer.train_stage1()

        lora_model = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            lora_config=normalize_lora_config({"r": 2, "lora_alpha": 4}),
        )
        cfg2 = Config(config_dict=config_dict)
        cfg2.set("mesh.zero1", True)
        trainer2 = PreferenceGuidedTrainer(
            lora_model, cfg2,
            train_loader=DataLoader(_ListDS(items), 8, drop_last=True, prefetch=0),
            output_dir=str(tmp_path / "out2"),
            mesh=MeshContext(data=8),
        )
        with pytest.raises(ValueError, match="LoRA"):
            trainer2.train_stage1()


class TestZero3Trainer:
    """mesh.zero3 routes both stages through the explicit per-layer-gather
    ZeRO-3 step (parallel/zero3.py); requires model.scan_layers."""

    def _scan_model(self, tokenizer):
        return PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            scan_layers=True,
        )

    def _items(self, maker, tokenizer, n):
        items = []
        for seed in range(n // B):
            batch = maker(tokenizer, n=B, seed=seed)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        return items

    def test_both_stages_train_on_data_x_fsdp(self, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        model = self._scan_model(tokenizer)
        config_dict["training"]["stage1"]["num_epochs"] = 1
        config_dict["training"]["stage1"]["warmup_steps"] = 1
        config_dict["training"]["stage1"]["learning_rate"] = 1e-2
        config_dict["training"]["stage2"]["num_epochs"] = 1
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.zero3", True)
        cfg.set("model.scan_layers", True)
        before_train = np.asarray(
            model.params["text_encoder"]["projection"]["fc1"]["kernel"]
        ).copy()
        before_frozen = np.asarray(
            model.params["vision_encoder"]["backbone"]["cls_token"]
        ).copy()
        items1 = self._items(contrastive_batch, tokenizer, 16)
        items2 = self._items(preference_batch, tokenizer, 16)
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            train_loader=DataLoader(_ListDS(items1), 8, drop_last=True, prefetch=0),
            val_loader=DataLoader(_ListDS(items1[:8]), 8, prefetch=0),
            preference_train_loader=DataLoader(_ListDS(items2), 8, drop_last=True, prefetch=0),
            preference_val_loader=DataLoader(_ListDS(items2[:8]), 8, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=2, fsdp=4),
        )
        out1 = trainer.train_stage1()
        assert np.isfinite(out1["best_val_loss"])
        after = np.asarray(model.params["text_encoder"]["projection"]["fc1"]["kernel"])
        assert not np.allclose(after, before_train), "ZeRO-3 step did not update params"
        np.testing.assert_array_equal(
            np.asarray(model.params["vision_encoder"]["backbone"]["cls_token"]),
            before_frozen,
        )
        assert (tmp_path / "ckpt" / "best_model_stage1").exists()
        out2 = trainer.train_stage2()
        assert np.isfinite(out2["best_val_loss"])

    def test_zero3_requires_scan_layers(self, model, tokenizer, config_dict, tmp_path):
        from pgica_tpu.parallel.mesh import MeshContext

        config_dict["training"]["stage1"]["num_epochs"] = 1
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        cfg.set("mesh.zero3", True)
        items = self._items(contrastive_batch, tokenizer, 16)
        trainer = PreferenceGuidedTrainer(
            model, cfg,  # unrolled model: no scan_layers
            train_loader=DataLoader(_ListDS(items), 8, drop_last=True, prefetch=0),
            output_dir=str(tmp_path / "out"),
            mesh=MeshContext(data=2, fsdp=4),
        )
        with pytest.raises(ValueError, match="scan_layers"):
            trainer.train_stage1()


class TestStage2ReferencePersistence:
    """The frozen DPO reference must anchor to the STAGE-2 START policy even
    across a preemption resume (rebuilding it from the restored mid-training
    policy silently moves the implicit-KL anchor)."""

    def _trainer(self, model, tokenizer, config_dict, tmp_path):
        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 1
        config_dict["training"]["stage2"]["learning_rate"] = 1e-2
        config_dict["training"]["load_best_model_at_end"] = False
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        items = []
        batch = preference_batch(tokenizer, n=B, seed=0)
        for i in range(B):
            items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        return PreferenceGuidedTrainer(
            model, cfg,
            preference_train_loader=DataLoader(_ListDS(items), B, drop_last=True, prefetch=0),
            preference_val_loader=DataLoader(_ListDS(items[:B]), B, prefetch=0),
            output_dir=str(tmp_path / "out"),
        )

    def test_reference_saved_and_restored_on_resume(self, model, tokenizer, config_dict, tmp_path):
        start_leaf = np.asarray(
            model.params["caption_decoder"]["vision_projection"]["layers_0"]["kernel"]
        ).copy()
        trainer = self._trainer(model, tokenizer, config_dict, tmp_path)
        trainer.train_stage2()
        ref_ckpt = tmp_path / "ckpt" / "stage2_reference"
        assert ref_ckpt.exists(), "stage-2 reference not persisted"
        # Simulate post-preemption drift: the restored policy differs from
        # the stage-2 start (one warmup step alone moves nothing).
        model.params["caption_decoder"]["vision_projection"]["layers_0"]["kernel"] = (
            jnp.asarray(start_leaf) + 1.0
        )

        # Resume path: _stage2_reference must return the saved START policy,
        # never rebuild from the (now-trained) model.
        trainer._resume = {"stage": 2, "epoch": 0, "step_in_epoch": 1}
        ref = trainer._stage2_reference(
            jnp.float32,
            lambda: (_ for _ in ()).throw(AssertionError("rebuilt the reference on resume")),
        )
        np.testing.assert_allclose(
            np.asarray(ref["caption_decoder"]["vision_projection"]["layers_0"]["kernel"]),
            start_leaf, atol=2e-2,  # reference stored in bf16
        )

    def test_train_all_skips_stage1_when_resuming_stage2(self, model, tokenizer, config_dict, tmp_path):
        trainer = self._trainer(model, tokenizer, config_dict, tmp_path)
        trainer.train_stage2()
        epoch_ckpt = tmp_path / "ckpt" / "checkpoint_stage2_epoch0"
        assert epoch_ckpt.exists()

        model2 = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
        )
        config_dict["training"]["stage1"]["num_epochs"] = 1  # would run stage 1
        trainer2 = self._trainer(model2, tokenizer, config_dict, tmp_path)
        trainer2.train_loader = trainer2.preference_train_loader  # satisfy stage-1 guard
        trainer2.load_checkpoint(epoch_ckpt)
        results = trainer2.train()
        assert "stage1" not in results, "stage 1 reran on a stage-2 resume"
        assert "stage2" in results


class TestAtomicCheckpointMeta:
    """The meta (global_step / step_in_epoch) must commit atomically WITH the
    payload: a stale or corrupted sidecar must never override the payload's
    own meta (a sidecar written ahead of an async payload used to pair a new
    step count with the previous weights after a preemption)."""

    def test_payload_meta_wins_over_sidecar(self, tmp_path):
        import json

        from pgica_tpu.training.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path / "ckpt", async_save=False)
        params = {"w": np.arange(4, dtype=np.float32)}
        mgr.save("autosave_stage1", params, global_step=7, step_in_epoch=3, stage=1)
        # Simulate the failure mode: sidecar claims a different (newer) step.
        side = tmp_path / "ckpt" / "autosave_stage1.meta.json"
        side.write_text(json.dumps({"global_step": 99, "step_in_epoch": 9, "stage": 1}))
        payload = mgr.restore("autosave_stage1")
        assert payload["meta"]["global_step"] == 7
        assert payload["meta"]["step_in_epoch"] == 3
        np.testing.assert_array_equal(payload["params"]["w"], params["w"])


class TestStage0Warmup:
    """Optional caption-CE warmup (training.stage0): inert at 0 epochs,
    reduces teacher-forced CE when enabled."""

    def test_warmup_reduces_caption_ce(self, model, tokenizer, config_dict, tmp_path):
        config_dict["training"]["stage0"] = {
            "num_epochs": 4, "learning_rate": 5e-3, "warmup_steps": 1,
        }
        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 0
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        items = []
        batch = contrastive_batch(tokenizer, n=B, seed=0)
        for i in range(B):
            items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        trainer = PreferenceGuidedTrainer(
            model, cfg,
            train_loader=DataLoader(_ListDS(items), B, drop_last=True, prefetch=0),
            output_dir=str(tmp_path / "out"),
        )
        results = trainer.train()
        hist = results["stage0"]["history"]
        assert len(hist) == 4
        assert all(np.isfinite(h["train_loss"]) for h in hist)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"], (
            "caption CE did not decrease over the warmup"
        )
        # stage-1/2 disabled -> no best checkpoints, but results written
        assert (tmp_path / "out" / "results.json").exists()

    def test_inert_by_default(self, model, tokenizer, config_dict, tmp_path):
        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 0
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        trainer = PreferenceGuidedTrainer(
            model, cfg, output_dir=str(tmp_path / "out"),
        )
        results = trainer.train()
        assert "stage0" not in results

    def _stage0_trainer(self, model, tokenizer, config_dict, tmp_path, **training_overrides):
        config_dict["training"]["stage0"] = {
            "num_epochs": 2, "learning_rate": 5e-3, "warmup_steps": 1,
        }
        config_dict["training"]["stage1"]["num_epochs"] = 0
        config_dict["training"]["stage2"]["num_epochs"] = 0
        config_dict["training"].update(training_overrides)
        config_dict["paths"] = {
            "output_dir": str(tmp_path / "out"),
            "checkpoint_dir": str(tmp_path / "ckpt"),
        }
        cfg = Config(config_dict=config_dict)
        items = []
        for seed in (0, 1):  # 2 batches per epoch
            batch = contrastive_batch(tokenizer, n=B, seed=seed)
            for i in range(B):
                items.append({k: np.asarray(v[i]) for k, v in batch.items()})
        return PreferenceGuidedTrainer(
            model, cfg,
            train_loader=DataLoader(_ListDS(items), B, drop_last=True, prefetch=0),
            output_dir=str(tmp_path / "out"),
        )

    def test_stage0_never_autosaves(self, model, tokenizer, config_dict, tmp_path):
        """Stage-0 warmup is checkpoint-free by contract: an autosave would be
        mis-resumed as a stage-1 mid-epoch point (advisor finding r2)."""
        trainer = self._stage0_trainer(
            model, tokenizer, config_dict, tmp_path,
            save_steps=1, save_strategy="steps",
        )
        trainer.train()
        trainer.checkpoints.wait()
        ckpt_dir = tmp_path / "ckpt"
        autosaves = list(ckpt_dir.glob("autosave*")) if ckpt_dir.exists() else []
        assert not autosaves, f"stage-0 warmup must not autosave, found {autosaves}"

    def test_legacy_stage0_checkpoint_reenters_stage0(
        self, model, tokenizer, config_dict, tmp_path
    ):
        """A stage-0 checkpoint (legacy builds autosaved through the shared
        path) must resume the WARMUP at its recorded point — stage must not be
        coerced to 1 (`or 1` on a falsy 0) and the remaining warmup epochs must
        still run."""
        trainer = self._stage0_trainer(model, tokenizer, config_dict, tmp_path)
        # Simulate a legacy end-of-epoch-0 stage-0 autosave.
        trainer.checkpoints.save(
            "autosave_stage0", trainer.model.params,
            stage=0, epoch=0, global_step=2, step_in_epoch=0,
        )
        trainer.checkpoints.wait()
        trainer.load_checkpoint(tmp_path / "ckpt" / "autosave_stage0")
        assert trainer._resume["stage"] == 0, "stage 0 was coerced away"
        results = trainer.train()
        hist = results["stage0"]["history"]
        assert [h["epoch"] for h in hist] == [1], (
            "resume must run exactly the remaining warmup epoch, got "
            f"{[h['epoch'] for h in hist]}"
        )
        assert trainer.global_step == 2 + 2  # restored 2 + one 2-step epoch
