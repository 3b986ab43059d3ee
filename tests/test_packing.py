"""Length bucketing (training/packing.py): exactness + trainer wiring.

The claim under test is strong: slicing trailing all-pad token columns off a
batch changes NO loss and NO gradient (causal attention + masked losses), so
`training.length_bucketing` may default ON. Reference contrast: the torch
pipeline always runs the full 128-wide pad (reference preprocessing.py:206-280).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from pgica_tpu.training.packing import bucket_batch, default_buckets, pick_bucket


class TestBucketSelection:
    def test_default_buckets_are_multiples_of_32(self):
        assert default_buckets(128) == (32, 64, 96, 128)
        assert default_buckets(100) == (32, 64, 96, 100)
        assert default_buckets(16) == (16,)

    def test_pick_bucket(self):
        assert pick_bucket(1, (32, 64, 128)) == 32
        assert pick_bucket(32, (32, 64, 128)) == 32
        assert pick_bucket(33, (32, 64, 128)) == 64
        assert pick_bucket(999, (32, 64, 128)) == 128  # clamps to largest


def _mask(rows, full, lengths):
    m = np.zeros((rows, full), np.int32)
    for i, l in enumerate(lengths):
        m[i, :l] = 1
    return m


class TestBucketBatch:
    def test_stage1_slices_to_bucket(self):
        b = {
            "image": np.zeros((4, 8, 8, 3), np.float32),
            "caption_ids": np.arange(4 * 128, dtype=np.int32).reshape(4, 128),
            "caption_mask": _mask(4, 128, [5, 20, 11, 3]),
        }
        out = bucket_batch(b, (32, 64, 96, 128))
        assert out["caption_ids"].shape == (4, 32)
        assert out["caption_mask"].shape == (4, 32)
        np.testing.assert_array_equal(out["caption_ids"], b["caption_ids"][:, :32])
        assert out["image"] is b["image"]  # untouched passthrough

    def test_stage2_pairs_share_one_bucket(self):
        b = {
            "image": np.zeros((2, 8, 8, 3), np.float32),
            "preferred_ids": np.zeros((2, 128), np.int32),
            "preferred_mask": _mask(2, 128, [10, 12]),
            "rejected_ids": np.zeros((2, 128), np.int32),
            "rejected_mask": _mask(2, 128, [40, 5]),
        }
        out = bucket_batch(b, (32, 64, 96, 128))
        # rejected max 40 -> bucket 64 for BOTH halves (one 2B-row decoder pass)
        for k in ("preferred_ids", "preferred_mask", "rejected_ids", "rejected_mask"):
            assert out[k].shape == (2, 64)

    def test_multiple_of_rounds_up(self):
        b = {
            "caption_ids": np.zeros((2, 128), np.int32),
            "caption_mask": _mask(2, 128, [30, 30]),
        }
        out = bucket_batch(b, (32, 64, 96, 128), multiple_of=48)
        assert out["caption_ids"].shape[1] % 48 == 0

    def test_no_token_keys_is_identity(self):
        b = {"image": np.zeros((2, 8, 8, 3), np.float32)}
        assert bucket_batch(b, (32,)) is b

    def test_full_length_batch_untouched(self):
        b = {
            "caption_ids": np.zeros((2, 64), np.int32),
            "caption_mask": _mask(2, 64, [64, 2]),
        }
        out = bucket_batch(b, (32, 64))
        assert out["caption_ids"].shape == (2, 64)

    def test_non_prefix_mask_keeps_all_valid_tokens(self):
        # A mask with interior holes (e.g. special tokens masked mid-sequence):
        # the set-bit COUNT is 6 (would pick bucket 32) but the last valid
        # token sits at column 40 — the bucket must cover it. A count-based
        # bound would silently truncate real tokens; the exactness contract
        # says never.
        m = np.zeros((2, 128), np.int32)
        m[0, [0, 1, 5, 9, 38, 40]] = 1  # holes; last set col = 40
        m[1, :3] = 1
        b = {"caption_ids": np.arange(2 * 128, dtype=np.int32).reshape(2, 128),
             "caption_mask": m}
        out = bucket_batch(b, (32, 64, 96, 128))
        assert out["caption_ids"].shape == (2, 64)  # covers col 40, trims the rest
        np.testing.assert_array_equal(
            out["caption_ids"] * out["caption_mask"],
            (b["caption_ids"] * b["caption_mask"])[:, :64],
        )

    def test_non_prefix_mask_at_full_width_is_identity(self):
        m = np.zeros((1, 64), np.int32)
        m[0, [2, 63]] = 1  # last valid token in the final column
        b = {"caption_ids": np.zeros((1, 64), np.int32), "caption_mask": m}
        out = bucket_batch(b, (32, 64))
        assert out["caption_ids"].shape == (1, 64)


@pytest.fixture(scope="module")
def tiny_module():
    from pgica_tpu.models.model import build_module

    return build_module(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
        vocab_size=260, max_caption_length=64, dropout=0.0,
    )


@pytest.fixture(scope="module")
def tiny_params(tiny_module):
    img = jnp.zeros((1, 32, 32, 3))
    ids = jnp.zeros((1, 8), jnp.int32)
    return tiny_module.init(
        jax.random.PRNGKey(0), img, ids, jnp.ones((1, 8), jnp.int32), mode="dual"
    )["params"]


class TestExactness:
    """Bucketed loss AND grads match the full-width batch bit-for-bit-ish."""

    def _grads_close(self, ga, gb):
        la, lb = jax.tree.leaves(ga), jax.tree.leaves(gb)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_stage1_loss_and_grads(self, tiny_module, tiny_params):
        from pgica_tpu.training.train_step import stage1_loss_fn

        rng = np.random.default_rng(0)
        full = {
            "image": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
            "caption_ids": rng.integers(0, 250, (4, 64)).astype(np.int32),
            "caption_mask": _mask(4, 64, [7, 12, 3, 9]),
        }
        # zero out pad ids so slicing can't change embedding lookups... it
        # can't anyway (they're masked + causal), but keep the fixture honest:
        full["caption_ids"] = full["caption_ids"] * full["caption_mask"]
        cut = bucket_batch(full, (16, 32, 64))
        assert cut["caption_ids"].shape == (4, 16)

        def loss(params, batch):
            return stage1_loss_fn(
                params, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(1),
                tiny_module, temperature=0.5, augment=False, axis_name=None,
            )[0]

        (lf, gf) = jax.value_and_grad(loss)(tiny_params, full)
        (lc, gc) = jax.value_and_grad(loss)(tiny_params, cut)
        np.testing.assert_allclose(float(lf), float(lc), atol=1e-6)
        self._grads_close(gf, gc)

    def test_stage2_loss_and_grads(self, tiny_module, tiny_params):
        from pgica_tpu.core.precision import cast_floating
        from pgica_tpu.training.train_step import stage2_loss_fn

        rng = np.random.default_rng(1)
        full = {
            "image": rng.normal(size=(2, 32, 32, 3)).astype(np.float32),
            "preferred_ids": rng.integers(0, 250, (2, 64)).astype(np.int32),
            "preferred_mask": _mask(2, 64, [9, 14]),
            "rejected_ids": rng.integers(0, 250, (2, 64)).astype(np.int32),
            "rejected_mask": _mask(2, 64, [11, 4]),
        }
        cut = bucket_batch(full, (16, 32, 64))
        assert cut["preferred_ids"].shape == (2, 16)
        ref = cast_floating(tiny_params, jnp.float32)

        def loss(params, batch):
            return stage2_loss_fn(
                params, ref, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(2),
                tiny_module, beta=0.1, reference_free=False,
                length_normalized=False, label_smoothing=0.0, augment=False,
            )[0]

        (lf, gf) = jax.value_and_grad(loss)(tiny_params, full)
        (lc, gc) = jax.value_and_grad(loss)(tiny_params, cut)
        np.testing.assert_allclose(float(lf), float(lc), atol=1e-6)
        self._grads_close(gf, gc)


class TestTrainerWiring:
    def test_device_batch_buckets(self, tmp_path):
        from pgica_tpu.training.trainer import PreferenceGuidedTrainer
        from pgica_tpu.utils.config import Config

        config = Config("configs/default.yaml")
        config.set("data.max_caption_length", 64)
        config.set("paths.output_dir", str(tmp_path))

        class _M:  # trainer only touches .model for training; _device_batch doesn't
            lora = None
            lora_config = None

        t = PreferenceGuidedTrainer(_M(), config, output_dir=str(tmp_path))
        assert t._buckets == (32, 64)
        out = t._device_batch(
            {
                "caption_ids": np.zeros((2, 64), np.int32),
                "caption_mask": _mask(2, 64, [5, 6]),
            }
        )
        assert out["caption_ids"].shape == (2, 32)

        config.set("training.length_bucketing", False)
        t2 = PreferenceGuidedTrainer(_M(), config, output_dir=str(tmp_path))
        assert t2._buckets is None
        out2 = t2._device_batch(
            {
                "caption_ids": np.zeros((2, 64), np.int32),
                "caption_mask": _mask(2, 64, [5, 6]),
            }
        )
        assert out2["caption_ids"].shape == (2, 64)
