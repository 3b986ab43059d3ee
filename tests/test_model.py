"""Model tower tests (mirrors reference tests/test_model.py strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models import (
    CaptionDecoder,
    PreferenceGuidedCaptioningModel,
    TextEncoder,
    VisionEncoder,
    get_text_config,
    get_vision_config,
)
from pgica_tpu.models.encoders import masked_mean_pool

B, IMG, SEQ, PROJ = 2, 32, 10, 16
VISION_CFG = get_vision_config("tiny-vit")
TEXT_CFG = get_text_config("tiny-gpt2", vocab_size=300)


@pytest.fixture(scope="module")
def tokenizer():
    return CaptionTokenizer()


@pytest.fixture(scope="module")
def model(tokenizer):
    return PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit",
        text_model="tiny-gpt2",
        projection_dim=PROJ,
        tokenizer=tokenizer,
        max_caption_length=SEQ,
        image_size=IMG,
        seed=0,
    )


@pytest.fixture
def images(rng):
    return rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)


@pytest.fixture
def caps(tokenizer):
    ids, mask = tokenizer.encode_batch(["a red bird", "two dogs playing"], SEQ)
    return ids, mask


class TestVisionEncoder:
    def test_output_shapes(self, rng):
        enc = VisionEncoder(VISION_CFG, projection_dim=PROJ)
        imgs = jnp.asarray(rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), imgs)["params"]
        out = enc.apply({"params": params}, imgs)
        n_tokens = 1 + (IMG // VISION_CFG.patch_size) ** 2
        assert out["features"].shape == (B, n_tokens, VISION_CFG.hidden_size)
        assert out["embeddings"].shape == (B, PROJ)
        assert out["pooled_output"].shape == (B, VISION_CFG.hidden_size)

    def test_rejects_bad_input(self, rng):
        enc = VisionEncoder(VISION_CFG, projection_dim=PROJ)
        with pytest.raises(ValueError, match="4D"):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((IMG, IMG, 3)))


class TestTextEncoder:
    def test_output_shapes(self, rng):
        enc = TextEncoder(TEXT_CFG, projection_dim=PROJ)
        ids = jnp.asarray(rng.integers(0, 300, (B, SEQ)).astype(np.int32))
        mask = jnp.ones((B, SEQ), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out = enc.apply({"params": params}, ids, mask)
        assert out["embeddings"].shape == (B, PROJ)
        assert out["hidden_states"].shape == (B, SEQ, TEXT_CFG.hidden_size)

    def test_masked_mean_pool_ignores_padding(self, rng):
        hidden = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
        pooled = masked_mean_pool(hidden, mask)
        expected = np.asarray(hidden[0, :2]).mean(0)
        np.testing.assert_allclose(np.asarray(pooled[0]), expected, rtol=1e-5)

    def test_all_masked_clamps_divisor(self):
        hidden = jnp.ones((1, 3, 4))
        mask = jnp.zeros((1, 3), jnp.int32)
        pooled = masked_mean_pool(hidden, mask)
        assert np.isfinite(np.asarray(pooled)).all()


class TestCaptionDecoder:
    def test_train_forward_shapes(self, rng):
        dec = CaptionDecoder(TEXT_CFG, projection_dim=PROJ)
        ids = jnp.asarray(rng.integers(0, 300, (B, SEQ)).astype(np.int32))
        mask = jnp.ones((B, SEQ), jnp.int32)
        vis = jnp.asarray(rng.normal(size=(B, PROJ)).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), ids, mask, vis)["params"]
        out = dec.apply({"params": params}, ids, mask, vis)
        assert out["logits"].shape == (B, SEQ, 300)

    def test_vision_conditioning_changes_logits(self, rng):
        dec = CaptionDecoder(TEXT_CFG, projection_dim=PROJ)
        ids = jnp.asarray(rng.integers(0, 300, (B, SEQ)).astype(np.int32))
        mask = jnp.ones((B, SEQ), jnp.int32)
        v1 = jnp.asarray(rng.normal(size=(B, PROJ)).astype(np.float32))
        v2 = jnp.asarray(rng.normal(size=(B, PROJ)).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), ids, mask, v1)["params"]
        out1 = dec.apply({"params": params}, ids, mask, v1)
        out2 = dec.apply({"params": params}, ids, mask, v2)
        assert not np.allclose(np.asarray(out1["logits"]), np.asarray(out2["logits"]))


class TestComposedModel:
    def test_contrastive_mode(self, model, images, caps):
        out = model(images, *caps, mode="contrastive")
        assert out["image_embeddings"].shape == (B, PROJ)
        assert out["text_embeddings"].shape == (B, PROJ)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out["image_embeddings"]), axis=-1), 1.0, rtol=1e-4
        )

    def test_generation_mode_with_loss(self, model, images, caps):
        ids, mask = caps
        out = model(images, ids, mask, labels=ids, mode="generation")
        assert out["logits"].shape == (B, SEQ, model.tokenizer.vocab_size)
        assert float(out["loss"]) > 0

    def test_dual_mode(self, model, images, caps):
        out = model(images, *caps, mode="dual")
        assert "image_embeddings" in out and "logits" in out

    def test_invalid_mode_raises(self, model, images, caps):
        with pytest.raises(ValueError, match="mode"):
            model(images, *caps, mode="inference")

    def test_similarity_matrix(self, model, images, caps):
        sim = model.compute_similarity(images, *caps)
        assert sim.shape == (B, B)
        assert np.isfinite(np.asarray(sim)).all()

    def test_num_parameters_freeze_accounting(self, model):
        counts = model.num_parameters()
        assert counts["total"] > counts["trainable"] > 0  # frozen vision backbone

    def test_gradient_flow_contrastive(self, model, images, caps):
        from pgica_tpu.ops.losses import ntxent_loss

        ids, mask = caps

        def loss_fn(params):
            out = model.module.apply(
                {"params": params}, jnp.asarray(images), jnp.asarray(ids), jnp.asarray(mask),
                mode="contrastive",
            )
            return ntxent_loss(out["image_embeddings"], out["text_embeddings"], 0.5)[0]

        grads = jax.grad(loss_fn)(model.params)
        proj_grad = grads["text_encoder"]["projection"]["fc1"]["kernel"]
        assert np.abs(np.asarray(proj_grad)).sum() > 0

    @pytest.mark.parametrize("batch_size", [1, 3])
    def test_batch_size_flexibility(self, model, rng, tokenizer, batch_size):
        imgs = rng.normal(size=(batch_size, IMG, IMG, 3)).astype(np.float32)
        ids, mask = tokenizer.encode_batch(["x"] * batch_size, SEQ)
        out = model(imgs, ids, mask, mode="contrastive")
        assert out["image_embeddings"].shape == (batch_size, PROJ)


class TestPresets:
    def test_known_presets_resolve(self):
        assert get_vision_config("openai/clip-vit-base-patch32").patch_size == 32
        assert get_text_config("gpt2-medium").num_layers == 24
        llama = get_text_config("meta-llama/Meta-Llama-3-8B")
        assert llama.arch == "llama" and llama.kv_heads == 8

    def test_unknown_preset_raises(self):
        with pytest.raises(ValueError, match="Unknown vision"):
            get_vision_config("nope")
        with pytest.raises(ValueError, match="Unknown text"):
            get_text_config("nope")

    def test_llama_arch_forward(self, rng):
        """RoPE + RMSNorm + SwiGLU + GQA path compiles and runs."""
        cfg = get_text_config("tiny-llama", vocab_size=64)
        enc = TextEncoder(cfg, projection_dim=8)
        ids = jnp.asarray(rng.integers(0, 64, (2, 6)).astype(np.int32))
        mask = jnp.ones((2, 6), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out = enc.apply({"params": params}, ids, mask)
        assert out["embeddings"].shape == (2, 8)
        assert np.isfinite(np.asarray(out["embeddings"])).all()


class TestSharedTextTower:
    def test_shared_tower_halves_lm_params(self, tokenizer):
        shared = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            share_text_tower=True,
        )
        assert "shared_lm" in shared.params
        assert "backbone" not in shared.params["text_encoder"]
        assert "lm" not in shared.params["caption_decoder"]

    def test_shared_tower_trains_and_generates(self, tokenizer, rng):
        shared = PreferenceGuidedCaptioningModel(
            vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=PROJ,
            tokenizer=tokenizer, max_caption_length=SEQ, image_size=IMG, seed=0,
            share_text_tower=True,
        )
        imgs = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
        ids, mask = tokenizer.encode_batch(["a", "b"], SEQ)
        out = shared(imgs, ids, mask, labels=ids, mode="dual")
        assert np.isfinite(float(out["loss"]))
        caps = shared.generate_captions(imgs, max_length=6)
        assert len(caps) == 2
