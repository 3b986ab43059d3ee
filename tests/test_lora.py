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
