"""End-to-end learning proof: the full stack can actually fit data.

Overfits the tiny model on a fixed batch and asserts the task metrics reach
near-perfect values — catching wiring bugs (wrong masks, dead gradients,
mis-scaled losses) that shape tests cannot see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.data.tokenizer import CaptionTokenizer
from pgica_tpu.models import PreferenceGuidedCaptioningModel
from pgica_tpu.training.optim import create_optimizer
from pgica_tpu.training.train_step import (
    TrainState,
    make_stage1_train_step,
    make_stage2_train_step,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tok():
    return CaptionTokenizer()


def test_stage1_overfits_to_perfect_retrieval(tok):
    model = PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
        tokenizer=tok, max_caption_length=10, image_size=32, seed=0,
        freeze_vision_backbone=False,  # let the tiny tower learn
    )
    rng = np.random.default_rng(0)
    ids, mask = tok.encode_batch(
        ["red bird", "blue car", "green tree", "old house",
         "small dog", "big boat", "dark sky", "wet road"], 10
    )
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "caption_ids": jnp.asarray(ids),
        "caption_mask": jnp.asarray(mask),
    }
    opt = create_optimizer(3e-3, total_steps=300, warmup_steps=5)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_stage1_train_step(model.module, opt, 0.5, augment=False))
    key = jax.random.PRNGKey(0)
    start_loss = None
    for i in range(300):
        state, metrics = step(state, batch, key)
        if start_loss is None:
            start_loss = float(metrics["loss"])
    acc = float(metrics["contrastive_accuracy"])
    # tiny towers converge slowly; require strong (not perfect) retrieval
    assert acc >= 0.875, f"retrieval accuracy only {acc}"
    assert float(metrics["loss"]) < 0.5 * start_loss


def test_stage2_overfits_to_perfect_preference(tok):
    model = PreferenceGuidedCaptioningModel(
        vision_model="tiny-vit", text_model="tiny-gpt2", projection_dim=16,
        tokenizer=tok, max_caption_length=10, image_size=32, seed=0,
    )
    rng = np.random.default_rng(0)
    p_ids, p_mask = tok.encode_batch([f"a lovely detailed scene {i}" for i in range(4)], 10)
    r_ids, r_mask = tok.encode_batch([f"junk {i}" for i in range(4)], 10)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "preferred_ids": jnp.asarray(p_ids), "preferred_mask": jnp.asarray(p_mask),
        "rejected_ids": jnp.asarray(r_ids), "rejected_mask": jnp.asarray(r_mask),
    }
    ref_params = jax.tree.map(lambda x: jnp.array(x, copy=True), model.params)
    opt = create_optimizer(3e-3, total_steps=80, warmup_steps=5)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_stage2_train_step(model.module, opt, beta=0.5, augment=False))
    key = jax.random.PRNGKey(0)
    for _ in range(80):
        state, metrics = step(state, ref_params, batch, key)
    assert float(metrics["reward_accuracy"]) == 1.0
    assert float(metrics["loss"]) < 0.05
