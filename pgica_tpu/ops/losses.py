"""Training losses: NT-Xent (global negatives), DPO, masked caption CE.

TPU-native re-design of the reference losses:

* :func:`ntxent_loss` — symmetric InfoNCE (reference model.py:957-1000).
  Under a mesh, pass ``axis_name`` to all-gather embeddings over the ICI
  data axis so the similarity matrix uses **global** negatives — fixing the
  reference's local-negatives-only limitation (SURVEY §2.5): its DDP loss
  silently shrank the negative pool per GPU.
* :func:`sequence_logprobs` — per-sequence token logprob reduction with
  summed (reference components.py:321-362) or length-normalized
  (reference model.py:1068-1084) semantics.
* :func:`dpo_loss` — full DPO with frozen-reference logprobs, label
  smoothing, and reward margin/accuracy metrics (reference
  components.py:148-249), with ``reference_free=True`` reproducing the
  reference trainer's actual loss (reference model.py:1003-1085).
* :func:`caption_cross_entropy` — shifted, padding-masked LM loss for
  generation mode (reference model.py:838-851; the reference lets padding
  leak into this CE — here it is masked, a documented fix).

All losses compute in float32 regardless of the model's compute dtype.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps, None)


def _ce_rows(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Row-wise softmax cross-entropy with integer labels."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - true_logit


def ntxent_loss(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 0.5,
    axis_name: Optional[str] = None,
    normalized: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Symmetric InfoNCE over an image/text batch.

    Args:
        image_embeddings / text_embeddings: (B_local, D), L2-normalized unless
            ``normalized=False``.
        axis_name: mesh axis to all-gather negatives over. None = local
            negatives only (single-device; degenerate case of the global loss).

    Returns (loss, metrics) where metrics holds the two directional losses
    and the in-batch retrieval accuracy.
    """
    img = image_embeddings.astype(jnp.float32)
    txt = text_embeddings.astype(jnp.float32)
    if not normalized:
        img, txt = l2_normalize(img), l2_normalize(txt)
    local_b = img.shape[0]

    if axis_name is not None:
        # Global negatives over ICI: gather both modality embeddings.
        global_img = jax.lax.all_gather(img, axis_name, tiled=True)  # (B_global, D)
        global_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * local_b
        labels = jnp.arange(local_b) + offset
        logits_i2t = img @ global_txt.T / temperature  # (B_local, B_global)
        logits_t2i = txt @ global_img.T / temperature
    else:
        labels = jnp.arange(local_b)
        logits_i2t = img @ txt.T / temperature
        logits_t2i = logits_i2t.T

    loss_i2t = _ce_rows(logits_i2t, labels).mean()
    loss_t2i = _ce_rows(logits_t2i, labels).mean()
    loss = 0.5 * (loss_i2t + loss_t2i)
    acc = (jnp.argmax(logits_i2t, axis=-1) == labels).astype(jnp.float32).mean()
    return loss, {"loss_i2t": loss_i2t, "loss_t2i": loss_t2i, "contrastive_accuracy": acc}


def sequence_logprobs(
    logits: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    length_normalized: bool = False,
) -> jax.Array:
    """Per-sequence log-probability of ``input_ids`` under ``logits``.

    Standard causal shift: position t's logits predict token t+1. Padding is
    excluded via ``attention_mask``. ``length_normalized=True`` averages over
    valid tokens (reference model.py:1082-1084); False sums (reference
    components.py:321-362 / standard DPO).
    """
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = input_ids[:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    summed = jnp.sum(tok_logp * mask, axis=-1)
    if length_normalized:
        summed = summed / jnp.clip(jnp.sum(mask, axis=-1), 1.0, None)
    return summed


def ntxent_loss_fused(
    image_embeddings: jax.Array,
    text_embeddings: jax.Array,
    temperature: float = 0.5,
    axis_name: Optional[str] = None,
    impl: str = "auto",
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """NT-Xent via the fused linear-CE kernel — the (B_global, B_global)
    logits matrix never hits HBM.

    Observation: the i2t direction of InfoNCE is exactly a target-token
    log-likelihood where the "vocabulary" is the gathered text embeddings, so
    both directions reduce to :func:`pgica_tpu.ops.fused_ce.fused_token_logprobs`
    over (embeddings/temperature). Matches :func:`ntxent_loss` numerically
    (the accuracy metric is omitted — it would need the full logits row).
    """
    from pgica_tpu.ops.fused_ce import fused_token_logprobs

    img = image_embeddings.astype(jnp.float32) / temperature
    txt = text_embeddings.astype(jnp.float32)
    local_b = img.shape[0]
    if axis_name is not None:
        global_img = jax.lax.all_gather(image_embeddings.astype(jnp.float32), axis_name, tiled=True)
        global_txt = jax.lax.all_gather(txt, axis_name, tiled=True)
        labels = jnp.arange(local_b) + jax.lax.axis_index(axis_name) * local_b
        loss_i2t = -fused_token_logprobs(img, global_txt, labels, impl=impl).mean()
        loss_t2i = -fused_token_logprobs(txt / temperature, global_img, labels, impl=impl).mean()
    else:
        labels = jnp.arange(local_b)
        loss_i2t = -fused_token_logprobs(img, txt, labels, impl=impl).mean()
        loss_t2i = -fused_token_logprobs(txt / temperature, image_embeddings.astype(jnp.float32), labels, impl=impl).mean()
    loss = 0.5 * (loss_i2t + loss_t2i)
    return loss, {"loss_i2t": loss_i2t, "loss_t2i": loss_t2i}


def sequence_logprobs_from_hidden(
    hidden: jax.Array,
    embedding: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    length_normalized: bool = False,
    impl: str = "auto",
    mesh=None,
    data_axes: Tuple[str, ...] = ("dcn", "data", "fsdp"),
    vocab_axis: str = "model",
) -> jax.Array:
    """Per-sequence logprobs via the fused linear-CE kernel (logits never
    materialized; see ops/fused_ce.py). Semantics identical to
    :func:`sequence_logprobs` with logits = hidden @ embedding.T.

    With ``mesh`` (and a >1 ``vocab_axis``), the reduction runs under
    shard_map with the embedding kept vocab-sharded — the Megatron
    vocab-parallel CE dataflow — instead of letting GSPMD all-gather the
    wte around the opaque Pallas call.
    """
    from pgica_tpu.ops.fused_ce import fused_token_logprobs, fused_token_logprobs_tp

    b, s, d = hidden.shape

    if mesh is not None and mesh.shape.get(vocab_axis, 1) > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        batch_axes = tuple(a for a in data_axes if mesh.shape.get(a, 1) > 1) or None

        # Pad the vocab to an axis multiple with ZERO rows (their softmax
        # contribution is removed analytically via true_vocab; the pad's
        # transpose slices dW back). Differentiable end to end.
        vocab = embedding.shape[0]
        n_shards = mesh.shape[vocab_axis]
        vocab_p = ((vocab + n_shards - 1) // n_shards) * n_shards
        if vocab_p != vocab:
            embedding = jnp.pad(embedding, ((0, vocab_p - vocab), (0, 0)))

        def body(h, emb, ids, mask):
            rows = h[:, :-1].reshape(-1, d)
            targets = ids[:, 1:].reshape(-1)
            tok = fused_token_logprobs_tp(
                rows, emb, targets, vocab_axis, impl=impl, true_vocab=vocab
            )
            tok = tok.reshape(h.shape[0], s - 1)
            m = mask[:, 1:].astype(jnp.float32)
            out = jnp.sum(tok * m, axis=-1)
            if length_normalized:
                out = out / jnp.clip(jnp.sum(m, axis=-1), 1.0, None)
            return out

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P(batch_axes, None, None),
                P(vocab_axis, None),
                P(batch_axes, None),
                P(batch_axes, None),
            ),
            out_specs=P(batch_axes),
            check_vma=False,
        )(hidden, embedding, input_ids, attention_mask)

    rows = hidden[:, :-1].reshape(b * (s - 1), d)
    targets = input_ids[:, 1:].reshape(-1)
    tok_logp = fused_token_logprobs(rows, embedding, targets, impl=impl).reshape(b, s - 1)
    mask = attention_mask[:, 1:].astype(jnp.float32)
    summed = jnp.sum(tok_logp * mask, axis=-1)
    if length_normalized:
        summed = summed / jnp.clip(jnp.sum(mask, axis=-1), 1.0, None)
    return summed


def cp_shift_targets(
    input_ids: jax.Array, attention_mask: jax.Array, axis_name: str
) -> Tuple[jax.Array, jax.Array]:
    """Shard-local (targets, target_mask) for the global causal shift.

    Context-parallel analog of the ``[:, 1:]`` shift in
    :func:`sequence_logprobs`: inside shard_map with (B, S_local) sequence
    shards, local position t predicts GLOBAL position t+1. For the shard's
    last position that target lives on the next shard — its first column
    arrives via ``ppermute``. The global-final position has no target and is
    masked out on the last shard; target validity follows the target
    position's attention mask (same convention as the unsharded path).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [((i + 1) % n, i) for i in range(n)]  # next shard sends to me
    nxt_ids = jax.lax.ppermute(input_ids[:, :1], axis_name, perm)
    nxt_mask = jax.lax.ppermute(attention_mask[:, :1], axis_name, perm)
    targets = jnp.concatenate([input_ids[:, 1:], nxt_ids], axis=1)
    tmask = jnp.concatenate([attention_mask[:, 1:], nxt_mask], axis=1).astype(jnp.float32)
    # Wrap-around from the ring permutation: the last shard received shard
    # 0's first column, but the global final position predicts nothing.
    tmask = tmask * jnp.where(
        (jnp.arange(tmask.shape[1]) == tmask.shape[1] - 1) & (idx == n - 1), 0.0, 1.0
    )[None, :]
    return targets, tmask


def cp_sequence_logprob_partials(
    logits: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    axis_name: str,
) -> Tuple[jax.Array, jax.Array]:
    """Per-shard (partial_logprob_sum, partial_token_count), both (B,).

    Sum the partials over ``axis_name`` (psum, or stacked out_specs reduced
    outside shard_map) to recover :func:`sequence_logprobs` of the full
    sequence exactly.
    """
    targets, tmask = cp_shift_targets(input_ids, attention_mask, axis_name)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(tok * tmask, axis=-1), jnp.sum(tmask, axis=-1)


def cp_sequence_logprob_partials_from_hidden(
    hidden: jax.Array,
    embedding: jax.Array,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    axis_name: str,
    impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Fused-CE variant of :func:`cp_sequence_logprob_partials`: the
    (B, S_local, V) logits shard never materializes (ops/fused_ce.py); the
    embedding arrives replicated per shard."""
    from pgica_tpu.ops.fused_ce import fused_token_logprobs

    b, s, d = hidden.shape
    targets, tmask = cp_shift_targets(input_ids, attention_mask, axis_name)
    tok = fused_token_logprobs(
        hidden.reshape(b * s, d), embedding, targets.reshape(-1), impl=impl
    ).reshape(b, s)
    return jnp.sum(tok * tmask, axis=-1), jnp.sum(tmask, axis=-1)


def dpo_loss(
    policy_chosen_logps: jax.Array,
    policy_rejected_logps: jax.Array,
    reference_chosen_logps: Optional[jax.Array] = None,
    reference_rejected_logps: Optional[jax.Array] = None,
    beta: float = 0.1,
    label_smoothing: float = 0.0,
    reference_free: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Direct Preference Optimization loss.

    With a frozen reference policy (default): standard DPO on the implicit
    reward ``beta * (logpi - logref)``. ``reference_free=True`` drops the
    reference terms, reproducing the reference trainer's PreferenceLoss when
    combined with length-normalized logprobs.
    """
    pi_diff = policy_chosen_logps - policy_rejected_logps
    if reference_free or reference_chosen_logps is None:
        ref_diff = jnp.zeros_like(pi_diff)
    else:
        ref_diff = reference_chosen_logps - reference_rejected_logps
    logits = (pi_diff - ref_diff).astype(jnp.float32)

    losses = (
        -jax.nn.log_sigmoid(beta * logits) * (1.0 - label_smoothing)
        - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
    )
    chosen_reward = beta * (
        policy_chosen_logps - (0.0 if reference_free or reference_chosen_logps is None else reference_chosen_logps)
    )
    rejected_reward = beta * (
        policy_rejected_logps
        - (0.0 if reference_free or reference_rejected_logps is None else reference_rejected_logps)
    )
    metrics = {
        "reward_margin": (chosen_reward - rejected_reward).mean(),
        "reward_accuracy": (chosen_reward > rejected_reward).astype(jnp.float32).mean(),
        "chosen_reward": chosen_reward.mean(),
        "rejected_reward": rejected_reward.mean(),
    }
    return losses.mean(), metrics


def caption_cross_entropy(
    logits: jax.Array, labels: jax.Array, attention_mask: jax.Array
) -> jax.Array:
    """Shifted, padding-masked token-level cross entropy (mean over valid tokens)."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    targets = labels[:, 1:]
    tok_logp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = attention_mask[:, 1:].astype(jnp.float32)
    return -jnp.sum(tok_logp * mask) / jnp.clip(jnp.sum(mask), 1.0, None)
