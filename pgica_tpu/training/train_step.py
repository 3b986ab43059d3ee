"""Pure jitted train/eval steps for both stages.

Replaces the reference's Accelerate prepare/backward/accumulate surface
(reference trainer.py:435-652) with donated, pjit-compiled step functions:

* Stage 1 — contrastive: device-side augmentation, dual-tower forward, NT-Xent.
  Under a mesh the batch is sharded over the ``data`` axis and the similarity
  matrix is a *global* matmul: XLA's SPMD partitioner inserts the ICI
  all-gather of embeddings automatically, giving global negatives (the
  reference's DDP loss used local negatives only — SURVEY §2.5).
* Stage 2 — DPO: the vision tower runs ONCE per batch and the chosen/rejected
  captions are folded into one decoder pass over a 2B-row batch (the
  reference runs the vision encoder twice, SURVEY §3.2), with frozen-reference
  logprobs computed in the same jitted graph (no second dispatch).
* NaN-safe skipping is on-device: non-finite losses/grads zero the update and
  bump a skip counter inside the compiled step (the reference's ``.item()``
  host-sync checks, trainer.py:481-508, cost a device round-trip per batch).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pgica_tpu.data.augment import augment_batch, prepare_images
from pgica_tpu.models.lora import apply_lora
from pgica_tpu.ops.losses import (
    dpo_loss,
    ntxent_loss,
    sequence_logprobs,
    sequence_logprobs_from_hidden,
)


def _effective_params(params, base_params, lora: Optional[Tuple], rng=None):
    """Resolve the params the module actually runs with.

    Full-finetune mode (``lora=None``): ``params`` IS the model tree. LoRA
    mode: ``params`` is the {path: (A, B)} factor dict and the frozen base
    tree arrives via ``base_params``; the rank-r deltas are merged here,
    inside the jitted step, so XLA fuses the outer products into the
    surrounding graph and the optimizer/donation machinery only ever sees the
    tiny adapter pytree.

    ``lora`` is ``(alpha, rank)`` or ``(alpha, rank, dropout)``; when dropout
    is set AND ``rng`` is given (train steps only), adapter-input DropConnect
    is applied at merge time (models/lora.py:apply_lora). Eval paths pass no
    rng, so dropout is inactive there — torch ``.eval()`` semantics.
    """
    if lora is None:
        return params
    alpha, rank = lora[0], lora[1]
    dropout = lora[2] if len(lora) > 2 else 0.0
    return apply_lora(
        base_params, params, alpha=alpha, rank=rank, dropout=dropout, rng=rng
    )


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    skipped: jax.Array  # count of NaN-skipped updates

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            skipped=jnp.zeros((), jnp.int32),
        )


def _global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


def _apply_update(
    state: TrainState, grads, optimizer: optax.GradientTransformation, loss: jax.Array
) -> Tuple[TrainState, jax.Array]:
    """NaN-safe parameter update: skip (zero update) on non-finite loss/grads."""
    grad_norm = _global_norm(grads)
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    safe_grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    updates, new_opt_state = optimizer.update(safe_grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates)
    new_params = optax.apply_updates(state.params, updates)
    # On skip: keep old opt_state so a poisoned batch cannot corrupt moments.
    new_opt_state = jax.tree.map(
        lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
    )
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        skipped=state.skipped + jnp.where(ok, 0, 1).astype(jnp.int32),
    )
    return new_state, grad_norm


# --------------------------------------------------------------------- stage 0


def stage0_loss_fn(
    params,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    module,
    augment: bool,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Teacher-forced caption cross-entropy (optional LM warmup).

    The reference inherits language modeling from pretrained gpt2-medium
    (reference model.py:505); fully-offline from-scratch runs have none —
    stage 1 is contrastive-only and stage 2 DPO-only, so without this the
    decoder never learns to emit text (results/eval_conceptual/NOTES.md).
    """
    aug_rng, dropout_rng = jax.random.split(rng)
    images = prepare_images(batch["image"])
    if augment:
        images = augment_batch(aug_rng, images, enabled=True)
    out = module.apply(
        {"params": params},
        images,
        batch["caption_ids"],
        batch["caption_mask"],
        labels=batch["caption_ids"],
        mode="generation",
        deterministic=False,
        rngs={"dropout": dropout_rng},
    )
    loss = out["loss"]
    return loss, {"loss": loss}


def make_stage0_train_step(
    module, optimizer: optax.GradientTransformation, augment: bool = True
) -> Callable:
    """Returns jit-ready fn(state, batch, rng, base_params=None) -> (state, metrics)."""

    def step(state: TrainState, batch, rng, base_params=None):
        del base_params  # full-parameter warmup only
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(stage0_loss_fn, has_aux=True)(
            state.params, batch, rng, module, augment
        )
        new_state, grad_norm = _apply_update(state, grads, optimizer, loss)
        metrics["grad_norm"] = grad_norm
        metrics["skipped"] = new_state.skipped
        return new_state, metrics

    return step


# --------------------------------------------------------------------- stage 1


def stage1_loss_fn(
    params,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    module,
    temperature: float,
    augment: bool,
    axis_name: Optional[str] = None,
    base_params=None,
    lora: Optional[Tuple[float, int]] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    # fold_in(7) gives lora-dropout its own stream without perturbing the
    # aug/dropout split below (keeps non-LoRA graphs bit-identical).
    params = _effective_params(params, base_params, lora, rng=jax.random.fold_in(rng, 7))
    aug_rng, dropout_rng = jax.random.split(rng)
    images = prepare_images(batch["image"])
    if augment:
        images = augment_batch(aug_rng, images, enabled=True)
    out = module.apply(
        {"params": params},
        images,
        batch["caption_ids"],
        batch["caption_mask"],
        mode="contrastive",
        deterministic=False,
        rngs={"dropout": dropout_rng},
    )
    loss, metrics = ntxent_loss(
        out["image_embeddings"], out["text_embeddings"], temperature, axis_name=axis_name
    )
    metrics["loss"] = loss
    return loss, metrics


def make_stage1_train_step(
    module,
    optimizer: optax.GradientTransformation,
    temperature: float,
    augment: bool = True,
    axis_name: Optional[str] = None,
    lora: Optional[Tuple[float, int]] = None,
) -> Callable:
    """Returns jit-ready fn(state, batch, rng, base_params=None) -> (state, metrics).

    ``axis_name`` is only for explicit-collective execution (shard_map/pmap):
    it all-gathers NT-Xent negatives over that mesh axis. Under plain jit with
    sharded batches, leave it None — XLA's SPMD partitioner already computes
    the global similarity matrix.

    With ``lora=(alpha, rank)`` the state holds adapter factors only and the
    frozen base tree must be passed as ``base_params``.
    """

    def step(state: TrainState, batch, rng, base_params=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(stage1_loss_fn, has_aux=True)(
            state.params, batch, rng, module, temperature, augment, axis_name,
            base_params, lora,
        )
        new_state, grad_norm = _apply_update(state, grads, optimizer, loss)
        metrics["grad_norm"] = grad_norm
        metrics["skipped"] = new_state.skipped
        return new_state, metrics

    return step


def make_stage1_eval_step(
    module, temperature: float, lora: Optional[Tuple[float, int]] = None
) -> Callable:
    def step(params, batch, base_params=None):
        params = _effective_params(params, base_params, lora)
        out = module.apply(
            {"params": params},
            prepare_images(batch["image"]),
            batch["caption_ids"],
            batch["caption_mask"],
            mode="contrastive",
        )
        loss, metrics = ntxent_loss(
            out["image_embeddings"], out["text_embeddings"], temperature
        )
        metrics["loss"] = loss
        return metrics

    return step


# --------------------------------------------------------------------- stage 2


def decoder_embedding(params):
    """The decoder LM's (weight-tied) embedding matrix, shared-tower aware."""
    if "shared_lm" in params:
        return params["shared_lm"]["wte"]["embedding"]
    return params["caption_decoder"]["lm"]["wte"]["embedding"]


def _policy_pair_logprobs(
    module, params, images, batch, rng=None,
    length_normalized=False, use_fused_ce=True, mesh=None,
):
    """One vision encode + ONE decoder pass over [chosen; rejected].

    Returns per-sequence logprobs for the chosen and rejected halves. With
    ``use_fused_ce`` the unused logits output is dead-code-eliminated by XLA
    and logprobs come from the fused linear-CE kernel over hidden states.
    ``mesh`` (with a >1 model axis) switches the logprob reduction to the
    vocab-parallel shard_map path so the TP-sharded wte is never gathered.
    """
    kwargs = {}
    deterministic = rng is None
    if rng is not None:
        kwargs = {"rngs": {"dropout": rng}}
    b = images.shape[0]
    vision = module.apply(
        {"params": params}, images, deterministic=deterministic,
        method="encode_image", **kwargs,
    )
    ids = jnp.concatenate([batch["preferred_ids"], batch["rejected_ids"]], axis=0)
    mask = jnp.concatenate([batch["preferred_mask"], batch["rejected_mask"]], axis=0)
    vis2 = jnp.concatenate([vision["embeddings"], vision["embeddings"]], axis=0)
    dec = module.apply(
        {"params": params}, ids, mask, vis2, deterministic,
        method="decode_train", **kwargs,
    )
    if use_fused_ce:
        logps = sequence_logprobs_from_hidden(
            dec["hidden_states"], decoder_embedding(params), ids, mask, length_normalized,
            mesh=mesh,
        )
    else:
        logps = sequence_logprobs(dec["logits"], ids, mask, length_normalized)
    return logps[:b], logps[b:]


def stage2_loss_fn(
    params,
    ref_params,
    batch,
    rng,
    module,
    beta: float,
    reference_free: bool,
    length_normalized: bool,
    label_smoothing: float,
    augment: bool,
    base_params=None,
    lora: Optional[Tuple[float, int]] = None,
    mesh=None,
):
    # Same fold_in(7) convention as stage1_loss_fn: a dedicated lora-dropout
    # stream that leaves the aug/dropout split untouched. The frozen DPO
    # reference (ref_params) is merged WITHOUT dropout by the trainer.
    params = _effective_params(params, base_params, lora, rng=jax.random.fold_in(rng, 7))
    aug_rng, dropout_rng = jax.random.split(rng)
    images = prepare_images(batch["image"])
    if augment:
        images = augment_batch(aug_rng, images, enabled=True)
    b = images.shape[0]

    pc, pr = _policy_pair_logprobs(
        module, params, images, batch, dropout_rng, length_normalized, mesh=mesh
    )

    rc = rr = None
    if not reference_free and ref_params is not None:
        rc, rr = _policy_pair_logprobs(
            module, jax.lax.stop_gradient(ref_params), images, batch, None,
            length_normalized, mesh=mesh,
        )

    loss, metrics = dpo_loss(
        pc, pr, rc, rr, beta=beta, label_smoothing=label_smoothing, reference_free=reference_free
    )
    metrics["loss"] = loss
    metrics["policy_chosen_logp"] = pc.mean()
    metrics["policy_rejected_logp"] = pr.mean()
    return loss, metrics


def make_stage2_train_step(
    module,
    optimizer: optax.GradientTransformation,
    beta: float,
    reference_free: bool = False,
    length_normalized: bool = False,
    label_smoothing: float = 0.0,
    augment: bool = True,
    lora: Optional[Tuple[float, int]] = None,
    mesh=None,
) -> Callable:
    """Returns fn(state, ref_params, batch, rng, base_params=None) -> (state, metrics).

    In LoRA mode the frozen DPO reference is simply the base tree (adapters
    start as a no-op, so base == the policy at stage-2 start). ``mesh`` with
    a >1 model axis keeps the DPO logprob reduction vocab-parallel.
    """

    def step(state: TrainState, ref_params, batch, rng, base_params=None):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(stage2_loss_fn, has_aux=True)(
            state.params, ref_params, batch, rng, module,
            beta, reference_free, length_normalized, label_smoothing, augment,
            base_params, lora, mesh,
        )
        new_state, grad_norm = _apply_update(state, grads, optimizer, loss)
        metrics["grad_norm"] = grad_norm
        metrics["skipped"] = new_state.skipped
        return new_state, metrics

    return step


def make_stage2_eval_step(
    module, beta: float, reference_free: bool = False, length_normalized: bool = False,
    lora: Optional[Tuple[float, int]] = None, mesh=None,
) -> Callable:
    def step(params, ref_params, batch, base_params=None):
        params = _effective_params(params, base_params, lora)
        images = prepare_images(batch["image"])
        pc, pr = _policy_pair_logprobs(
            module, params, images, batch, None, length_normalized, mesh=mesh
        )
        rc = rr = None
        if not reference_free and ref_params is not None:
            rc, rr = _policy_pair_logprobs(
                module, ref_params, images, batch, None, length_normalized, mesh=mesh
            )
        loss, metrics = dpo_loss(pc, pr, rc, rr, beta=beta, reference_free=reference_free)
        metrics["loss"] = loss
        return metrics

    return step
