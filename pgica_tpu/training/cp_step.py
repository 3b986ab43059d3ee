"""Context-parallel (sequence-sharded) stage-2 training step.

For long-preference-sequence runs (the SigLIP + Llama-3-8B scaled config,
SURVEY §5 "long-context / sequence parallelism" growth path) the decoder's
activations at seq >= 8k dominate HBM. This step keeps them SEQUENCE-SHARDED
over a mesh axis all the way through the loss:

* the caption decoder runs inside ``shard_map`` with caption ids/masks split
  over ``axis_name`` — self-attention is ring attention
  (:mod:`pgica_tpu.ops.ring_attention`, KV blocks rotate over ICI) and
  positions are global per shard;
* per-sequence DPO logprobs are reduced shard-locally
  (:func:`pgica_tpu.ops.losses.cp_sequence_logprob_partials`) with the causal
  shift crossing shard boundaries via ``ppermute``; only the (B,) partial
  sums leave the shard_map — the (B, S, V) logits and (B, S, H) hidden states
  never exist unsharded anywhere;
* the scalar DPO loss and the optimizer update happen outside; shard_map is
  differentiable, so parameter cotangents from all sequence shards are
  accumulated by the transform itself (no hand-written grad psum).

The reference has no analog (its sequences cap at 128 tokens, reference
configs/default.yaml:8); this is the TPU-native growth path beyond reference
capability. Numerics match the unsharded stage-2 step exactly —
tests/test_parallel.py::TestContextParallelStage2.

Dropout note: the dropout PRNG key is replicated across sequence shards so
the (single) vision token's projection dropout is consistent shard-to-shard;
in-decoder activation dropout therefore repeats its mask every S_local
tokens along the global sequence (documented deviation — dropout is usually
disabled at the scales where CP is worth it).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pgica_tpu.data.augment import augment_batch, prepare_images
from pgica_tpu.ops.losses import (
    cp_sequence_logprob_partials,
    cp_sequence_logprob_partials_from_hidden,
    dpo_loss,
)
from pgica_tpu.training.train_step import TrainState, _apply_update, decoder_embedding


def make_cp_module(module, axis_name: str):
    """Clone the composed module with the decoder in ring (CP) mode.

    ``ring_axis`` adds no parameters, so the clone shares the original's
    param tree byte-for-byte.
    """
    return module.clone(ring_axis=axis_name)


def _pair_partials_factory(
    module_cp, axis_name: str, use_fused_ce: bool, with_dropout: bool,
    ce_impl: str = "auto",
):
    """Body run INSIDE shard_map: one vision encode + one decoder pass over
    the [chosen; rejected] 2B-row batch on this shard's sequence slice."""

    def body(params, images, p_ids, p_mask, r_ids, r_mask, rng):
        # Chosen/rejected arrive separately so a batch (data) shard keeps its
        # images aligned with ITS caption rows; the 2B-row fused decoder pass
        # is formed per shard.
        det = not with_dropout
        kwargs = {} if det else {"rngs": {"dropout": rng}}
        vision = module_cp.apply(
            {"params": params}, images, deterministic=det,
            method="encode_image", **kwargs,
        )
        b = images.shape[0]
        ids = jnp.concatenate([p_ids, r_ids], axis=0)
        mask = jnp.concatenate([p_mask, r_mask], axis=0)
        vis2 = jnp.concatenate([vision["embeddings"], vision["embeddings"]], axis=0)
        dec = module_cp.apply(
            {"params": params}, ids, mask, vis2, det,
            method="decode_train", **kwargs,
        )
        if use_fused_ce:
            part, cnt = cp_sequence_logprob_partials_from_hidden(
                dec["hidden_states"], decoder_embedding(params), ids, mask, axis_name,
                impl=ce_impl,
            )
        else:
            part, cnt = cp_sequence_logprob_partials(dec["logits"], ids, mask, axis_name)
        # (1, B) blocks per side: stacked over sequence shards outside.
        return part[None, :b], cnt[None, :b], part[None, b:], cnt[None, b:]

    return body


def make_stage2_cp_loss_fn(
    module_cp,
    mesh: Mesh,
    axis_name: str,
    beta: float,
    reference_free: bool = False,
    length_normalized: bool = False,
    label_smoothing: float = 0.0,
    augment: bool = True,
    use_fused_ce: bool = False,
    data_axis=None,
    policy_dropout: bool = True,
    tp_axis: Optional[str] = None,
) -> Callable:
    """loss_fn(params, ref_params, batch, rng) with sequence-sharded decoder.

    ``module_cp`` must be the :func:`make_cp_module` clone (ring_axis set).
    ``data_axis`` optionally shards the batch dim over one or more further
    mesh axes (a name or tuple of names — data parallelism composed with
    context parallelism). ``policy_dropout=False`` makes the policy pass
    deterministic (eval).

    ``tp_axis`` composes tensor parallelism with CP via PARTIAL-manual
    shard_map (jax ``axis_names``): the seq/data axes are manual (ring
    attention's ppermute, the causal-shift ppermute), while ``tp_axis``
    stays automatic, so the GSPMD Megatron rules
    (:mod:`pgica_tpu.parallel.sharding`) partition the decoder matmuls over
    it exactly as in the non-CP TP path. The Pallas fused-CE kernel cannot
    be auto-partitioned (XLA would gather the vocab-sharded wte around the
    custom call), so the CE falls back to the XLA formulation, which GSPMD
    shards over the vocab dim; the (2B, S/cp, V/tp) logits shard is the
    bounded residual cost.
    """
    n_shards = mesh.shape[axis_name]
    if isinstance(data_axis, (tuple, list)):
        data_axis = tuple(a for a in data_axis if mesh.shape.get(a, 1) > 1) or None
    sm_kwargs = {}
    ce_impl = "auto"
    if tp_axis is not None and mesh.shape.get(tp_axis, 1) > 1:
        manual = frozenset(a for a in mesh.axis_names if a != tp_axis)
        sm_kwargs["axis_names"] = manual
        ce_impl = "xla"

    def _partials(params, images, batch, rng, with_dropout):
        body = _pair_partials_factory(
            module_cp, axis_name, use_fused_ce, with_dropout, ce_impl=ce_impl
        )
        sm = shard_map(
            body,
            mesh=mesh,
            **sm_kwargs,
            in_specs=(
                P(),                      # params replicated
                P(data_axis),             # images: batch over data axis (or replicated)
                P(data_axis, axis_name),  # (B, S) -> batch x sequence shards
                P(data_axis, axis_name),
                P(data_axis, axis_name),
                P(data_axis, axis_name),
                P(),                      # dropout key replicated (see module docstring)
            ),
            out_specs=(P(axis_name, data_axis),) * 4,
            check_vma=False,
        )
        pp, pcnt, rp, rcnt = sm(
            params, images,
            batch["preferred_ids"], batch["preferred_mask"],
            batch["rejected_ids"], batch["rejected_mask"],
            rng,
        )

        def total(parts, cnts):  # (n_shards, B) -> (B,)
            out = jnp.sum(parts, axis=0)
            if length_normalized:
                out = out / jnp.clip(jnp.sum(cnts, axis=0), 1.0, None)
            return out

        return total(pp, pcnt), total(rp, rcnt)

    def loss_fn(params, ref_params, batch, rng):
        aug_rng, dropout_rng = jax.random.split(rng)
        images = prepare_images(batch["image"])
        if augment:
            images = augment_batch(aug_rng, images, enabled=True)
        if batch["preferred_ids"].shape[1] % n_shards != 0:
            raise ValueError(
                f"sequence length {batch['preferred_ids'].shape[1]} not divisible "
                f"by CP degree {n_shards}"
            )

        pc, pr = _partials(params, images, batch, dropout_rng, with_dropout=policy_dropout)

        rc = rr = None
        if not reference_free and ref_params is not None:
            rc, rr = _partials(
                jax.lax.stop_gradient(ref_params), images, batch,
                dropout_rng, with_dropout=False,
            )

        loss, metrics = dpo_loss(
            pc, pr, rc, rr, beta=beta,
            label_smoothing=label_smoothing, reference_free=reference_free,
        )
        metrics["loss"] = loss
        metrics["policy_chosen_logp"] = pc.mean()
        metrics["policy_rejected_logp"] = pr.mean()
        return loss, metrics

    return loss_fn


def make_stage2_cp_train_step(
    module,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "seq",
    beta: float = 0.1,
    reference_free: bool = False,
    length_normalized: bool = False,
    label_smoothing: float = 0.0,
    augment: bool = True,
    use_fused_ce: bool = False,
    data_axis=None,
    tp_axis: Optional[str] = None,
) -> Callable:
    """fn(state, ref_params, batch, rng) -> (state, metrics), context-parallel.

    Pass the PLAIN composed module — the CP clone is made here. Semantics
    (NaN-safe update, metrics) match
    :func:`pgica_tpu.training.train_step.make_stage2_train_step`.
    """
    module_cp = make_cp_module(module, axis_name)
    loss_fn = make_stage2_cp_loss_fn(
        module_cp, mesh, axis_name, beta, reference_free, length_normalized,
        label_smoothing, augment, use_fused_ce, data_axis, tp_axis=tp_axis,
    )

    def step(state: TrainState, ref_params, batch, rng, base_params=None):
        # base_params accepted for trainer signature parity (LoRA is not
        # supported under CP — guarded in the trainer)
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, ref_params, batch, rng
        )
        new_state, grad_norm = _apply_update(state, grads, optimizer, loss)
        metrics["grad_norm"] = grad_norm
        metrics["skipped"] = new_state.skipped
        return new_state, metrics

    return step


def make_stage2_cp_eval_step(
    module,
    mesh: Mesh,
    axis_name: str = "seq",
    beta: float = 0.1,
    reference_free: bool = False,
    length_normalized: bool = False,
    use_fused_ce: bool = False,
    data_axis=None,
    tp_axis: Optional[str] = None,
) -> Callable:
    """fn(params, ref_params, batch, base_params=None) -> metrics — the
    deterministic CP analog of make_stage2_eval_step."""
    module_cp = make_cp_module(module, axis_name)
    loss_fn = make_stage2_cp_loss_fn(
        module_cp, mesh, axis_name, beta, reference_free, length_normalized,
        augment=False, use_fused_ce=use_fused_ce, data_axis=data_axis,
        policy_dropout=False, tp_axis=tp_axis,
    )

    def step(params, ref_params, batch, base_params=None):
        loss, metrics = loss_fn(params, ref_params, batch, jax.random.PRNGKey(0))
        metrics["loss"] = loss
        return metrics

    return step
