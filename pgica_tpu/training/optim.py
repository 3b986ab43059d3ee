"""Optimizer factory: AdamW + warmup-cosine, grad-accum, backbone freezing.

Reference semantics (trainer.py:258-294): per-stage AdamW with linear warmup
then cosine decay to ~0, gradient clipping, gradient accumulation. Freezing
(reference model.py:150-164 freezes via requires_grad) is an optimizer
partition here — frozen subtrees get `optax.set_to_zero`, so one module
serves frozen and unfrozen configs and XLA can still fuse the full forward.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


def warmup_cosine_schedule(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    warmup_steps = max(1, min(warmup_steps, max(total_steps - 1, 1)))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=learning_rate * 1e-5,
    )


def freeze_labels(
    params: Any,
    freeze_vision_backbone: bool,
    freeze_text_backbone: bool,
    frozen_prefixes: tuple = (),
) -> Any:
    """Label pytree: 'frozen' for frozen backbone params, 'train' otherwise.

    ``frozen_prefixes`` freezes arbitrary subtree path prefixes. The trainer
    uses it to exclude modules OUTSIDE the stage's gradient graph (stage 1:
    caption decoder; stage 2: text encoder): torch AdamW skips params whose
    ``.grad`` is None, so the reference never touches them
    (reference trainer.py:274-281), while optax.adamw would still apply
    weight decay to a zero-gradient leaf — silently shrinking untrained
    modules every step.
    """
    prefixes = [list(p) for p in frozen_prefixes]

    def label(key_path, _leaf) -> str:
        keys = [getattr(k, "key", str(k)) for k in key_path]
        if freeze_vision_backbone and keys[:2] == ["vision_encoder", "backbone"]:
            return "frozen"
        if freeze_text_backbone and keys[:2] == ["text_encoder", "backbone"]:
            return "frozen"
        if any(keys[: len(p)] == p for p in prefixes):
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def create_optimizer(
    learning_rate: float,
    total_steps: int,
    warmup_steps: int = 500,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    gradient_accumulation_steps: int = 1,
    params_for_freezing: Optional[Any] = None,
    freeze_vision_backbone: bool = False,
    freeze_text_backbone: bool = False,
    frozen_prefixes: tuple = (),
) -> optax.GradientTransformation:
    schedule = warmup_cosine_schedule(learning_rate, warmup_steps, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if params_for_freezing is not None and (
        freeze_vision_backbone or freeze_text_backbone or frozen_prefixes
    ):
        labels = freeze_labels(
            params_for_freezing, freeze_vision_backbone, freeze_text_backbone,
            frozen_prefixes,
        )
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx
