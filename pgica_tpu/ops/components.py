"""Loss-component library (reference C13, components.py:24-362).

The reference ships a parallel set of loss building blocks that its trainer
mostly does not use; they are part of the public capability surface, so the
TPU-native equivalents live here:

* :class:`TemperatureScaledSimilarity` — similarity matrix with a fixed or
  **learnable** temperature, clamped to [0.1, 2.0]
  (reference components.py:24-83).
* :class:`ContrastiveLossModule` — NT-Xent built on it
  (reference components.py:86-145).
* DPO with reference logprobs — :func:`pgica_tpu.ops.losses.dpo_loss`.
* NaN-safe gradient handling — :func:`nan_safe_gradients` (functional analog
  of reference components.py:252-318; the trainer's on-device variant lives
  in training/train_step.py:_apply_update).
* sequence logprobs (summed) — :func:`pgica_tpu.ops.losses.sequence_logprobs`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pgica_tpu.ops.losses import _ce_rows, l2_normalize

TEMP_MIN, TEMP_MAX = 0.1, 2.0  # reference clamp bounds (components.py:78)


class TemperatureScaledSimilarity(nn.Module):
    """Cosine similarity matrix scaled by a (learnable) clamped temperature."""

    initial_temperature: float = 0.5
    learnable: bool = True

    @nn.compact
    def __call__(self, image_embeddings: jax.Array, text_embeddings: jax.Array) -> jax.Array:
        img = l2_normalize(image_embeddings.astype(jnp.float32))
        txt = l2_normalize(text_embeddings.astype(jnp.float32))
        if self.learnable:
            log_temp = self.param(
                "log_temperature",
                lambda *_: jnp.log(jnp.asarray(self.initial_temperature, jnp.float32)),
            )
            temperature = jnp.clip(jnp.exp(log_temp), TEMP_MIN, TEMP_MAX)
        else:
            temperature = jnp.clip(
                jnp.asarray(self.initial_temperature, jnp.float32), TEMP_MIN, TEMP_MAX
            )
        return img @ txt.T / temperature

    def current_temperature(self, params: Dict) -> float:
        if not self.learnable:
            return float(jnp.clip(self.initial_temperature, TEMP_MIN, TEMP_MAX))
        return float(jnp.clip(jnp.exp(params["log_temperature"]), TEMP_MIN, TEMP_MAX))


class ContrastiveLossModule(nn.Module):
    """NT-Xent over a TemperatureScaledSimilarity (reference components.py:86-145)."""

    initial_temperature: float = 0.5
    learnable_temperature: bool = True

    @nn.compact
    def __call__(
        self, image_embeddings: jax.Array, text_embeddings: jax.Array
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        sim = TemperatureScaledSimilarity(
            self.initial_temperature, self.learnable_temperature, name="similarity"
        )(image_embeddings, text_embeddings)
        labels = jnp.arange(sim.shape[0])
        loss_i2t = _ce_rows(sim, labels).mean()
        loss_t2i = _ce_rows(sim.T, labels).mean()
        loss = 0.5 * (loss_i2t + loss_t2i)
        acc = (jnp.argmax(sim, axis=-1) == labels).astype(jnp.float32).mean()
        return loss, {"loss_i2t": loss_i2t, "loss_t2i": loss_t2i, "accuracy": acc}


def nan_safe_gradients(
    grads: Any, max_norm: Optional[float] = None
) -> Tuple[Any, jax.Array, jax.Array]:
    """(clipped_grads, global_norm, all_finite) — on-device, no host sync.

    Functional analog of the reference's NaNSafeGradientNorm
    (components.py:252-318): compute the global norm, report finiteness, and
    optionally clip. Callers zero the update when ``all_finite`` is False
    (see training/train_step.py:_apply_update).
    """
    norm = optax.global_norm(grads)
    finite = jnp.isfinite(norm)
    if max_norm is not None:
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
    return grads, norm, finite
