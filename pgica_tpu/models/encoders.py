"""Text encoder tower (reference C8, model.py:246-474).

GPT-2-style transformer over caption tokens, masked mean pooling with a
clamp-min-1 divisor (exact reference semantics, model.py:450-456), and the
shared 2-layer projection head. Freezing is an optimizer partition, not a
module property.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from pgica_tpu.models.lm import TransformerLM
from pgica_tpu.models.presets import LMConfig
from pgica_tpu.models.vit import ProjectionHead


def masked_mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over unmasked tokens; divisor clamped to >= 1 (reference 450-456)."""
    mask_f = mask.astype(hidden.dtype)[..., None]
    summed = jnp.sum(hidden * mask_f, axis=1)
    denom = jnp.clip(jnp.sum(mask_f, axis=1), 1.0, None)
    return summed / denom


class TextEncoder(nn.Module):
    """Transformer text tower + masked mean pooling + projection head."""

    config: LMConfig
    projection_dim: int = 512
    dropout: float = 0.1
    freeze_backbone: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # Optional externally-constructed transformer to share with the decoder
    # (model.share_text_tower; the reference instead keeps two full GPT-2
    # copies, SURVEY §2.2).
    shared_backbone: Optional[TransformerLM] = None
    # Explicit ZeRO-3 axis (scan_layers only); see TransformerLM.fsdp_axis.
    fsdp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> dict:
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        lm = self.shared_backbone or TransformerLM(
            self.config, with_lm_head=False, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat, name="backbone",
            fsdp_axis=self.fsdp_axis,
        )
        backbone = lm(
            input_ids=input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        hidden = backbone["hidden_states"]
        if self.freeze_backbone:
            hidden = jax.lax.stop_gradient(hidden)
        pooled = masked_mean_pool(hidden, attention_mask)
        embeddings = ProjectionHead(
            self.projection_dim, self.dropout, dtype=self.dtype, name="projection"
        )(pooled, deterministic)
        return {"hidden_states": hidden, "pooled_output": pooled, "embeddings": embeddings}
