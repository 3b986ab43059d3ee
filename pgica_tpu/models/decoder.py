"""Vision-conditioned caption decoder (reference C9, model.py:477-678).

Structure mirrors the reference's intent, TPU-natively:

* ``vision_projection``: Dense(projection_dim -> hidden)-tanh-dropout
  (reference model.py:521-525).
* ``cross_attention``: 8-head attention where caption token embeddings (query)
  attend to the single projected vision token (key/value), with residual +
  LayerNorm (reference model.py:528-535, 594-601).
* causal transformer LM with weight-tied head over the shared vocabulary.

Training forward embeds tokens, fuses the vision token via cross-attention,
and runs the LM on ``inputs_embeds`` — one fused jitted graph instead of the
reference's separate module calls.

Decode path: the projected vision embedding is the FIRST position of the
sequence and subsequent tokens extend it, matching the reference's
generation-time seeding (model.py:611-617). Like the reference, the
cross-attention layer is NOT applied at decode time (reference asymmetry,
SURVEY §3.3); set ``cross_attend_at_decode=True`` to fix it (documented
deviation, default off for parity).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn

from pgica_tpu.ops.layernorm import FusedLayerNorm

from pgica_tpu.ops.dropout import FastDropout
import jax
import jax.numpy as jnp

from pgica_tpu.models.layers import KVCache, MultiHeadAttention
from pgica_tpu.models.lm import TransformerLM
from pgica_tpu.models.presets import LMConfig


class CaptionDecoder(nn.Module):
    config: LMConfig
    projection_dim: int = 512
    num_cross_heads: int = 8
    dropout: float = 0.1
    cross_attend_at_decode: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    shared_lm: Optional[TransformerLM] = None
    # Context parallelism: when set, the training forward must run inside
    # shard_map with caption_ids/caption_mask sharded over this mesh axis
    # (sequence dim). Self-attention rides ops/ring_attention and GPT-2's
    # learned positions use each shard's GLOBAL offsets. The vision token is
    # replicated per shard (cross-attention is shard-local). Decode paths are
    # unaffected (caches force the non-ring branch).
    ring_axis: Optional[str] = None
    # Explicit ZeRO-3 axis (scan_layers only); see TransformerLM.fsdp_axis.
    fsdp_axis: Optional[str] = None
    # Inference-only int8 LM-block matmuls (ops/quant.py). The cross-attention
    # and vision projection stay at the compute dtype (single-token KV —
    # negligible weight bytes in the decode loop).
    quant: Optional[str] = None

    def setup(self):
        self.vision_projection = nn.Sequential(
            [
                nn.Dense(self.config.hidden_size, dtype=self.dtype, param_dtype=jnp.float32),
                nn.tanh,
            ]
        )
        self.vision_dropout = FastDropout(self.dropout)
        self.cross_attention = MultiHeadAttention(
            hidden_size=self.config.hidden_size,
            num_heads=self.num_cross_heads,
            dropout=self.dropout,
            dtype=self.dtype,
            attn_impl="xla",  # single-KV-token attention: MXU-trivial, not flash-worthy
        )
        # epsilon 1e-5 = torch nn.LayerNorm default (reference attention_norm)
        self.cross_ln = FusedLayerNorm(dtype=self.dtype, epsilon=1e-5)
        self.lm = self.shared_lm or TransformerLM(
            self.config, with_lm_head=True, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=self.remat, ring_axis=self.ring_axis,
            fsdp_axis=self.fsdp_axis, quant=self.quant,
        )

    def project_vision(self, vision_embeddings: jax.Array, deterministic: bool = True) -> jax.Array:
        """(B, projection_dim) -> (B, 1, hidden) vision token."""
        v = self.vision_projection(vision_embeddings.astype(self.dtype))
        v = self.vision_dropout(v, deterministic=deterministic)
        return v[:, None, :]

    def fuse(
        self, token_embeds: jax.Array, vision_token: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Cross-attend token embeddings to the vision token; residual + LN."""
        attended, _ = self.cross_attention(
            token_embeds, kv=vision_token, deterministic=deterministic
        )
        return self.cross_ln(token_embeds + attended)

    def __call__(
        self,
        caption_ids: jax.Array,
        caption_mask: Optional[jax.Array],
        vision_embeddings: jax.Array,
        deterministic: bool = True,
    ) -> dict:
        """Teacher-forced training forward. Returns ``logits`` (B, S, V)."""
        if caption_mask is None:
            caption_mask = jnp.ones_like(caption_ids)
        vision_token = self.project_vision(vision_embeddings, deterministic)
        # Cross-attention fuses TOKEN-ONLY embeddings (reference model.py:591:
        # wte(input_ids), no positions); learned positions are added AFTER the
        # residual+LN, exactly where HF GPT-2's inputs_embeds path adds wpe
        # (changed round 3 — previously wpe was inside the fusion/LN).
        token_embeds = self.lm.wte(caption_ids)
        fused = self.fuse(token_embeds, vision_token, deterministic)
        if self.config.arch == "gpt2":
            position_offset = 0
            if self.ring_axis is not None:
                # sequence-sharded: this shard owns global positions
                # [idx * S_local, (idx + 1) * S_local)
                position_offset = jax.lax.axis_index(self.ring_axis) * caption_ids.shape[1]
            positions = jnp.arange(caption_ids.shape[1]) + position_offset
            fused = fused + self.lm.wpe(positions)[None]
        out = self.lm(
            inputs_embeds=fused, attention_mask=caption_mask, deterministic=deterministic
        )
        return {"logits": out["logits"], "hidden_states": out["hidden_states"]}

    # -- decode-time pieces (used by pgica_tpu.generation.decode) -----------------

    def decode_prefix(
        self, vision_embeddings: jax.Array, caches: List[KVCache], attention_mask: jax.Array
    ) -> Tuple[jax.Array, List[KVCache]]:
        """Run the vision token through the LM at position 0, priming caches.

        Returns (logits_for_first_token, updated_caches).
        """
        vision_token = self.project_vision(vision_embeddings, deterministic=True)
        if self.config.arch == "gpt2":
            # HF adds wpe(0) to the vision seed inside the inputs_embeds path
            # (reference model.py:611-617) — mirror it (fixed round 3).
            vision_token = vision_token + self.lm.wpe(jnp.arange(1))[None]
        out = self.lm(
            inputs_embeds=vision_token,
            attention_mask=attention_mask,
            caches=caches,
            position=0,
        )
        return out["logits"][:, -1, :], out["caches"]

    def decode_step(
        self,
        token_ids: jax.Array,
        position: jax.Array,
        caches: List[KVCache],
        attention_mask: jax.Array,
        vision_embeddings: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, List[KVCache]]:
        """One autoregressive step: (B, 1) token -> (B, V) next-token logits."""
        embeds = self.lm.wte(token_ids)
        if self.cross_attend_at_decode and vision_embeddings is not None:
            # fuse on token-only embeds, positions after (same order as training)
            vision_token = self.project_vision(vision_embeddings, deterministic=True)
            embeds = self.fuse(embeds, vision_token, deterministic=True)
        if self.config.arch == "gpt2":
            pos_arr = jnp.atleast_1d(jnp.asarray(position))
            pe = self.lm.wpe(pos_arr)
            if pos_arr.shape[0] == embeds.shape[0] and embeds.shape[0] > 1:
                # per-row positions (continuous-batching decode, Sq == 1)
                embeds = embeds + pe[:, None, :]
            else:
                embeds = embeds + pe[None]
        out = self.lm(
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            caches=caches,
            position=position,
        )
        return out["logits"][:, -1, :], out["caches"]
