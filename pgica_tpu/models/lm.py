"""Decoder-only transformer LM (GPT-2 and Llama architecture families).

One module serves both the text encoder tower (reference C8: GPT-2 Medium via
``AutoModel``, model.py:246-474) and the caption decoder backbone (reference
C9: ``GPT2LMHeadModel``, model.py:477-678). Architecture is switched by
``LMConfig.arch``:

* ``gpt2``  — learned positional embeddings, LayerNorm, GELU MLP.
* ``llama`` — RoPE, RMSNorm, SwiGLU MLP, optional GQA.

Decode-time use threads an explicit, functional KV cache (tuple per layer)
through ``__call__`` — static shapes, jit/scan-friendly.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pgica_tpu.models.layers import KVCache, TransformerBlock, make_norm
from pgica_tpu.models.presets import LMConfig


def init_kv_cache(cfg: LMConfig, batch: int, max_len: int, dtype=jnp.float32):
    """Allocate an all-zeros KV cache pytree for decode.

    Unrolled models get a list of per-layer (k, v) tuples; ``scan_layers``
    models get ONE (k, v) tuple with a leading num_layers dim (the layout
    ``lax.scan`` slices/stacks along axis 0).
    """
    shape = (batch, cfg.kv_heads, max_len, cfg.head_dim)
    if cfg.scan_layers:
        stacked = (cfg.num_layers,) + shape
        return (jnp.zeros(stacked, dtype), jnp.zeros(stacked, dtype))
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)) for _ in range(cfg.num_layers)
    ]


class TransformerLM(nn.Module):
    """Causal transformer over input embeddings, with optional LM head."""

    config: LMConfig
    with_lm_head: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    # Context parallelism (run inside shard_map with the sequence dim sharded
    # over this axis): self-attention goes through ops/ring_attention and
    # GPT-2's learned positions use each shard's GLOBAL offsets.
    ring_axis: Optional[str] = None
    # Explicit ZeRO-3 (requires scan_layers; run inside shard_map): block
    # params arrive as last-dim shards over this axis and are all-gathered
    # INSIDE the scan body — one layer's full weights live at a time, remat
    # re-gathers on backward, and the gather's transpose reduce-scatters the
    # grads. See parallel/zero3.py.
    fsdp_axis: Optional[str] = None
    # Inference-only int8 block matmuls ("int8" W8A8 / "int8_weight_only");
    # see ops/quant.py. Embeddings and the weight-tied LM head stay at the
    # compute dtype. Incompatible with training-time transforms.
    quant: Optional[str] = None

    def setup(self):
        cfg = self.config
        if self.quant and (self.fsdp_axis or self.ring_axis or self.remat):
            raise ValueError("quant is an inference-only transform (no fsdp/ring/remat)")
        self.wte = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(0.02), name="wte",
        )
        if cfg.arch == "gpt2":
            self.wpe = nn.Embed(
                cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                param_dtype=jnp.float32, embedding_init=nn.initializers.normal(0.01),
                name="wpe",
            )
        block_cls = TransformerBlock
        if self.fsdp_axis is not None:
            if not cfg.scan_layers:
                raise ValueError("fsdp_axis (explicit ZeRO-3) requires scan_layers")
            from pgica_tpu.parallel.zero3 import gather_layer_params

            axis = self.fsdp_axis
            # Gather one layer's weights inside the scan body (and, with
            # remat wrapping OUTSIDE this, inside the remat region — the
            # backward pass re-gathers instead of saving the full layer).
            block_cls = nn.map_variables(
                block_cls, "params",
                trans_in_fn=lambda vs: gather_layer_params(vs, axis),
                mutable=False,
            )
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(5,))
        block_kwargs = dict(
            hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads,
            num_kv_heads=cfg.num_kv_heads,
            intermediate_size=int(cfg.hidden_size * cfg.mlp_ratio),
            causal=True,
            dropout=cfg.dropout,
            norm="rmsnorm" if cfg.arch == "llama" else "layernorm",
            norm_eps=cfg.norm_eps,
            mlp_kind="swiglu" if cfg.arch == "llama" else "gelu",
            use_bias=cfg.arch != "llama",
            use_rope=cfg.arch == "llama",
            rope_theta=cfg.rope_theta,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ring_axis=self.ring_axis,
            quant=self.quant,
        )
        if cfg.scan_layers:
            # One block body scanned num_layers times over stacked params
            # (leading layer dim). Under an fsdp-sharded mesh this is ZeRO-3:
            # GSPMD places the weight all-gathers inside the scan body, so
            # only one layer's full weights are live at a time, and remat
            # re-gathers them on the backward pass.
            scan_cls = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, 0, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=cfg.num_layers,
            )
            self.blocks_scan = scan_cls(**block_kwargs, name="blocks")
            self.blocks = []
        else:
            self.blocks = [
                block_cls(**block_kwargs, name=f"block_{i}")
                for i in range(cfg.num_layers)
            ]
        self.ln_f = make_norm("rmsnorm" if cfg.arch == "llama" else "layernorm", self.dtype, cfg.norm_eps)

    def embed(self, input_ids: jax.Array, position_offset: int = 0) -> jax.Array:
        """Token (+ learned position) embeddings for GPT-2; token only for llama."""
        x = self.wte(input_ids)
        if self.config.arch == "gpt2":
            positions = jnp.arange(input_ids.shape[1]) + position_offset
            x = x + self.wpe(positions)[None]
        return x

    def __call__(
        self,
        input_ids: Optional[jax.Array] = None,
        inputs_embeds: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        caches: Optional[List[KVCache]] = None,
        position: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> dict:
        """Forward pass.

        Args:
            input_ids: (B, S) int tokens (mutually exclusive with inputs_embeds).
            inputs_embeds: (B, S, hidden) pre-computed embeddings — the caption
                decoder injects vision-conditioned embeddings here, mirroring
                the reference's ``lm_model(inputs_embeds=...)`` path
                (reference model.py:604-610).
            attention_mask: (B, S) 1/0 padding mask, or (B, max_len) when
                decoding with caches.
            caches: per-layer KV caches for decode; ``position`` is the write
                index of the incoming token(s).

        Returns dict with ``hidden_states`` (B, S, hidden), ``logits`` when
        ``with_lm_head``, and ``caches`` (updated, or None).
        """
        cfg = self.config
        if inputs_embeds is None:
            if input_ids is None:
                raise ValueError("Provide input_ids or inputs_embeds")
            x = self.wte(input_ids)
            if cfg.arch == "gpt2":
                offset = 0 if position is None else position
                if self.ring_axis is not None and caches is None:
                    offset = jax.lax.axis_index(self.ring_axis) * input_ids.shape[1]
                pos_ids = jnp.arange(input_ids.shape[1]) + offset
                x = x + self.wpe(pos_ids)[None]
        else:
            x = inputs_embeds.astype(self.dtype)

        # Build the attention bias mask (B, 1, Sq, Sk) from the padding mask.
        mask4 = None
        if attention_mask is not None:
            if caches is not None:
                # decode: query attends over the cache timeline
                mask4 = attention_mask[:, None, None, :].astype(bool)
            else:
                mask4 = attention_mask[:, None, None, :].astype(bool)

        if cfg.scan_layers:
            x, new_caches = self.blocks_scan(x, mask4, caches, position, deterministic)
        else:
            new_caches: Optional[List[KVCache]] = [] if caches is not None else None
            for i, block in enumerate(self.blocks):
                cache_i = caches[i] if caches is not None else None
                x, updated = block(x, mask4, cache_i, position, deterministic)
                if new_caches is not None:
                    new_caches.append(updated)

        x = self.ln_f(x)
        out = {"hidden_states": x, "caches": new_caches}
        if self.with_lm_head:
            # Weight-tied LM head (GPT-2 convention): logits = h @ wte.T
            out["logits"] = self.wte.attend(x)
        return out
