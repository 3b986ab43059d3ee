"""Core transformer building blocks (Flax linen).

Shared by the vision tower, the text tower, and the caption decoder. Designed
TPU-first: static shapes, bf16-friendly compute dtype, attention dispatched
through :func:`pgica_tpu.ops.attention.dot_product_attention` (Pallas flash
attention on TPU), functional KV caches threaded explicitly through decode
loops (no mutable state), and optional rematerialization for HBM savings.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn

from pgica_tpu.ops.dropout import FastDropout
import jax
import jax.numpy as jnp

from pgica_tpu.ops.attention import dot_product_attention

KVCache = Tuple[jax.Array, jax.Array]  # (k, v): (B, H_kv, max_len, D)


def make_norm(kind: str, dtype, eps: float = 1e-5) -> nn.Module:
    """eps defaults to 1e-5 (HF GPT-2/CLIP convention, for weight-import parity).

    LayerNorm goes through :class:`pgica_tpu.ops.layernorm.FusedLayerNorm`:
    identical params/semantics to ``nn.LayerNorm(param_dtype=f32)``, but on
    TPU the statically-large-row calls run the pallas fused fwd/bwd kernel
    (CPU and small/decode shapes keep the jnp reference path).
    """
    from pgica_tpu.ops.layernorm import FusedLayerNorm, RMSNorm

    if kind == "rmsnorm":
        return RMSNorm(dtype=dtype, epsilon=eps)
    return FusedLayerNorm(dtype=dtype, epsilon=eps)


def rotary_embedding(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Apply RoPE to (B, H, S, D) given integer positions (B, S) or (S,)."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # (B,1,S,D/2)
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out1 = x1 * cos - x2 * sin
    out2 = x2 * cos + x1 * sin
    return jnp.stack([out1, out2], axis=-1).reshape(x.shape).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention with optional GQA, RoPE, and KV cache.

    Tensor-parallel note: q/k/v/out projections are Dense over the hidden dim;
    under a mesh they are sharded over the 'model' axis via the logical
    partitioning rules in :mod:`pgica_tpu.parallel.sharding`.
    """

    hidden_size: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    causal: bool = False
    dropout: float = 0.0
    use_rope: bool = False
    rope_theta: float = 500000.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    # Context parallelism: mesh axis the SEQUENCE dim is sharded over. The
    # module must then run inside shard_map with sequence-sharded activations;
    # self-attention dispatches to ops/ring_attention (KV blocks rotate over
    # ICI). Decode (cache) and cross-attention paths are unaffected.
    ring_axis: Optional[str] = None
    # Inference-only int8 projections ("int8" W8A8 / "int8_weight_only" W8);
    # see ops/quant.py. Param tree changes (kernel -> kernel_q + scale).
    quant: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        position: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        """Returns (output, updated_cache).

        Args:
            x: query input (B, Sq, hidden).
            kv: key/value input for cross-attention; defaults to ``x``.
            mask: (B, 1|H, Sq, Sk) boolean/int; 0 = masked.
            cache: optional (k, v) cache of shape (B, H_kv, max_len, D).
                When given, new k/v are written at ``position`` and attention
                runs over the full cache (decode step, Sq is typically 1).
            position: scalar or (B,) int positions of the incoming tokens
                (required with cache or rope at decode time).
        """
        kv_src = x if kv is None else kv
        n_kv = self.num_kv_heads or self.num_heads
        head_dim = self.hidden_size // self.num_heads
        if self.quant:
            from pgica_tpu.ops.quant import QuantDenseGeneral

            dense = functools.partial(
                QuantDenseGeneral, dtype=self.dtype, use_bias=self.use_bias,
                weight_only=self.quant == "int8_weight_only",
            )
        else:
            dense = functools.partial(
                nn.DenseGeneral, dtype=self.dtype, param_dtype=jnp.float32,
                use_bias=self.use_bias,
            )
        q = dense(features=(self.num_heads, head_dim), name="q_proj")(x)
        k = dense(features=(n_kv, head_dim), name="k_proj")(kv_src)
        v = dense(features=(n_kv, head_dim), name="v_proj")(kv_src)
        # (B, S, H, D) -> (B, H, S, D)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

        ring = self.ring_axis is not None and cache is None and kv is None
        if self.use_rope:
            sq = x.shape[1]
            if ring:
                # global positions: this shard owns [idx*sq, (idx+1)*sq)
                pos_q = jax.lax.axis_index(self.ring_axis) * sq + jnp.arange(sq)
            elif position is None:
                pos_q = jnp.arange(sq)
            else:
                pos_q = jnp.atleast_1d(jnp.asarray(position))
                if pos_q.ndim == 1 and pos_q.shape[0] != sq:
                    pos_q = pos_q[:, None] + jnp.arange(sq)[None, :] if pos_q.shape[0] == x.shape[0] else pos_q
            q = rotary_embedding(q, pos_q, self.rope_theta)
            k = rotary_embedding(k, pos_q, self.rope_theta)

        new_cache: Optional[KVCache] = None
        if cache is not None:
            k_cache, v_cache = cache
            pos = position if position is not None else 0
            pos_arr = jnp.asarray(pos)
            if pos_arr.ndim == 0:
                k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, 0, pos, 0))
                v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, 0, pos, 0))
            else:
                # Per-row write positions (continuous-batching decode: each
                # slot sits at its own timestep; Sq == 1). A one-hot select is
                # O(cache) elementwise traffic — the same order as the
                # attention read over the cache each step — and avoids TPU
                # scatter. Rows whose position is out of range write nothing.
                hit = (jnp.arange(k_cache.shape[2])[None, :] == pos_arr[:, None])[:, None, :, None]
                k_cache = jnp.where(hit, k.astype(k_cache.dtype), k_cache)
                v_cache = jnp.where(hit, v.astype(v_cache.dtype), v_cache)
            k, v = k_cache, v_cache
            new_cache = (k_cache, v_cache)

        if n_kv != self.num_heads:  # GQA: repeat kv heads
            rep = self.num_heads // n_kv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        causal = self.causal and cache is None  # decode masking handled via `mask`
        if ring:
            from pgica_tpu.ops.ring_attention import NEG_INF, ring_attention

            kv_bias = None
            if mask is not None:
                # (B, 1, 1, S_local) key-padding mask -> additive key bias
                keep = mask[:, 0, 0, :].astype(bool)
                kv_bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
            out = ring_attention(q, k, v, self.ring_axis, causal=causal, kv_bias=kv_bias)
        else:
            out = dot_product_attention(q, k, v, mask=mask, causal=causal, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3)  # (B, Sq, H, D)
        if self.quant:
            from pgica_tpu.ops.quant import QuantDenseGeneral

            out = QuantDenseGeneral(
                features=self.hidden_size, axis=(-2, -1), dtype=self.dtype,
                use_bias=self.use_bias, name="out_proj",
                weight_only=self.quant == "int8_weight_only",
            )(out)
        else:
            out = nn.DenseGeneral(
                features=self.hidden_size, axis=(-2, -1), dtype=self.dtype,
                param_dtype=jnp.float32, use_bias=self.use_bias, name="out_proj",
            )(out)
        if self.dropout > 0.0:
            out = FastDropout(self.dropout)(out, deterministic=deterministic)
        return out, new_cache


class MLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    kind: str = "gelu"  # "gelu" (gpt2/vit) | "swiglu" (llama)
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    quant: Optional[str] = None  # inference-only int8 (see ops/quant.py)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.quant:
            from pgica_tpu.ops.quant import QuantDenseGeneral

            dense = functools.partial(
                QuantDenseGeneral, dtype=self.dtype, use_bias=self.use_bias,
                weight_only=self.quant == "int8_weight_only",
            )
        else:
            dense = functools.partial(
                nn.Dense, dtype=self.dtype, param_dtype=jnp.float32, use_bias=self.use_bias
            )
        if self.kind == "swiglu":
            gate = dense(self.intermediate_size, name="gate_proj")(x)
            up = dense(self.intermediate_size, name="up_proj")(x)
            h = nn.silu(gate) * up
            out = dense(self.hidden_size, name="down_proj")(h)
        else:
            h = dense(self.intermediate_size, name="fc_in")(x)
            if self.kind == "quick_gelu":  # CLIP's activation: x * sigmoid(1.702x)
                h = h * nn.sigmoid(1.702 * h)
            else:
                h = nn.gelu(h, approximate=True)
            out = dense(self.hidden_size, name="fc_out")(h)
        if self.dropout > 0.0:
            out = FastDropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm transformer block (used by ViT, GPT-2, and Llama arches)."""

    hidden_size: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    intermediate_size: int = 0
    causal: bool = False
    dropout: float = 0.0
    norm: str = "layernorm"
    norm_eps: float = 1e-5
    mlp_kind: str = "gelu"
    use_rope: bool = False
    rope_theta: float = 500000.0
    use_bias: bool = True
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    ring_axis: Optional[str] = None
    quant: Optional[str] = None  # inference-only int8 (see ops/quant.py)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        position: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        h = make_norm(self.norm, self.dtype, self.norm_eps)(x)
        attn_out, new_cache = MultiHeadAttention(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            causal=self.causal,
            dropout=self.dropout,
            use_rope=self.use_rope,
            rope_theta=self.rope_theta,
            use_bias=self.use_bias,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ring_axis=self.ring_axis,
            quant=self.quant,
            name="attn",
        )(h, mask=mask, cache=cache, position=position, deterministic=deterministic)
        x = x + attn_out
        h = make_norm(self.norm, self.dtype, self.norm_eps)(x)
        inter = self.intermediate_size or 4 * self.hidden_size
        x = x + MLP(
            hidden_size=self.hidden_size,
            intermediate_size=inter,
            kind=self.mlp_kind,
            dropout=self.dropout,
            use_bias=self.use_bias,
            dtype=self.dtype,
            quant=self.quant,
            name="mlp",
        )(h, deterministic=deterministic)
        return x, new_cache
