"""Multi-head attention dispatch: Pallas flash attention on TPU, XLA fallback.

The hot op of every tower (ViT self-attention, text-tower self-attention,
decoder causal self-attention). Layout is (batch, heads, seq, head_dim).

`dot_product_attention` picks the implementation:

* ``impl="pallas"`` — blockwise flash attention (O(seq) memory) from
  :mod:`pgica_tpu.ops.flash_attention`; TPU backends only.
* ``impl="xla"`` — einsum softmax attention; runs anywhere and is the
  numerics reference for the kernel tests.
* ``impl="auto"`` — pallas on TPU when shapes qualify, else XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask fill; safe in bf16/f32


def _xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    causal: bool,
) -> jax.Array:
    """Reference softmax attention. q,k,v: (B, H, S, D); mask: (B, 1|H, Sq, Sk)."""
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(depth).astype(scores.dtype)
    if causal:
        sq, sk = scores.shape[-2], scores.shape[-1]
        causal_mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
        scores = jnp.where(causal_mask[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)


def _pallas_supported(q: jax.Array, k: jax.Array) -> bool:
    if jax.default_backend() in ("cpu",):
        return False
    # Crossover measured on v5e (bench grid, ViT-B/32+GPT-2-Medium): at
    # seq<=128 / head_dim 64 XLA's fused attention wins (flash pads d=64 to
    # 128 lanes and adds loop overhead); flash pays off once the S^2 score
    # matrix stops fitting comfortably — long sequences with 128-wide heads
    # (the Llama-8B scaled config).
    return q.shape[-1] >= 128 and q.shape[-2] >= 256 and k.shape[-2] >= 256


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Scaled dot-product attention over (B, H, S, D) tensors.

    Args:
        mask: optional boolean/int mask broadcastable to (B, H, Sq, Sk);
            positions with 0/False are masked out.
        causal: apply a causal (lower-triangular) mask.
        impl: "auto" | "xla" | "pallas".
    """
    if impl == "auto":
        impl = "pallas" if _pallas_supported(q, k) else "xla"
    if impl == "pallas":
        from pgica_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, causal=causal)
    return _xla_attention(q, k, v, mask, causal)
