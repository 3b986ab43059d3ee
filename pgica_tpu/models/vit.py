"""CLIP-style vision transformer tower (Flax).

Replaces the reference's wrapped ``CLIPModel.vision_model`` (reference
model.py:126-127) with a native implementation: conv patch embedding (NHWC),
class token, learned position embeddings, pre-LN transformer, final LayerNorm
pooling on the CLS token. The patch-embedding conv and every block matmul map
straight onto the MXU; images arrive normalized NHWC from the host pipeline.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from pgica_tpu.ops.layernorm import FusedLayerNorm

from pgica_tpu.ops.dropout import FastDropout
import jax
import jax.numpy as jnp

from pgica_tpu.models.layers import TransformerBlock
from pgica_tpu.models.presets import ViTConfig


class VisionTransformer(nn.Module):
    """ViT backbone; returns per-token features and pooled CLS output."""

    config: ViTConfig
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> dict:
        cfg = self.config
        b, h, w, c = images.shape
        if c != 3:
            raise ValueError(f"Expected 3-channel NHWC images, got shape {images.shape}")
        x = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, N, width)
        n = x.shape[1]

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n + 1, cfg.hidden_size), jnp.float32
        )
        x = x + pos.astype(self.dtype)
        x = FusedLayerNorm(dtype=self.dtype, epsilon=cfg.norm_eps, name="pre_ln")(x)

        block_cls = TransformerBlock
        if self.remat:
            block_cls = nn.remat(TransformerBlock, static_argnums=(5,))
        for i in range(cfg.num_layers):
            x, _ = block_cls(
                hidden_size=cfg.hidden_size,
                num_heads=cfg.num_heads,
                intermediate_size=int(cfg.hidden_size * cfg.mlp_ratio),
                causal=False,
                dropout=cfg.dropout,
                mlp_kind=cfg.hidden_act,
                norm_eps=cfg.norm_eps,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"block_{i}",
            )(x, None, None, None, deterministic)

        features = x
        pooled = FusedLayerNorm(dtype=self.dtype, epsilon=cfg.norm_eps, name="post_ln")(x[:, 0])
        return {"features": features, "pooled_output": pooled}


class ProjectionHead(nn.Module):
    """2-layer projection head: Dense-ReLU-Dropout-Dense-LayerNorm.

    Same stack as the reference heads (reference model.py:136-142, 338-344).
    """

    projection_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.projection_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.relu(x)
        x = FastDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.projection_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        # epsilon 1e-5 = torch nn.LayerNorm default (flax defaults to 1e-6)
        x = FusedLayerNorm(dtype=self.dtype, epsilon=1e-5, name="ln")(x)
        return x


class VisionEncoder(nn.Module):
    """ViT backbone + projection head (reference C7, model.py:64-243).

    Returns ``features`` (B, 1+N, width), ``embeddings`` (B, projection_dim),
    and ``pooled_output`` (B, width). Backbone freezing is handled by the
    optimizer partition (see trainer), not by stop_gradient here, so the same
    module serves frozen and unfrozen configs.
    """

    config: ViTConfig
    projection_dim: int = 512
    dropout: float = 0.1
    freeze_backbone: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> dict:
        if images.ndim != 4:
            raise ValueError(f"Expected 4D NHWC image batch, got {images.shape}")
        backbone = VisionTransformer(
            self.config, dtype=self.dtype, attn_impl=self.attn_impl, remat=self.remat,
            name="backbone",
        )(images, deterministic)
        if self.freeze_backbone:
            # Frozen tower (reference model.py:150-164): stop_gradient here so
            # XLA drops the tower's entire backward pass — the projection head
            # still receives gradients for its own parameters.
            backbone = jax.tree.map(jax.lax.stop_gradient, backbone)
        embeddings = ProjectionHead(
            self.projection_dim, self.dropout, dtype=self.dtype, name="projection"
        )(backbone["pooled_output"], deterministic)
        return {
            "features": backbone["features"],
            "embeddings": embeddings,
            "pooled_output": backbone["pooled_output"],
        }
