"""Pallas flash-attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.ops.attention import _xla_attention
from pgica_tpu.ops.flash_attention import flash_attention

B, H, D = 2, 2, 16


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.fixture
def qkv(rng):
    return (_rand(rng, B, H, 64, D), _rand(rng, B, H, 64, D), _rand(rng, B, H, 64, D))


class TestForward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_matches_xla(self, qkv, causal):
        q, k, v = qkv
        ref = _xla_attention(q, k, v, None, causal)
        out = flash_attention(q, k, v, causal=causal, block_q=16, block_kv=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_uneven_blocks(self, rng):
        q = _rand(rng, 1, 1, 48, D)  # 48 not divisible by 32 -> falls to 16
        ref = _xla_attention(q, q, q, None, False)
        out = flash_attention(q, q, q, block_q=32, block_kv=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_key_padding_mask(self, qkv):
        q, k, v = qkv
        mask = jnp.ones((B, 1, 1, 64), jnp.int32).at[:, :, :, 40:].set(0)
        ref = _xla_attention(q, k, v, mask, False)
        out = flash_attention(q, k, v, mask=mask, block_q=16, block_kv=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_attention_shapes(self, rng):
        q = _rand(rng, B, H, 32, D)
        k = _rand(rng, B, H, 64, D)
        v = _rand(rng, B, H, 64, D)
        ref = _xla_attention(q, k, v, None, False)
        out = flash_attention(q, k, v, block_q=16, block_kv=16, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestBackward:
    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_xla(self, qkv, causal):
        q, k, v = qkv

        def loss_flash(q, k, v):
            out = flash_attention(q, k, v, causal=causal, block_q=16, block_kv=16, interpret=True)
            return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

        def loss_ref(q, k, v):
            out = _xla_attention(q, k, v, None, causal)
            return jnp.sum(out * jnp.cos(out))

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{name} mismatch"
            )

    def test_masked_grads_match_xla(self, qkv):
        q, k, v = qkv
        mask = jnp.ones((B, 1, 1, 64), jnp.int32).at[:, :, :, 50:].set(0)

        def loss_flash(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, mask=mask, block_q=16, block_kv=16, interpret=True) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, mask, False) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
