"""Fused linear-CE kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.ops.fused_ce import _fused, _xla_token_logprobs, fused_token_logprobs

ROWS, D, V = 32, 16, 64


@pytest.fixture
def data(rng):
    h = jnp.asarray(rng.normal(size=(ROWS, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, V, (ROWS,)).astype(np.int32))
    return h, w, y


class TestForward:
    def test_matches_xla(self, data):
        h, w, y = data
        ref = _xla_token_logprobs(h, w, y)
        out = _fused(h, w, y, 8, 16, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_single_vocab_block(self, data):
        h, w, y = data
        ref = _xla_token_logprobs(h, w, y)
        out = _fused(h, w, y, 8, V, True)  # vocab in one block
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_all_logprobs_negative(self, data):
        h, w, y = data
        out = _fused(h, w, y, 8, 16, True)
        assert (np.asarray(out) < 0).all()


class TestBackward:
    def test_grads_match_xla(self, data):
        h, w, y = data
        g = jnp.asarray(np.random.default_rng(1).normal(size=(ROWS,)).astype(np.float32))

        def loss_fused(h, w):
            return jnp.sum(_fused(h, w, y, 8, 16, True) * g)

        def loss_ref(h, w):
            return jnp.sum(_xla_token_logprobs(h, w, y) * g)

        gf = jax.grad(loss_fused, argnums=(0, 1))(h, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-4, err_msg="dh")
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4, err_msg="dW")


class TestDispatch:
    def test_auto_on_cpu_uses_xla(self, data):
        h, w, y = data
        out = fused_token_logprobs(h, w, y)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_xla_token_logprobs(h, w, y)), atol=1e-5
        )
