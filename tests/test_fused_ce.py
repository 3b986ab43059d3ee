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


class TestFusedNTXent:
    def test_matches_plain_ntxent(self, rng):
        from pgica_tpu.ops.losses import l2_normalize, ntxent_loss, ntxent_loss_fused

        img = l2_normalize(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
        txt = l2_normalize(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
        plain, _ = ntxent_loss(img, txt, temperature=0.5)
        fused, _ = ntxent_loss_fused(img, txt, temperature=0.5)
        np.testing.assert_allclose(float(fused), float(plain), rtol=1e-5)

    def test_matches_over_8_device_mesh(self, rng):
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from pgica_tpu.ops.losses import l2_normalize, ntxent_loss, ntxent_loss_fused

        img = l2_normalize(jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)))
        txt = l2_normalize(jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)))
        full, _ = ntxent_loss(img, txt, temperature=0.5)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        fn = shard_map(
            lambda a, b: ntxent_loss_fused(a, b, temperature=0.5, axis_name="data")[0][None],
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        )
        per_device = fn(img, txt)
        np.testing.assert_allclose(float(jnp.mean(per_device)), float(full), rtol=1e-5)

    def test_gradients_match(self, rng):
        from pgica_tpu.ops.losses import l2_normalize, ntxent_loss, ntxent_loss_fused

        img = l2_normalize(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
        txt = l2_normalize(jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)))
        g_plain = jax.grad(lambda a: ntxent_loss(a, txt, 0.5)[0])(img)
        g_fused = jax.grad(lambda a: ntxent_loss_fused(a, txt, 0.5)[0])(img)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain), atol=1e-5)


class TestNonDivisibleVocab:
    """Regression: vocab not divisible by block_vocab (e.g. GPT-2's 50257)."""

    def test_forward_matches_xla(self, rng):
        h = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(67, 8)).astype(np.float32))  # 67 % 16 != 0
        y = jnp.asarray(rng.integers(0, 67, (16,)).astype(np.int32))
        ref = _xla_token_logprobs(h, w, y)
        out = _fused(h, w, y, 8, 16, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_targets_in_final_partial_block(self, rng):
        h = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(67, 8)).astype(np.float32))
        y = jnp.full((8,), 66, jnp.int32)  # last row of the partial block
        ref = _xla_token_logprobs(h, w, y)
        out = _fused(h, w, y, 8, 16, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_grads_match_xla(self, rng):
        h = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(67, 8)).astype(np.float32))
        y = jnp.asarray(rng.integers(0, 67, (8,)).astype(np.int32))
        gf = jax.grad(lambda h, w: jnp.sum(_fused(h, w, y, 8, 16, True)), argnums=(0, 1))(h, w)
        gr = jax.grad(lambda h, w: jnp.sum(_xla_token_logprobs(h, w, y)), argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4)
