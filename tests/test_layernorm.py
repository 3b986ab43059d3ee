"""Pallas fused LayerNorm parity tests (interpret mode on CPU).

Mirrors the kernel-equivalence strategy of test_fused_ce.py: value AND
gradient parity against the jnp/flax reference at f32 and bf16, odd row
counts for the padding path, and module-level param-name compatibility
with nn.LayerNorm checkpoints.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pgica_tpu.ops.layernorm import FusedLayerNorm, _ln_ref, fused_layernorm


def _data(rows, h, dtype, seed=0):
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.normal(size=(rows, h)).astype(np.float32), dtype)
    g = jnp.asarray(1.0 + 0.1 * r.normal(size=(h,)).astype(np.float32))
    b = jnp.asarray(0.1 * r.normal(size=(h,)).astype(np.float32))
    return x, g, b


class TestFusedLayerNorm:
    @pytest.mark.parametrize("rows,h", [(64, 128), (100, 256), (9, 128)])
    def test_forward_matches_reference_f32(self, rows, h):
        x, g, b = _data(rows, h, jnp.float32)
        got = fused_layernorm(x, g, b, interpret=True, block_r=32)
        want = _ln_ref(x, g, b, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_forward_matches_flax_layernorm(self):
        x, g, b = _data(48, 128, jnp.float32)
        mod = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32)
        want = mod.apply({"params": {"scale": g, "bias": b}}, x)
        got = fused_layernorm(x, g, b, interpret=True, block_r=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)])
    def test_grads_match_reference(self, dtype, tol):
        x, g, b = _data(96, 128, dtype)

        def loss_fused(x, g, b):
            y = fused_layernorm(x, g, b, interpret=True, block_r=32)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        def loss_ref(x, g, b):
            y = _ln_ref(x, g, b, 1e-5)
            return jnp.sum(jnp.sin(y.astype(jnp.float32)))

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
        for a, e, name in zip(gf, gr, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(e, np.float32),
                atol=tol, rtol=tol, err_msg=name,
            )

    def test_padding_rows_do_not_pollute_param_grads(self):
        # 9 rows with block 8 -> 7 padded rows; dg/db must ignore them.
        x, g, b = _data(9, 128, jnp.float32)

        def loss(fn):
            return lambda x, g, b: jnp.sum(fn(x, g, b) ** 2)

        fused = loss(lambda x, g, b: fused_layernorm(x, g, b, interpret=True, block_r=8))
        ref = loss(lambda x, g, b: _ln_ref(x, g, b, 1e-5))
        gf = jax.grad(fused, argnums=(1, 2))(x, g, b)
        gr = jax.grad(ref, argnums=(1, 2))(x, g, b)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4)

    def test_3d_input_flattens_rows(self):
        r = np.random.default_rng(1)
        x = jnp.asarray(r.normal(size=(4, 16, 128)).astype(np.float32))
        g = jnp.ones((128,)); b = jnp.zeros((128,))
        got = fused_layernorm(x, g, b, interpret=True, block_r=16)
        want = _ln_ref(x, g, b, 1e-5)
        assert got.shape == x.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_module_param_names_match_nn_layernorm(self):
        x = jnp.ones((4, 128))
        params = FusedLayerNorm().init(jax.random.PRNGKey(0), x)["params"]
        assert set(params) == {"scale", "bias"}
        # a converted nn.LayerNorm checkpoint drops straight in
        y = FusedLayerNorm().apply(
            {"params": {"scale": jnp.full((128,), 2.0), "bias": jnp.ones((128,))}}, x
        )
        assert y.shape == x.shape

    def test_cpu_auto_dispatch_uses_reference(self):
        # On CPU (no force/interpret) the jnp path runs - results identical.
        x, g, b = _data(2048, 128, jnp.float32)
        got = fused_layernorm(x, g, b)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ln_ref(x, g, b, 1e-5)), atol=0
        )


class TestFusedRMSNorm:
    @pytest.mark.parametrize("rows,h", [(64, 128), (9, 256)])
    def test_forward_matches_flax_rmsnorm(self, rows, h):
        from pgica_tpu.ops.layernorm import fused_rmsnorm

        x, g, _ = _data(rows, h, jnp.float32)
        want = nn.RMSNorm(epsilon=1e-5, param_dtype=jnp.float32).apply(
            {"params": {"scale": g}}, x
        )
        got = fused_rmsnorm(x, g, interpret=True, block_r=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)])
    def test_grads_match_reference(self, dtype, tol):
        from pgica_tpu.ops.layernorm import _rms_ref, fused_rmsnorm

        x, g, _ = _data(96, 128, dtype, seed=3)

        def lf(x, g):
            return jnp.sum(jnp.sin(fused_rmsnorm(x, g, interpret=True, block_r=32).astype(jnp.float32)))

        def lr(x, g):
            return jnp.sum(jnp.sin(_rms_ref(x, g, 1e-5).astype(jnp.float32)))

        gf = jax.grad(lf, argnums=(0, 1))(x, g)
        gr = jax.grad(lr, argnums=(0, 1))(x, g)
        for a, e, name in zip(gf, gr, ("dx", "dscale")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(e, np.float32),
                atol=tol, rtol=tol, err_msg=name,
            )

    def test_module_scope_name_matches_nn(self):
        from pgica_tpu.ops.layernorm import RMSNorm

        assert RMSNorm.__name__ == "RMSNorm"  # flax auto-scope parity
        x = jnp.ones((4, 128))
        params = RMSNorm().init(jax.random.PRNGKey(0), x)["params"]
        assert set(params) == {"scale"}
