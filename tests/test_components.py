"""Component-library tests (reference C13 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgica_tpu.ops.components import (
    TEMP_MAX,
    TEMP_MIN,
    ContrastiveLossModule,
    TemperatureScaledSimilarity,
    nan_safe_gradients,
)


@pytest.fixture
def embeddings(rng):
    return (
        jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
    )


class TestTemperatureScaledSimilarity:
    def test_learnable_temperature_param(self, embeddings):
        mod = TemperatureScaledSimilarity(initial_temperature=0.5, learnable=True)
        params = mod.init(jax.random.PRNGKey(0), *embeddings)["params"]
        assert "log_temperature" in params
        assert mod.current_temperature(params) == pytest.approx(0.5, rel=1e-5)

    def test_clamping(self, embeddings):
        mod = TemperatureScaledSimilarity(initial_temperature=0.01, learnable=False)
        params = mod.init(jax.random.PRNGKey(0), *embeddings)
        sim_clamped = mod.apply(params, *embeddings)
        ref = TemperatureScaledSimilarity(initial_temperature=TEMP_MIN, learnable=False)
        sim_min = ref.apply(ref.init(jax.random.PRNGKey(0), *embeddings), *embeddings)
        np.testing.assert_allclose(np.asarray(sim_clamped), np.asarray(sim_min), rtol=1e-6)

    def test_temperature_gradient_flows(self, embeddings):
        mod = TemperatureScaledSimilarity(learnable=True)
        variables = mod.init(jax.random.PRNGKey(0), *embeddings)

        def loss(params):
            return jnp.sum(mod.apply({"params": params}, *embeddings) ** 2)

        g = jax.grad(loss)(variables["params"])
        assert float(jnp.abs(g["log_temperature"])) > 0


class TestContrastiveLossModule:
    def test_loss_and_metrics(self, embeddings):
        mod = ContrastiveLossModule()
        variables = mod.init(jax.random.PRNGKey(0), *embeddings)
        loss, metrics = mod.apply(variables, *embeddings)
        assert float(loss) > 0
        assert 0 <= float(metrics["accuracy"]) <= 1


class TestNanSafeGradients:
    def test_finite_detection(self):
        good = {"w": jnp.ones((3,))}
        _, norm, finite = nan_safe_gradients(good)
        assert bool(finite) and float(norm) > 0
        bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
        _, _, finite = nan_safe_gradients(bad)
        assert not bool(finite)

    def test_clipping(self):
        grads = {"w": jnp.full((4,), 10.0)}
        clipped, norm, _ = nan_safe_gradients(grads, max_norm=1.0)
        assert float(norm) == pytest.approx(20.0)
        assert float(jnp.linalg.norm(clipped["w"])) == pytest.approx(1.0, rel=1e-4)
