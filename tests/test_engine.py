"""Continuous-batching decode engine (pgica_tpu/generation/engine.py).

Greedy decode through the slot-pool engine must be token-identical to the
batch decode path: rows are independent in both (per-row KV cache, per-row
repetition-penalty presence), so per-request captions must match regardless
of admission order, slot reuse, or chunk boundaries. Also covers the per-row
cache-write path added to models/layers.py for per-slot positions.
"""

import threading
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine_images():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (6, 32, 32, 3), np.uint8)


def _run_engine(model, images, *, slots, chunk, stagger_s=0.0, max_length=8):
    from pgica_tpu.generation.engine import ContinuousDecodeEngine

    eng = ContinuousDecodeEngine(model, slots=slots, chunk=chunk, max_length=max_length)
    eng.warmup()
    eng.start()
    out = [None] * len(images)
    errs = []

    def go(i):
        try:
            if stagger_s:
                time.sleep(i * stagger_s)
            out[i] = eng.submit(images[i], timeout=180)["caption"]
        except Exception as e:  # pragma: no cover - surfaced via assert below
            errs.append((i, repr(e)))

    threads = [threading.Thread(target=go, args=(i,)) for i in range(len(images))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    eng.stop()
    assert not errs, errs
    return out


def test_engine_matches_batch_decode(tiny_model, engine_images):
    """Concurrent burst through fewer slots than requests == batch decode."""
    ref = tiny_model.generate_captions(engine_images, max_length=8)
    got = _run_engine(tiny_model, engine_images, slots=4, chunk=2)
    assert got == ref


def test_engine_staggered_admission(tiny_model, engine_images):
    """Requests joining mid-flight (continuous batching) keep exact parity."""
    ref = tiny_model.generate_captions(engine_images, max_length=8)
    got = _run_engine(tiny_model, engine_images, slots=2, chunk=1, stagger_s=0.05)
    assert got == ref


def test_engine_single_slot_reuse(tiny_model, engine_images):
    """Slot reuse: every request decodes through the same slot sequentially."""
    ref = tiny_model.generate_captions(engine_images[:3], max_length=8)
    got = _run_engine(tiny_model, engine_images[:3], slots=1, chunk=4)
    assert got == ref


def test_engine_non_power_of_two_slots(tiny_model, engine_images):
    """A non-pow2 pool still admits a full burst in one FIFO bucket."""
    from pgica_tpu.generation.engine import ContinuousDecodeEngine

    eng = ContinuousDecodeEngine(tiny_model, slots=6, chunk=2, max_length=8)
    assert eng.buckets[-1] == 6  # slots itself is always the top bucket
    eng.stop()
    ref = tiny_model.generate_captions(engine_images, max_length=8)
    got = _run_engine(tiny_model, engine_images, slots=6, chunk=2)
    assert got == ref


def test_engine_submit_validates_image(tiny_model):
    """Malformed direct-API input fails in the caller, not the daemon."""
    from pgica_tpu.generation.engine import ContinuousDecodeEngine

    eng = ContinuousDecodeEngine(tiny_model, slots=2, chunk=1, max_length=8)
    try:
        with pytest.raises(ValueError, match="image must be"):
            eng.submit(np.zeros((8, 8), np.uint8))  # 2D: wrong ndim
        with pytest.raises(ValueError, match="image must be"):
            eng.submit(np.zeros((16, 16, 3), np.uint8))  # wrong size
    finally:
        eng.stop()


def test_engine_survives_dispatch_error(tiny_model, engine_images):
    """A dispatch-loop error fails the victim request and the engine keeps
    serving (the old behavior silently killed the daemon and hung forever)."""
    from pgica_tpu.generation.engine import ContinuousDecodeEngine

    eng = ContinuousDecodeEngine(tiny_model, slots=2, chunk=2, max_length=8)
    eng.warmup()
    real_admit, boom = eng._admit, {"n": 1}

    def flaky_admit(*a, **k):
        if boom["n"]:
            boom["n"] -= 1
            raise RuntimeError("injected device error")
        return real_admit(*a, **k)

    eng._admit = flaky_admit
    eng.start()
    try:
        with pytest.raises(RuntimeError, match="failed in the engine"):
            eng.submit(engine_images[0], timeout=60)
        # engine recovered: fresh state, slots free, next request succeeds
        ref = tiny_model.generate_captions(engine_images[1:2], max_length=8)
        assert eng.submit(engine_images[1], timeout=120)["caption"] == ref[0]
    finally:
        eng.stop()


def test_engine_timeout_cancels_unadmitted(tiny_model):
    """A timed-out submit marks its request; admission skips it."""
    from pgica_tpu.generation.engine import ContinuousDecodeEngine

    eng = ContinuousDecodeEngine(tiny_model, slots=2, chunk=1, max_length=8)
    try:
        img = np.zeros((tiny_model.image_size,) * 2 + (3,), np.uint8)
        # engine not started: the request sits in the queue and times out
        with pytest.raises(TimeoutError):
            eng.submit(img, timeout=0.05)
        assert eng._take_arrivals() == []  # cancelled request is skipped
    finally:
        eng.stop()


def test_per_row_cache_write_matches_scalar():
    """layers.MultiHeadAttention: (B,) positions == scalar position per row."""
    import jax
    import jax.numpy as jnp

    from pgica_tpu.models.layers import MultiHeadAttention

    attn = MultiHeadAttention(hidden_size=16, num_heads=2, causal=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 1, 16))
    k = jnp.zeros((3, 2, 5, 8))
    cache = (k, k)
    params = attn.init(rng, x, cache=cache, position=0)
    mask = (jnp.arange(5)[None, :] <= 2).astype(jnp.int32).repeat(3, 0)[:, None, None, :]

    out_scalar, cache_scalar = attn.apply(params, x, mask=mask, cache=cache, position=2)
    out_rows, cache_rows = attn.apply(
        params, x, mask=mask, cache=cache, position=jnp.array([2, 2, 2])
    )
    np.testing.assert_allclose(np.asarray(out_scalar), np.asarray(out_rows), atol=1e-6)
    for a, b in zip(cache_scalar, cache_rows):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # distinct per-row positions write each row at its own timestep
    _, cache_mixed = attn.apply(params, x, mask=mask, cache=cache, position=jnp.array([1, 2, 3]))
    k_mixed = np.asarray(cache_mixed[0])
    for row, pos in enumerate([1, 2, 3]):
        assert np.abs(k_mixed[row, :, pos]).sum() > 0
        untouched = [p for p in range(5) if p != pos]
        assert np.abs(k_mixed[row][:, untouched]).sum() == 0
