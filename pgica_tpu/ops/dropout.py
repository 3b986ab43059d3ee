"""Low-bit dropout: 8 random bits per element instead of 32.

``flax.linen.Dropout`` materializes a uniform f32 per element via
``jax.random.bernoulli``, so the RNG generates 32 bits/element — on the
stage-2 profile (results/PROFILE_stage2.md) that is ~3.7% of device time
(`rng-bit-generator u32[128,128,1024]`, 96 calls/step across the dropout
sites of two GPT-2-medium towers). A keep/drop decision needs 8 bits.

NOTE ``jax.random.bits(shape, uint8)`` does NOT help: it still runs the
threefry counter over a full-element-count u32 tensor and truncates each
word to 8 bits (verified in lowered StableHLO). The packed path here draws
u32 for ceil(n/4) elements and bitcast-expands each word to 4 bytes, so the
generator runs over a quarter of the counters and the random tensor's HBM
traffic drops 4x.

Quantization: the keep probability is rounded to t/256 (t = round(keep*256))
and the inverse scale uses the SAME t, so E[fast_dropout(x)] == x exactly —
no scaling bias. Only the realized drop rate is quantized (e.g. rate=0.1
becomes 1 - 230/256 = 0.1016), immaterial for a regularizer; rate=0 and
deterministic short-circuit to identity.

Reference parity note: the reference's torch Dropout(p) sites
(model.py:352-394 towers) are stochastic regularizers — mask *stream*
equality is neither required nor meaningful across frameworks.

``set_impl``/``PGICA_DROPOUT_IMPL`` select the implementation at TRACE time
("packed" default, "u8" unpacked comparison, "flax" = nn.Dropout semantics)
so perf probes can A/B the variants inside one process.
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_IMPL = os.environ.get("PGICA_DROPOUT_IMPL", "packed")


def set_impl(impl: str) -> None:
    """Select the dropout lowering ("packed" | "u8" | "flax") for subsequent
    TRACES. Existing compiled functions keep whatever they traced with."""
    global _IMPL
    assert impl in ("packed", "u8", "flax"), impl
    _IMPL = impl


def _u8_bits(rng: jax.Array, shape) -> jax.Array:
    """Uniform u8 tensor of ``shape`` from 4x fewer threefry counters."""
    n = 1
    for d in shape:
        n *= int(d)
    n32 = -(-n // 4)
    raw = jax.random.bits(rng, (n32,), dtype=jnp.uint32)
    bytes_flat = jax.lax.bitcast_convert_type(raw, jnp.uint8).reshape(-1)
    return bytes_flat[:n].reshape(shape)


def fast_dropout(rng: jax.Array, x: jax.Array, rate: float) -> jax.Array:
    """Apply inverted dropout using u8 random bits (see module docstring)."""
    if rate <= 0.0:
        return x
    if rate >= 1.0:
        return jnp.zeros_like(x)
    if _IMPL == "flax":
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
    t = int(round((1.0 - rate) * 256))
    t = min(max(t, 1), 255)  # keep both outcomes reachable for any 0<rate<1
    if _IMPL == "u8":
        bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    else:
        bits = _u8_bits(rng, x.shape)
    keep = bits < jnp.uint8(t)
    scale = jnp.asarray(256.0 / t, x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros_like(x))


class FastDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` (same rng collection name).

    ``deterministic`` handling mirrors flax: the call-site argument wins,
    falling back to the module attribute.
    """

    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: Optional[bool] = None) -> jax.Array:
        det = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        ) if (self.deterministic is not None or deterministic is not None) else True
        if det or self.rate <= 0.0:
            return x
        return fast_dropout(self.make_rng("dropout"), x, self.rate)
