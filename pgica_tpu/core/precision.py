"""Precision policy: params fp32, compute bf16, losses/reductions fp32.

The framework-wide convention (TPU MXU is bf16-native):

* parameters and optimizer state: float32 (``param_dtype`` on every module)
* activations / matmuls: the module ``dtype`` (bf16 when
  ``hardware.mixed_precision: bf16``)
* losses, logsumexp, attention softmax statistics: float32 (hard-coded in
  ops/losses.py and the flash-attention kernel)

This module centralizes the mapping from config strings to dtypes and offers
casting helpers for custom call sites.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

POLICIES = {
    "no": jnp.float32,
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    # fp16 is not TPU-native; map to bf16 (documented deviation from GPU AMP)
    "fp16": jnp.bfloat16,
    "float16": jnp.bfloat16,
}


def compute_dtype(mixed_precision: str) -> Any:
    try:
        return POLICIES[str(mixed_precision).lower()]
    except KeyError:
        raise ValueError(
            f"Unknown mixed_precision {mixed_precision!r}; expected one of {sorted(POLICIES)}"
        )


def cast_floating(tree: Any, dtype: Any) -> Any:
    """Cast floating leaves of a pytree; ints/bools untouched."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def configure_rng(kind: str = "threefry") -> None:
    """Select JAX's PRNG implementation (``hardware.rng`` config key).

    ``rbg`` uses the TPU's hardware random-bit generator for dropout /
    augmentation keys — measured +13% stage-1 step throughput over the
    default threefry (software PRNG burns VPU cycles every step). Streams
    stay deterministic per key but are NOT bit-stable across backends or
    XLA versions; keep ``threefry`` where cross-platform reproducibility of
    the exact random bits matters (the CPU test suite does).
    """
    kind = str(kind).lower()
    if kind in ("threefry", "default", ""):
        return
    if kind not in ("rbg", "unsafe_rbg"):
        raise ValueError(f"Unknown hardware.rng {kind!r}; expected threefry|rbg")
    jax.config.update("jax_default_prng_impl", kind)
