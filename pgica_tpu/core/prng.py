"""PRNG plumbing: one root key, deterministic per-purpose/per-step streams.

Convention across the framework: every stochastic site derives its key as
``fold_in(fold_in(root, purpose), step)`` so runs are reproducible per seed,
independent of execution order, and identical across restarts from a
checkpointed step counter (the reference relies on global torch/np seeding,
scripts/train.py:53-66, which replays differently after resume).
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax

# Stable purpose ids (never renumber — checkpoint reproducibility).
PURPOSES: Dict[str, int] = {
    "params": 0,
    "dropout": 1,
    "augment": 2,
    "sampling": 3,
    "data": 4,
    "train_stage1": 5,
    "train_stage2": 6,
    "train_stage0": 7,
}


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def purpose_key(root: jax.Array, purpose: str) -> jax.Array:
    return jax.random.fold_in(root, PURPOSES[purpose])


def step_key(root: jax.Array, purpose: str, step) -> jax.Array:
    """Key for a given purpose at a given step (step may be traced)."""
    return jax.random.fold_in(purpose_key(root, purpose), step)


def key_stream(root: jax.Array, purpose: str) -> Iterator[jax.Array]:
    """Host-side infinite stream of keys for a purpose (eval loops etc.)."""
    base = purpose_key(root, purpose)
    i = 0
    while True:
        yield jax.random.fold_in(base, i)
        i += 1
