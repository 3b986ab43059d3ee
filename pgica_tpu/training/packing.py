"""Length-bucketed caption batches: stop paying for padding.

The reference pads every caption to ``max_caption_length`` = 128
(reference preprocessing.py:206-280) and its torch kernels run the full
padded width every step. Real captions are far shorter (the committed
Conceptual-Captions-style data averages ~15-25 tokens), so on TPU the
decoder/text-encoder matmuls — the dominant FLOPs of both stages
(results/PROFILE_stage2.md: the ``[128,128,...]`` 2x-row decoder pass IS the
stage-2 hot loop) — spend most of their time on trailing all-pad columns.

This module slices each host batch to the smallest bucket >= the batch's
longest real sequence before dispatch. Bucketing is EXACT, not approximate:

* attention is causal, so positions < L never read positions >= L;
* the sequence-logprob / CE losses mask pad positions out;
* position embeddings are position-local.

Therefore dropping trailing columns that are all-pad across the batch leaves
every loss and gradient bit-identical (modulo dropout RNG draws, whose shape
feeds the sampler) — proven in tests/test_packing.py. Each distinct bucket
costs one extra XLA compile (bounded by ``len(buckets)``); buckets are
multiples of 32 so every shape keeps the MXU/VPU lane tiling.

TPU-first note: this replaces dynamic-shape thinking (impossible under XLA's
static-shape compilation) with a tiny static-shape menu — the idiomatic JAX
answer to variable-length batches.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

# (ids_key, mask_key) pairs bucketed together; stage-2 pairs share ONE bucket
# because the decoder folds [chosen; rejected] into a single 2B-row pass
# (train_step.py:_policy_pair_logprobs).
_STAGE1_KEYS = (("caption_ids", "caption_mask"),)
_STAGE2_KEYS = (("preferred_ids", "preferred_mask"), ("rejected_ids", "rejected_mask"))


def default_buckets(max_caption_length: int, step: int = 32) -> Tuple[int, ...]:
    """Multiples of ``step`` up to (and always including) max_caption_length."""
    buckets = list(range(step, max_caption_length + 1, step))
    if not buckets or buckets[-1] != max_caption_length:
        buckets.append(max_caption_length)
    return tuple(buckets)


def pick_bucket(max_len: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= max_len (falls back to the largest bucket)."""
    for b in buckets:
        if b >= max_len:
            return int(b)
    return int(buckets[-1])


def bucket_batch(
    batch: Dict[str, np.ndarray],
    buckets: Sequence[int],
    multiple_of: int = 1,
) -> Dict[str, np.ndarray]:
    """Slice a host batch's token columns to its length bucket.

    Works for stage-1 (``caption_ids/mask``) and stage-2
    (``preferred_*``/``rejected_*``) batches; keys absent from ``batch`` are
    ignored. ``multiple_of`` rounds the bucket up so sharded-seq (context
    parallel) layouts keep divisibility. Returns a shallow-copied dict; the
    image tensor and any extra keys pass through untouched.
    """
    keysets = [
        pairs
        for pairs in (_STAGE1_KEYS, _STAGE2_KEYS)
        if all(ids in batch and mask in batch for ids, mask in pairs)
    ]
    if not keysets:
        return batch
    out = dict(batch)
    for pairs in keysets:
        full = max(batch[mask].shape[1] for _, mask in pairs)
        # Bound = one past the LAST set mask column (not the per-row count):
        # a mask with interior holes — e.g. a collator masking special tokens
        # mid-sequence — has count < last-set-position, and a count-based
        # bucket would silently slice off real trailing tokens. Scanning for
        # the last nonzero column keeps the EXACTNESS contract for any mask.
        max_len = 0
        for _, mask in pairs:
            set_cols = np.flatnonzero(np.asarray(batch[mask]).any(axis=0))
            if set_cols.size:
                max_len = max(max_len, int(set_cols[-1]) + 1)
        bucket = pick_bucket(max(max_len, 1), buckets)
        if multiple_of > 1:
            bucket = min(full, -(-bucket // multiple_of) * multiple_of)
        if bucket >= full:
            continue
        for ids, mask in pairs:
            out[ids] = np.ascontiguousarray(batch[ids][:, :bucket])
            out[mask] = np.ascontiguousarray(batch[mask][:, :bucket])
    return out
