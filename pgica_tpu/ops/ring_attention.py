"""Ring attention: context-parallel attention over a mesh axis.

Long-context growth path for the scaled decoder configs (SURVEY §5
"long-context / sequence parallelism"; BACKLOG "ring attention over the
model axis"). The sequence dimension is sharded over a mesh axis; each shard
holds its local queries and rotates the (k, v) block around the ring with
``ppermute``, folding every remote block into a numerically-stable online
softmax. Peak memory per device is O(S_local²) for the score block — the
full (S, S) matrix never exists anywhere — and the KV transfer rides ICI
concurrently with compute.

Call INSIDE shard_map with q/k/v sharded over the sequence dimension:

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="model", causal=True),
        mesh=mesh,
        in_specs=(P(None, None, "model", None),) * 3,
        out_specs=P(None, None, "model", None),
        check_vma=False,
    )(q, k, v)

Causal masking across the ring: shard r attends its own block causally,
earlier shards' blocks fully, later shards' not at all. Fully differentiable
(pure lax ops — ppermute included — so autodiff just works; the blockwise
XLA attention here was also measured faster than the Pallas flash kernel at
the ≤1k-token block sizes these shards see, ops/attention.py crossover).

Numerics match single-device attention to float tolerance
(tests/test_parallel.py::TestRingAttention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def _block_scores(q: jax.Array, k: jax.Array, scale: float) -> jax.Array:
    return jax.lax.dot_general(
        q.astype(jnp.float32) * scale,
        k.astype(jnp.float32),
        (((3,), (3,)), ((0, 1), (0, 1))),
    )  # (B, H, Sq_loc, Sk_loc)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = False,
    kv_bias: jax.Array | None = None,
) -> jax.Array:
    """(B, H, S_local, D) q/k/v shards -> (B, H, S_local, D) output shard.

    ``kv_bias``: optional (B, S_local) additive bias for this shard's keys
    (e.g. NEG_INF on padding positions); it rotates around the ring with its
    KV block.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    scale = 1.0 / (d**0.5)
    perm = [(i, (i + 1) % n) for i in range(n)]  # pass KV to the next shard
    if kv_bias is None:
        kv_bias = jnp.zeros((b, s_loc), jnp.float32)

    def fold(carry, _step_kv):
        acc, m_prev, l_prev, kv_blk, src = carry
        k_blk, v_blk, bias_blk = kv_blk
        s = _block_scores(q, k_blk, scale)  # (B,H,Sq,Sk)
        s = s + bias_blk[:, None, None, :].astype(jnp.float32)
        if causal:
            # Block relation: src < my -> fully visible; src == my -> causal
            # diagonal; src > my -> masked entirely.
            rows = jnp.arange(s_loc)[:, None]
            cols = jnp.arange(s_loc)[None, :]
            diag = jnp.where(rows >= cols, 0.0, NEG_INF).astype(jnp.float32)
            full = jnp.zeros((s_loc, s_loc), jnp.float32)
            none = jnp.full((s_loc, s_loc), NEG_INF, jnp.float32)
            block_bias = jnp.where(src < my, full, jnp.where(src == my, diag, none))
            s = s + block_bias[None, None]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jax.lax.dot_general(
            p, v_blk.astype(jnp.float32), (((3,), (2,)), ((0, 1), (0, 1)))
        )
        # rotate KV (+ key bias) around the ring; track the shard of origin
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        bias_nxt = jax.lax.ppermute(bias_blk, axis_name, perm)
        src_nxt = jax.lax.ppermute(src, axis_name, perm)
        return (acc, m_new, l_new, (k_nxt, v_nxt, bias_nxt), src_nxt), None

    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    carry = (acc0, m0, l0, (k, v, kv_bias), my)
    (acc, m, l, _, _), _ = jax.lax.scan(fold, carry, None, length=n)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe[..., None]).astype(q.dtype)
