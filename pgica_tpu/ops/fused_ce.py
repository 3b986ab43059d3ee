"""Fused linear + cross-entropy Pallas kernel (logits never hit HBM).

Computes per-token target log-probabilities directly from decoder hidden
states and the (weight-tied) embedding matrix:

    tok_logp[r] = h[r] . W[y[r]] - logsumexp_v(h[r] . W[v])

blockwise over the vocabulary with an online logsumexp — the (rows, vocab)
logits matrix is never materialized. This is the fused kernel the DPO
sequence-logprob reduction (ops/losses.py:sequence_logprobs) and the caption
CE (caption_cross_entropy) sit on top of: for GPT-2-scale vocabularies the
float32 logits tensor (2B x 127 x 50k ~ 1.6 GB per DPO side at batch 32)
dominates stage-2 HBM traffic; here it stays in VMEM tiles.

Backward (custom VJP), also blockwise:
    dh[r]    = g[r] * (W[y[r]] - p[r] @ W)
    dW[v]    = sum_r g[r] * (onehot[r,v] - p[r,v]) * h[r]
with p = softmax recomputed from the saved per-row logsumexp.

The XLA fallback (`_xla_token_logprobs`) is the numerics reference; dispatch
is automatic (pallas on TPU for aligned shapes, XLA otherwise).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _xla_token_logprobs(hidden: jax.Array, embedding: jax.Array, targets: jax.Array) -> jax.Array:
    logits = (hidden.astype(jnp.float32) @ embedding.astype(jnp.float32).T)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


# ------------------------------------------------------------------ forward


def _fwd_kernel(h_ref, w_ref, y_ref, out_ref, lse_ref, *, block_v, vocab):
    h = h_ref[:].astype(jnp.float32)  # (block_r, d)
    block_r = h.shape[0]
    y = y_ref[0, 0]  # (block_r,) int32
    num_v = pl.cdiv(vocab, block_v)

    def body(i, carry):
        m_prev, l_prev, tgt = carry
        w = w_ref[pl.ds(i * block_v, block_v), :].astype(jnp.float32)  # (block_v, d)
        s = jax.lax.dot_general(
            h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_r, block_v)
        cols = i * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = cols < vocab
        s = jnp.where(valid, s, -1e30)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(jnp.exp(s - m_new[:, None]), axis=-1)
        tgt = tgt + jnp.sum(jnp.where(cols == y[:, None], s, 0.0), axis=-1)
        return m_new, l_new, tgt

    m0 = jnp.full((block_r,), -1e30, jnp.float32)
    l0 = jnp.zeros((block_r,), jnp.float32)
    t0 = jnp.zeros((block_r,), jnp.float32)
    m, l, tgt = jax.lax.fori_loop(0, num_v, body, (m0, l0, t0))
    lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
    out_ref[0, 0] = (tgt - lse).astype(jnp.float32)
    lse_ref[0, 0] = lse


# ------------------------------------------------------------------ backward


def _bwd_dh_kernel(h_ref, w_ref, y_ref, lse_ref, g_ref, dh_ref, *, block_v, vocab):
    h = h_ref[:].astype(jnp.float32)
    y = y_ref[0, 0]
    lse = lse_ref[0, 0]
    g = g_ref[0, 0]
    num_v = pl.cdiv(vocab, block_v)
    d = h.shape[-1]

    def body(i, dh):
        w = w_ref[pl.ds(i * block_v, block_v), :].astype(jnp.float32)
        s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        cols = i * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = cols < vocab
        p = jnp.where(valid, jnp.exp(s - lse[:, None]), 0.0)
        coeff = jnp.where(cols == y[:, None], 1.0, 0.0) - p  # (block_r, block_v)
        return dh + jax.lax.dot_general(
            coeff, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dh = jax.lax.fori_loop(0, num_v, body, jnp.zeros_like(h))
    dh_ref[:] = (dh * g[:, None]).astype(dh_ref.dtype)


def _bwd_dw_kernel(h_ref, w_ref, y_ref, lse_ref, g_ref, dw_ref, *, block_r, rows, vocab_block_start=None):
    """One program = one vocab block. Loops over row blocks accumulating dW."""
    w = w_ref[0].astype(jnp.float32)  # (block_v, d)
    block_v = w.shape[0]
    v_idx = pl.program_id(0)
    num_r = pl.cdiv(rows, block_r)

    def body(i, dw):
        h = h_ref[pl.ds(i * block_r, block_r), :].astype(jnp.float32)
        y = y_ref[0, pl.ds(i * block_r, block_r)]
        lse = lse_ref[0, pl.ds(i * block_r, block_r)]
        g = g_ref[0, pl.ds(i * block_r, block_r)]
        s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        cols = v_idx * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        p = jnp.exp(s - lse[:, None])
        coeff = (jnp.where(cols == y[:, None], 1.0, 0.0) - p) * g[:, None]  # (block_r, block_v)
        return dw + jax.lax.dot_general(
            coeff, h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dw = jax.lax.fori_loop(0, num_r, body, jnp.zeros_like(w))
    dw_ref[0] = dw.astype(dw_ref.dtype)


# ------------------------------------------------------------------ plumbing


def _pick_block(n: int, target: int) -> int:
    b = min(target, n)
    while n % b != 0:
        b -= 1
    return max(b, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(hidden, embedding, targets, block_r, block_v, interpret):
    out, _ = _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret)
    return out


def _pad_vocab(embedding, block_v):
    """Pad embedding rows to a block multiple; kernels mask cols >= true vocab."""
    vocab = embedding.shape[0]
    padded = ((vocab + block_v - 1) // block_v) * block_v
    if padded != vocab:
        embedding = jnp.pad(embedding, ((0, padded - vocab), (0, 0)))
    return embedding, padded


def _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret):
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    br = _pick_block(rows, block_r)
    bv = min(block_v, vocab)
    emb_padded, vocab_padded = _pad_vocab(embedding, bv)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_v=bv, vocab=vocab),
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((vocab_padded, d), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, rows), jnp.float32),
        ],
        interpret=interpret,
    )(hidden, emb_padded, targets.reshape(1, 1, rows))
    return out.reshape(rows), lse.reshape(rows)


def _fused_fwd(hidden, embedding, targets, block_r, block_v, interpret):
    out, lse = _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret)
    return out, (hidden, embedding, targets, lse)


def _fused_bwd(block_r, block_v, interpret, residuals, g):
    hidden, embedding, targets, lse = residuals
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    br = _pick_block(rows, block_r)
    bv = min(block_v, vocab)
    emb_padded, vocab_padded = _pad_vocab(embedding, bv)

    y3 = targets.reshape(1, 1, rows)
    lse3 = lse.reshape(1, 1, rows)
    g3 = g.astype(jnp.float32).reshape(1, 1, rows)

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, block_v=bv, vocab=vocab),
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((vocab_padded, d), lambda i: (0, 0)),
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
            pl.BlockSpec((1, 1, br), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, d), hidden.dtype),
        interpret=interpret,
    )(hidden, emb_padded, y3, lse3, g3)

    y2 = targets.reshape(1, rows)
    lse2 = lse.reshape(1, rows)
    g2 = g.astype(jnp.float32).reshape(1, rows)
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, block_r=br, rows=rows),
        grid=(vocab_padded // bv,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (0, 0)),
            pl.BlockSpec((1, bv, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows), lambda i: (0, 0)),
            pl.BlockSpec((1, rows), lambda i: (0, 0)),
            pl.BlockSpec((1, rows), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bv, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((vocab_padded // bv, bv, d), embedding.dtype),
        interpret=interpret,
    )(hidden, emb_padded.reshape(vocab_padded // bv, bv, d), y2, lse2, g2)

    return dh, dw.reshape(vocab_padded, d)[:vocab], None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_token_logprobs(
    hidden: jax.Array,
    embedding: jax.Array,
    targets: jax.Array,
    block_rows: int = 256,
    block_vocab: int = 512,
    impl: str = "auto",
) -> jax.Array:
    """Target-token logprobs for flattened rows: (N, D), (V, D), (N,) -> (N,).

    ``impl="auto"`` uses the Pallas kernel on TPU when shapes tile cleanly,
    else the XLA path. Differentiable w.r.t. hidden and embedding.
    """
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    if impl == "auto":
        tpu = jax.default_backend() not in ("cpu",)
        ok = tpu and rows % 8 == 0 and d % 128 == 0 and vocab >= 512
        impl = "pallas" if ok else "xla"
    if impl == "pallas":
        interpret = jax.default_backend() == "cpu"
        return _fused(hidden, embedding, targets, block_rows, block_vocab, interpret)
    return _xla_token_logprobs(hidden, embedding, targets)
