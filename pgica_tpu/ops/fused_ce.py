"""Fused linear + cross-entropy Pallas kernel (logits never hit HBM).

Computes per-token target log-probabilities directly from decoder hidden
states and the (weight-tied) embedding matrix:

    tok_logp[r] = h[r] . W[y[r]] - logsumexp_v(h[r] . W[v])

The vocabulary is tiled through the Pallas *grid* — each program sees one
(row_block, vocab_block) tile, with the online-logsumexp running statistics
held in VMEM scratch across the (sequential, innermost) vocab grid dimension.
Neither the (rows, vocab) logits matrix nor the full (vocab, d) embedding is
ever resident: VMEM holds one row block of hidden states, one vocab block of
embedding rows, and the (block_r, block_v) score tile. At GPT-2 scale
(50,257 x 1024 f32 ~ 200 MB) staging the whole embedding per program would
exceed TPU VMEM by an order of magnitude — this is why the grid, not the
kernel body, owns the vocab loop.

This is the kernel the DPO sequence-logprob reduction
(ops/losses.py:sequence_logprobs_from_hidden) and the fused NT-Xent
(ntxent_loss_fused) sit on top of: for GPT-2-scale vocabularies the float32
logits tensor (2B x 127 x 50k ~ 1.6 GB per DPO side at batch 32) dominates
stage-2 HBM traffic; here it stays in VMEM tiles.

Backward (custom VJP), blockwise with the same tiling:
    dh[r]    = g[r] * (W[y[r]] - p[r] @ W)       grid (rows, vocab-inner)
    dW[v]    = sum_r g[r] * (onehot[r,v] - p[r,v]) * h[r]   grid (vocab, rows-inner)
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

from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _xla_token_logprobs(hidden: jax.Array, embedding: jax.Array, targets: jax.Array) -> jax.Array:
    logits = (hidden.astype(jnp.float32) @ embedding.astype(jnp.float32).T)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ------------------------------------------------------------------ forward


def _fwd_kernel(h_ref, w_ref, y_ref, out_ref, lse_ref, m_scr, l_scr, t_scr, *, block_v, vocab, num_v):
    """Grid = (row_blocks, vocab_blocks); vocab is the (sequential) inner dim.

    Scratch carries the online-logsumexp statistics (m, l) and the target
    score accumulator across vocab blocks; outputs are written on the last
    vocab iteration only (their block index is constant over the inner dim,
    so the block stays resident in VMEM).
    """
    v_idx = pl.program_id(1)

    @pl.when(v_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        t_scr[...] = jnp.zeros_like(t_scr)

    h = h_ref[...].astype(jnp.float32)  # (block_r, d)
    w = w_ref[...].astype(jnp.float32)  # (block_v, d)
    y = y_ref[0, 0]  # (block_r,) int32
    s = jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_r, block_v)
    cols = v_idx * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(cols < vocab, s, NEG_INF)

    m_prev, l_prev = m_scr[0], l_scr[0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(jnp.exp(s - m_new[:, None]), axis=-1)
    m_scr[0] = m_new
    l_scr[0] = l_new
    # `cols < vocab` matters in the vocab-parallel path: there `y` holds
    # shard-LOCAL ids and a neighbor shard's target (y in [vocab, vocab_p))
    # would otherwise match a padded column and add its NEG_INF score.
    t_scr[0] = t_scr[0] + jnp.sum(
        jnp.where((cols == y[:, None]) & (cols < vocab), s, 0.0), axis=-1
    )

    @pl.when(v_idx == num_v - 1)
    def _finish():
        l = l_scr[0]
        lse = m_scr[0] + jnp.log(jnp.where(l == 0.0, 1.0, l))
        out_ref[0, 0] = t_scr[0] - lse
        lse_ref[0, 0] = lse


# ------------------------------------------------------------------ backward


def _bwd_dh_kernel(h_ref, w_ref, y_ref, lse_ref, g_ref, dh_ref, acc_scr, *, block_v, vocab, num_v):
    """dh = g * (onehot - p) @ W, accumulated across vocab blocks in scratch."""
    v_idx = pl.program_id(1)

    @pl.when(v_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = h_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    y = y_ref[0, 0]
    lse = lse_ref[0, 0]
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    cols = v_idx * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(cols < vocab, jnp.exp(s - lse[:, None]), 0.0)
    coeff = jnp.where(cols == y[:, None], 1.0, 0.0) - p  # (block_r, block_v)
    acc_scr[...] += jax.lax.dot_general(
        coeff, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(v_idx == num_v - 1)
    def _finish():
        g = g_ref[0, 0]
        dh_ref[...] = (acc_scr[...] * g[:, None]).astype(dh_ref.dtype)


def _bwd_dw_kernel(h_ref, w_ref, y_ref, lse_ref, g_ref, dw_ref, acc_scr, *, block_v, vocab, num_r):
    """Grid = (vocab_blocks, row_blocks); rows inner. dW accumulated in scratch."""
    v_idx = pl.program_id(0)
    r_idx = pl.program_id(1)

    @pl.when(r_idx == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    h = h_ref[...].astype(jnp.float32)  # (block_r, d)
    w = w_ref[...].astype(jnp.float32)  # (block_v, d)
    y = y_ref[0, 0]
    lse = lse_ref[0, 0]
    g = g_ref[0, 0]
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    cols = v_idx * block_v + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(cols < vocab, jnp.exp(s - lse[:, None]), 0.0)
    coeff = (jnp.where(cols == y[:, None], 1.0, 0.0) - p) * g[:, None]  # (block_r, block_v)
    acc_scr[...] += jax.lax.dot_general(
        coeff, h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(r_idx == num_r - 1)
    def _finish():
        dw_ref[...] = acc_scr[...].astype(dw_ref.dtype)


# ------------------------------------------------------------------ plumbing


def _block_sizes(rows: int, vocab: int, block_r: int, block_v: int):
    br = min(block_r, _round_up(rows, 8))
    bv = min(block_v, _round_up(vocab, 128))
    return br, bv, _round_up(rows, br), _round_up(vocab, bv)


def _pad_rows(x: jax.Array, rows_p: int) -> jax.Array:
    pad = rows_p - x.shape[0]
    if pad == 0:
        return x
    widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(hidden, embedding, targets, block_r, block_v, interpret):
    out, _ = _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret)
    return out


def _scratch(shape):
    return pltpu.VMEM(shape, jnp.float32)


def _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret):
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    br, bv, rows_p, vocab_p = _block_sizes(rows, vocab, block_r, block_v)
    num_v = vocab_p // bv

    h = _pad_rows(hidden, rows_p)
    y = _pad_rows(targets, rows_p)
    w = jnp.pad(embedding, ((0, vocab_p - vocab), (0, 0))) if vocab_p != vocab else embedding

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_v=bv, vocab=vocab, num_v=num_v),
        grid=(rows_p // br, num_v),
        in_specs=[
            pl.BlockSpec((br, d), lambda r, v: (r, 0)),
            pl.BlockSpec((bv, d), lambda r, v: (v, 0)),
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1, rows_p), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, rows_p), jnp.float32),
        ],
        scratch_shapes=[_scratch((1, br)), _scratch((1, br)), _scratch((1, br))],
        interpret=interpret,
    )(h, w, y.reshape(1, 1, rows_p))
    return out.reshape(rows_p)[:rows], lse.reshape(rows_p)


def _fused_fwd(hidden, embedding, targets, block_r, block_v, interpret):
    out, lse_padded = _fused_fwd_impl(hidden, embedding, targets, block_r, block_v, interpret)
    return out, (hidden, embedding, targets, lse_padded)


def _fused_bwd(block_r, block_v, interpret, residuals, g):
    hidden, embedding, targets, lse_padded = residuals
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    br, bv, rows_p, vocab_p = _block_sizes(rows, vocab, block_r, block_v)
    num_v = vocab_p // bv
    num_r = rows_p // br

    h = _pad_rows(hidden, rows_p)
    w = jnp.pad(embedding, ((0, vocab_p - vocab), (0, 0))) if vocab_p != vocab else embedding
    y3 = _pad_rows(targets, rows_p).reshape(1, 1, rows_p)
    lse3 = lse_padded.reshape(1, 1, rows_p)
    g3 = _pad_rows(g.astype(jnp.float32), rows_p).reshape(1, 1, rows_p)

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, block_v=bv, vocab=vocab, num_v=num_v),
        grid=(num_r, num_v),
        in_specs=[
            pl.BlockSpec((br, d), lambda r, v: (r, 0)),
            pl.BlockSpec((bv, d), lambda r, v: (v, 0)),
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
            pl.BlockSpec((1, 1, br), lambda r, v: (0, 0, r)),
        ],
        out_specs=pl.BlockSpec((br, d), lambda r, v: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, d), hidden.dtype),
        scratch_shapes=[_scratch((br, d))],
        interpret=interpret,
    )(h, w, y3, lse3, g3)

    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, block_v=bv, vocab=vocab, num_r=num_r),
        grid=(num_v, num_r),
        in_specs=[
            pl.BlockSpec((br, d), lambda v, r: (r, 0)),
            pl.BlockSpec((bv, d), lambda v, r: (v, 0)),
            pl.BlockSpec((1, 1, br), lambda v, r: (0, 0, r)),
            pl.BlockSpec((1, 1, br), lambda v, r: (0, 0, r)),
            pl.BlockSpec((1, 1, br), lambda v, r: (0, 0, r)),
        ],
        out_specs=pl.BlockSpec((bv, d), lambda v, r: (v, 0)),
        out_shape=jax.ShapeDtypeStruct((vocab_p, d), embedding.dtype),
        scratch_shapes=[_scratch((bv, d))],
        interpret=interpret,
    )(h, w, y3, lse3, g3)

    return dh[:rows], dw[:vocab], None


_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------- vocab-parallel (TP) path


def _local_stats(hidden, emb_loc, y_loc, block_r, block_v, interpret, use_pallas):
    """Per-shard (target-score contribution, local logsumexp) over the local
    vocab slice. Out-of-shard targets (y_loc outside [0, vloc)) contribute 0."""
    if use_pallas:
        out_loc, lse_pad = _fused_fwd_impl(hidden, emb_loc, y_loc, block_r, block_v, interpret)
        lse_loc = lse_pad[: hidden.shape[0]]
        return out_loc + lse_loc, lse_loc
    logits = hidden.astype(jnp.float32) @ emb_loc.astype(jnp.float32).T
    lse_loc = jax.nn.logsumexp(logits, axis=-1)
    cols = jnp.arange(emb_loc.shape[0])[None, :]
    tgt_loc = jnp.sum(jnp.where(cols == y_loc[:, None], logits, 0.0), axis=-1)
    return tgt_loc, lse_loc


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _fused_tp(hidden, emb_loc, y_loc, axis_name, block_r, block_v, interpret, use_pallas, true_vocab):
    out, _ = _fused_tp_fwd(
        hidden, emb_loc, y_loc, axis_name, block_r, block_v, interpret, use_pallas, true_vocab
    )
    return out


def _fused_tp_fwd(hidden, emb_loc, y_loc, axis_name, block_r, block_v, interpret, use_pallas, true_vocab):
    tgt_loc, lse_loc = _local_stats(hidden, emb_loc, y_loc, block_r, block_v, interpret, use_pallas)
    vloc = emb_loc.shape[0]
    if true_vocab is not None and true_vocab < vloc * jax.lax.axis_size(axis_name):
        # The global embedding was padded with ZERO rows to make the vocab
        # divisible by the axis; each padded row contributed exp(h.0)=1 to this
        # shard's sumexp. Remove those contributions analytically (padded rows
        # can never be targets, and their zero vectors contribute nothing to
        # dh; dW rows are sliced off by the outer pad's transpose).
        offset = jax.lax.axis_index(axis_name) * vloc
        n_pad = jnp.clip(offset + vloc - true_vocab, 0, vloc).astype(jnp.float32)
        frac = jnp.clip(n_pad * jnp.exp(-lse_loc), 0.0, 1.0 - 1e-7)
        corrected = lse_loc + jnp.log1p(-frac)
        lse_loc = jnp.where(n_pad >= vloc, NEG_INF, jnp.where(n_pad > 0, corrected, lse_loc))
    # Numerically-stable cross-shard logsumexp + target-score reduction
    # (Megatron vocab-parallel CE dataflow): one pmax + two psums over ICI.
    m = jax.lax.pmax(lse_loc, axis_name)
    lse_g = m + jnp.log(jax.lax.psum(jnp.exp(lse_loc - m), axis_name))
    tgt = jax.lax.psum(tgt_loc, axis_name)
    return tgt - lse_g, (hidden, emb_loc, y_loc, lse_g)


def _fused_tp_bwd(axis_name, block_r, block_v, interpret, use_pallas, true_vocab, residuals, g):
    """Local backward using the GLOBAL logsumexp.

    shard_map transpose semantics (verified by tests/test_parallel.py grad
    parity on 8 devices): the cotangent of an output replicated over
    ``axis_name`` arrives DIVIDED by the axis size on each shard, and input
    cotangents are psummed over every mesh axis absent from their in_spec.
    So: recover the true cotangent with one psum over ``axis_name``, then
    return raw per-shard partials — the boundary psums reassemble full dh
    (over the vocab axis) and full dW (over the batch axes).
    """
    hidden, emb_loc, y_loc, lse_g = residuals
    g = jax.lax.psum(g, axis_name)
    if use_pallas:
        rows = hidden.shape[0]
        br, _, rows_p, _ = _block_sizes(rows, emb_loc.shape[0], block_r, block_v)
        lse_padded = _pad_rows(lse_g, rows_p)
        dh_loc, dw_loc, _ = _fused_bwd(
            block_r, block_v, interpret, (hidden, emb_loc, y_loc, lse_padded), g
        )
    else:
        h32 = hidden.astype(jnp.float32)
        logits = h32 @ emb_loc.astype(jnp.float32).T
        p = jnp.exp(logits - lse_g[:, None])
        cols = jnp.arange(emb_loc.shape[0])[None, :]
        coeff = (jnp.where(cols == y_loc[:, None], 1.0, 0.0) - p) * g.astype(jnp.float32)[:, None]
        dh_loc = (coeff @ emb_loc.astype(jnp.float32)).astype(hidden.dtype)
        dw_loc = (coeff.T @ h32).astype(emb_loc.dtype)
    return dh_loc, dw_loc, None


_fused_tp.defvjp(_fused_tp_fwd, _fused_tp_bwd)


def fused_token_logprobs_tp(
    hidden: jax.Array,
    embedding_local: jax.Array,
    targets: jax.Array,
    axis_name: str,
    block_rows: int = 256,
    block_vocab: int = 512,
    impl: str = "auto",
    true_vocab: Optional[int] = None,
) -> jax.Array:
    """Vocab-parallel fused linear-CE — call INSIDE shard_map with the
    embedding sharded over ``axis_name`` (rows [shard*Vloc, (shard+1)*Vloc)).

    ``targets`` hold GLOBAL token ids; each shard contributes its local slice
    of the target score and logsumexp, combined with one pmax + two psums —
    the sharded wte is never gathered (BACKLOG "fused linear-CE under TP").
    Matches :func:`fused_token_logprobs` on the unsharded arrays numerically.

    When the global vocab is not divisible by the axis, pad the embedding
    with zero rows before shard_map and pass the unpadded size as
    ``true_vocab`` — the padded rows' softmax contributions are removed
    analytically inside the forward.
    """
    vloc = embedding_local.shape[0]
    offset = jax.lax.axis_index(axis_name) * vloc
    y_loc = (targets - offset).astype(jnp.int32)
    d = hidden.shape[1]
    if impl == "auto":
        tpu = jax.default_backend() not in ("cpu",)
        use_pallas = tpu and d % 128 == 0 and vloc >= 512
    else:
        use_pallas = impl == "pallas"
    interpret = jax.default_backend() == "cpu"
    return _fused_tp(
        hidden, embedding_local, y_loc, axis_name, block_rows, block_vocab,
        interpret, use_pallas, true_vocab,
    )


def fused_token_logprobs(
    hidden: jax.Array,
    embedding: jax.Array,
    targets: jax.Array,
    block_rows: int = 256,
    block_vocab: int = 512,
    impl: str = "auto",
) -> jax.Array:
    """Target-token logprobs for flattened rows: (N, D), (V, D), (N,) -> (N,).

    ``impl="auto"`` uses the Pallas kernel on TPU when the feature dim tiles
    onto the MXU lanes (d % 128 == 0) and the vocab is large enough to matter,
    else the XLA path. Rows and vocab need no alignment — both are padded to
    block multiples internally (padded columns are masked, padded rows carry
    zero cotangent). Differentiable w.r.t. hidden and embedding.
    """
    rows, d = hidden.shape
    vocab = embedding.shape[0]
    if impl == "auto":
        tpu = jax.default_backend() not in ("cpu",)
        ok = tpu and d % 128 == 0 and vocab >= 512
        impl = "pallas" if ok else "xla"
    if impl == "pallas":
        interpret = jax.default_backend() == "cpu"
        return _fused(hidden, embedding, targets, block_rows, block_vocab, interpret)
    return _xla_token_logprobs(hidden, embedding, targets)
