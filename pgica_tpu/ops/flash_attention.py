"""Pallas TPU flash attention (FlashAttention-2 style, O(seq) memory).

Forward: blockwise online-softmax attention entirely in VMEM; the (Sq, Sk)
score matrix is never materialized in HBM. Saves the per-row logsumexp for
the backward pass.

Backward: two blockwise kernels (dkv pass and dq pass) using the saved
logsumexp and the delta trick (delta = rowsum(dO * O)), recomputing score
blocks on the fly — the standard FlashAttention-2 backward dataflow.

Masking: causal masks are applied per block with diagonal block skipping;
key-padding masks are folded in as a per-key additive bias (B, Sk) shared
across heads. General (B, H, Sq, Sk) masks fall back to the XLA path.

Layout: (batch, heads, seq, head_dim); the grid maps (batch*heads) to the
outermost dimension so each program owns one attention head's q (or kv)
block. Used via :func:`pgica_tpu.ops.attention.dot_product_attention`; the
XLA path is the numerics reference (tests compare the two in interpret mode
on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1.0e9


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, block_kv, seq_kv, causal, sm_scale
):
    """One program = one (batch*head, q_block). Loops over kv blocks."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q = q.shape[0]
    q_idx = pl.program_id(1)
    num_kv = pl.cdiv(seq_kv, block_kv)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_kv)
        s = s + bias_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)

    if causal:
        upper = jnp.minimum(num_kv, (q_idx + 1) * block_q // block_kv + 1)
    else:
        upper = num_kv
    acc, m, l = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe)).astype(jnp.float32)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, seq_q, causal, sm_scale,
):
    """One program = one (batch*head, kv_block). Loops over q blocks."""
    k = k_ref[0].astype(jnp.float32)  # (block_kv, d)
    v = v_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0][None, :]  # (1, block_kv)
    block_kv = k.shape[0]
    kv_idx = pl.program_id(1)
    num_q = pl.cdiv(seq_q, block_q)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        s = sm_scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        if causal:
            rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = kv_idx * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        # Rows whose keys were ALL masked saved lse = NEG_INF and output 0;
        # exp(s - lse) would wrongly give p = 1 per key. Zero them instead.
        p = jnp.where(lse[:, None] <= NEG_INF * 0.5, 0.0, jnp.exp(s - lse[:, None]))
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None]) * sm_scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    d = k.shape[-1]
    lower = kv_idx * block_kv // block_q if causal else 0
    dk0 = jnp.zeros((block_kv, d), jnp.float32)
    dv0 = jnp.zeros((block_kv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(lower, num_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_kv, seq_kv, causal, sm_scale,
):
    """One program = one (batch*head, q_block). Loops over kv blocks."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    block_q = q.shape[0]
    q_idx = pl.program_id(1)
    num_kv = pl.cdiv(seq_kv, block_kv)

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = sm_scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias_ref[0, 0, pl.ds(i * block_kv, block_kv)][None, :]
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        p = jnp.where(lse[:, None] <= NEG_INF * 0.5, 0.0, jnp.exp(s - lse[:, None]))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta[:, None]) * sm_scale
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        upper = jnp.minimum(num_kv, (q_idx + 1) * block_q // block_kv + 1)
    else:
        upper = num_kv
    dq = jax.lax.fori_loop(0, upper, body, jnp.zeros_like(q))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _pick_block(seq: int, target: int) -> int:
    block = min(target, seq)
    while seq % block != 0:
        block //= 2
    return max(block, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, bias, causal, block_q, block_kv, interpret):
    out, _ = _flash_fwd_impl(q, k, v, bias, causal, block_q, block_kv, interpret)
    return out


def _flash_fwd_impl(q, k, v, bias, causal, block_q, block_kv, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    bq = _pick_block(sq, block_q)
    bkv = _pick_block(sk, block_kv)
    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    grid = (b * h, sq // bq)
    # bias is (B, 1, Sk), shared across heads: program g -> batch g // h
    bias_spec = pl.BlockSpec((1, 1, sk), lambda g, i: (g // h, 0, 0))

    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block_kv=bkv, seq_kv=sk, causal=causal, sm_scale=sm_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, sk, d), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda g, i: (g, 0, 0)),
            bias_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda g, i: (g, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, sq), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias)
    return out.reshape(b, h, sq, d), lse


def _flash_fwd(q, k, v, bias, causal, block_q, block_kv, interpret):
    out, lse = _flash_fwd_impl(q, k, v, bias, causal, block_q, block_kv, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_bwd(causal, block_q, block_kv, interpret, residuals, g):
    q, k, v, bias, out, lse = residuals
    b, h, sq, d = q.shape
    sk = k.shape[2]
    sm_scale = 1.0 / (d**0.5)
    bq = _pick_block(sq, block_q)
    bkv = _pick_block(sk, block_kv)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (b,h,sq)
    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    gr = g.reshape(b * h, sq, d)
    dr = delta.reshape(b * h, 1, sq)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=bq, seq_q=sq, causal=causal, sm_scale=sm_scale
        ),
        grid=(b * h, sk // bkv),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((1, bkv, d), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((1, 1, bkv), lambda g_, i: (g_ // h, 0, i)),
            pl.BlockSpec((1, sq, d), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((1, 1, sq), lambda g_, i: (g_, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bkv, d), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda g_, i: (g_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ],
        interpret=interpret,
    )(qr, kr, vr, bias, gr, lse, dr)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_kv=bkv, seq_kv=sk, causal=causal, sm_scale=sm_scale
        ),
        grid=(b * h, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((1, sk, d), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((1, sk, d), lambda g_, i: (g_, 0, 0)),
            pl.BlockSpec((1, 1, sk), lambda g_, i: (g_ // h, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda g_, i: (g_, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda g_, i: (g_, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda g_, i: (g_, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda g_, i: (g_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, bias, gr, lse, dr)

    return (
        dq.reshape(b, h, sq, d),
        dk.reshape(b, h, sk, d),
        dv.reshape(b, h, sk, d),
        None,  # bias (mask) is non-differentiable
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Blockwise flash attention over (B, H, S, D) tensors.

    ``mask``: None, or a key-padding mask broadcastable to (B, 1, 1, Sk)
    (0/False = masked). Key-padding masks become a per-key additive bias
    inside the kernel. General per-query masks fall back to the XLA path.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if mask is not None:
        mask = mask.astype(bool)
        key_only = mask.ndim == 4 and mask.shape[-2] == 1 and mask.shape[1] == 1
        if not key_only:
            from pgica_tpu.ops.attention import _xla_attention

            return _xla_attention(q, k, v, mask, causal)
        keep = jnp.broadcast_to(mask[:, 0, 0, :], (b, sk))
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]
    else:
        bias = jnp.zeros((b, 1, sk), jnp.float32)
    return _flash(q, k, v, bias, causal, block_q, block_kv, interpret)
