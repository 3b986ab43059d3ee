"""Jit-compiled autoregressive caption decoding with KV caches.

Replaces HF ``generate()`` (reference model.py:663-678) with fixed-shape,
scan-based decode loops that XLA compiles once per (batch, max_length,
num_beams) signature:

* greedy decoding
* temperature / nucleus (top-p) sampling
* beam search with length penalty
* repetition penalty (HF semantics: positive logits divided, negative
  multiplied, over previously generated tokens)
* EOS early-stop via finished-masking (loop shape stays static)

Sequence layout matches the reference's generation path (model.py:611-617):
the projected vision embedding occupies position 0 and tokens extend from
position 1; the first token is predicted directly from the vision token.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pgica_tpu.models.lm import init_kv_cache

NEG_INF = -1.0e9


def _apply_repetition_penalty(logits: jax.Array, presence: jax.Array, penalty) -> jax.Array:
    """HF semantics; `penalty` may be traced (1.0 is naturally a no-op)."""
    penalty = jnp.asarray(penalty, logits.dtype)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence > 0, penalized, logits)


def _top_p_filter(logits: jax.Array, top_p) -> jax.Array:
    """Mask logits outside the nucleus (per row). `top_p` may be traced;
    top_p >= 1.0 keeps every token."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    cdf = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # smallest set with cumulative prob >= top_p; keep at least 1 token
    cutoff_idx = jnp.sum(cdf < top_p, axis=-1, keepdims=True)
    cutoff_idx = jnp.clip(cutoff_idx, 0, logits.shape[-1] - 1)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, NEG_INF, logits)


@functools.partial(
    jax.jit,
    static_argnames=(
        "module", "max_length", "do_sample", "eos_token_id", "pad_token_id",
        "early_stop",
    ),
)
def _greedy_or_sample(
    module,
    params,
    vision_embeddings,
    rng,
    temperature,
    top_p,
    repetition_penalty,
    *,
    max_length: int,
    do_sample: bool,
    eos_token_id: int,
    pad_token_id: int,
    early_stop: bool = False,
):
    # temperature/top_p/repetition_penalty are TRACED so sweeping sampling
    # settings does not recompile the decode graph (only shape-affecting
    # arguments stay static).
    batch = vision_embeddings.shape[0]
    vocab = module.decoder_config.vocab_size
    cache_len = max_length + 1  # +1 for the vision token at position 0
    caches = init_kv_cache(module.decoder_config, batch, cache_len, module.dtype)

    def mask_at(pos):
        return (jnp.arange(cache_len)[None, :] <= pos).astype(jnp.int32).repeat(batch, 0)

    first_logits, caches = module.apply(
        {"params": params}, vision_embeddings, caches, mask_at(0), method="decode_prefix"
    )

    def pick(logits, presence, key):
        logits = _apply_repetition_penalty(logits.astype(jnp.float32), presence, repetition_penalty)
        if do_sample:
            logits = logits / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
            logits = _top_p_filter(logits, top_p)
            return jax.random.categorical(key, logits, axis=-1)
        return jnp.argmax(logits, axis=-1)

    rng, key0 = jax.random.split(rng)
    presence0 = jnp.zeros((batch, vocab), jnp.int32)
    tok0 = pick(first_logits, presence0, key0)
    finished0 = tok0 == eos_token_id
    presence0 = presence0.at[jnp.arange(batch), tok0].set(1)

    def step(carry, t):
        tokens, presence, finished, caches, rng = carry
        rng, key = jax.random.split(rng)
        logits, caches = module.apply(
            {"params": params},
            tokens[:, None],
            t,  # cache write position: token t-1 sits at cache slot t
            caches,
            mask_at(t),
            method="decode_step",
        )
        nxt = pick(logits, presence, key)
        nxt = jnp.where(finished, pad_token_id, nxt)
        new_finished = finished | (nxt == eos_token_id)
        presence = presence.at[jnp.arange(batch), nxt].set(1)
        return (nxt, presence, new_finished, caches, rng), nxt

    if early_stop:
        # while_loop variant: stops as soon as EVERY sequence has emitted EOS.
        # Token-identical to the scan path — steps past all-finished would
        # only ever write pads (see `step`), and the per-step rng splits
        # happen in the same order, so skipping them changes nothing.
        # Serving win: real captions run ~10-25 tokens vs max_length 32-128,
        # so the decode loop executes a fraction of its static bound.
        seqs0 = jnp.full((batch, max_length), pad_token_id, jnp.int32)
        seqs0 = seqs0.at[:, 0].set(tok0)

        def cond(carry):
            t = carry[0]
            finished = carry[4]
            return (t < max_length) & ~jnp.all(finished)

        def body(carry):
            t, seqs, tokens, presence, finished, caches, rng = carry
            (nxt, presence, finished, caches, rng), _ = step(
                (tokens, presence, finished, caches, rng), t
            )
            seqs = jax.lax.dynamic_update_slice_in_dim(seqs, nxt[:, None], t, axis=1)
            return (t + 1, seqs, nxt, presence, finished, caches, rng)

        carry = (jnp.asarray(1, jnp.int32), seqs0, tok0, presence0, finished0, caches, rng)
        carry = jax.lax.while_loop(cond, body, carry)
        return carry[1]

    (_, _, _, _, _), rest = jax.lax.scan(
        step,
        (tok0, presence0, finished0, caches, rng),
        jnp.arange(1, max_length),
    )
    sequences = jnp.concatenate([tok0[:, None], rest.T], axis=1)  # (B, max_length)
    return sequences


@functools.partial(
    jax.jit,
    static_argnames=(
        "module", "max_length", "num_beams", "length_penalty",
        "eos_token_id", "pad_token_id", "early_stop",
    ),
)
def _beam_search(
    module,
    params,
    vision_embeddings,
    repetition_penalty,
    *,
    max_length: int,
    num_beams: int,
    length_penalty: float,
    eos_token_id: int,
    pad_token_id: int,
    early_stop: bool = False,
):
    batch = vision_embeddings.shape[0]
    k = num_beams
    vocab = module.decoder_config.vocab_size
    cache_len = max_length + 1

    # Expand vision embeddings to (B*K, D); all beams share the prefix.
    vis = jnp.repeat(vision_embeddings, k, axis=0)
    caches = init_kv_cache(module.decoder_config, batch * k, cache_len, module.dtype)

    def mask_at(pos):
        return (jnp.arange(cache_len)[None, :] <= pos).astype(jnp.int32).repeat(batch * k, 0)

    first_logits, caches = module.apply(
        {"params": params}, vis, caches, mask_at(0), method="decode_prefix"
    )
    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1).reshape(batch, k, vocab)[:, 0]
    # Initialize beams with the top-k first tokens.
    top0 = jax.lax.top_k(logp0, k)  # ((B,K) scores, (B,K) tokens)
    live_scores, tok0 = top0
    live_seqs = jnp.full((batch, k, max_length), pad_token_id, jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(tok0)
    presence = jax.nn.one_hot(tok0, vocab, dtype=jnp.int32)  # (B,K,V)
    live_finished = tok0 == eos_token_id

    def lp_norm(score, length):
        return score / jnp.power(length.astype(jnp.float32), length_penalty)

    # Beams whose FIRST token is EOS are complete hypotheses of length 1;
    # record them now (they can never re-enter the finished pool later).
    fin_seqs = jnp.where(live_finished[..., None], live_seqs,
                         jnp.full((batch, k, max_length), pad_token_id, jnp.int32))
    fin_scores = jnp.where(
        live_finished, lp_norm(live_scores, jnp.asarray(1)), NEG_INF
    ).astype(jnp.float32)

    def step(carry, t):
        live_seqs, live_scores, live_finished, presence, fin_seqs, fin_scores, caches = carry
        last_tok = jax.lax.dynamic_slice_in_dim(live_seqs, t - 1, 1, axis=2).reshape(batch * k, 1)
        logits, new_caches = module.apply(
            {"params": params}, last_tok, t, caches, mask_at(t), method="decode_step"
        )
        logits = logits.astype(jnp.float32).reshape(batch, k, vocab)
        logits = _apply_repetition_penalty(logits, presence, repetition_penalty)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # Finished live beams must not expand: only PAD continuation at no cost.
        pad_only = jnp.full((vocab,), NEG_INF).at[pad_token_id].set(0.0)
        logp = jnp.where(live_finished[..., None], pad_only[None, None, :], logp)
        total = live_scores[..., None] + logp  # (B,K,V)

        flat = total.reshape(batch, k * vocab)
        cand_scores, cand_idx = jax.lax.top_k(flat, 2 * k)  # (B,2K)
        cand_beam = cand_idx // vocab
        cand_tok = cand_idx % vocab

        def gather_beams(x, beam_idx):
            return jnp.take_along_axis(
                x, beam_idx.reshape(beam_idx.shape + (1,) * (x.ndim - 2)), axis=1
            )

        cand_seqs = gather_beams(live_seqs, cand_beam)  # (B,2K,L)
        cand_seqs = cand_seqs.at[:, :, t].set(cand_tok)
        was_finished = jnp.take_along_axis(live_finished, cand_beam, axis=1)
        now_finished = (cand_tok == eos_token_id) & ~was_finished

        # --- update finished pool with newly finished candidates
        new_fin_scores = jnp.where(now_finished, lp_norm(cand_scores, jnp.asarray(t + 1)), NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, new_fin_scores], axis=1)  # (B,3K)
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        best_fin = jax.lax.top_k(all_fin_scores, k)
        fin_scores2 = best_fin[0]
        fin_seqs2 = jnp.take_along_axis(all_fin_seqs, best_fin[1][..., None], axis=1)

        # --- pick top-k live candidates. Candidates that just finished OR
        # come from an already-finished beam (pad continuations) are excluded:
        # finished hypotheses live in the fin pool only, so they cannot crowd
        # genuinely live beams out of the live set (HF semantics).
        live_mask = ~now_finished & ~was_finished
        live_cand_scores = jnp.where(live_mask, cand_scores, NEG_INF)
        best_live = jax.lax.top_k(live_cand_scores, k)
        live_scores2 = best_live[0]
        sel = best_live[1]  # (B,K) indices into 2K candidates
        live_seqs2 = jnp.take_along_axis(cand_seqs, sel[..., None], axis=1)
        sel_beam = jnp.take_along_axis(cand_beam, sel, axis=1)
        sel_tok = jnp.take_along_axis(cand_tok, sel, axis=1)
        live_finished2 = jnp.take_along_axis(was_finished, sel, axis=1)

        presence2 = gather_beams(presence, sel_beam)
        presence2 = jnp.maximum(presence2, jax.nn.one_hot(sel_tok, vocab, dtype=jnp.int32))

        # --- reorder caches to follow the selected beams
        def reorder(c):
            c4 = c.reshape((batch, k) + c.shape[1:])
            c4 = jnp.take_along_axis(
                c4, sel_beam.reshape(batch, k, 1, 1, 1), axis=1
            )
            return c4.reshape((batch * k,) + c.shape[1:])

        caches2 = jax.tree.map(reorder, new_caches)
        return (live_seqs2, live_scores2, live_finished2, presence2, fin_seqs2, fin_scores2, caches2), None

    carry = (live_seqs, live_scores, live_finished, presence, fin_seqs, fin_scores, caches)
    if early_stop and length_penalty >= 0:
        # Sound early exit. Log-probs are <= 0, so a live beam's score only
        # decreases; with lp >= 0 its best achievable normalized score —
        # whether it survives to the live-finalize (norm by max_length) or
        # finishes into the pool later (norm by a length <= max_length,
        # which for negative scores is never better) — is bounded by
        # score_t / max_length**lp. Once every batch row's best finished
        # hypothesis meets that bound, no remaining step can change the
        # final argmax, and the loop exits. Result-identical to the fixed
        # scan (modulo exact score ties, where the finalize already prefers
        # the finished pool).
        denom = float(max_length) ** float(length_penalty)

        def cond(wcarry):
            t = wcarry[0]
            _, _, live_scores, _, _, _, fin_scores, _ = wcarry
            bound = jnp.max(live_scores, axis=1) / denom
            return (t < max_length) & ~jnp.all(fin_scores[:, 0] >= bound)

        def body(wcarry):
            t = wcarry[0]
            inner, _ = step(wcarry[1:], t)
            return (t + 1,) + inner

        out = jax.lax.while_loop(cond, body, (jnp.asarray(1, jnp.int32),) + carry)
        live_seqs, live_scores, live_finished, presence, fin_seqs, fin_scores, _ = out[1:]
    else:
        (live_seqs, live_scores, live_finished, presence, fin_seqs, fin_scores, _), _ = jax.lax.scan(
            step, carry, jnp.arange(1, max_length)
        )

    # Final selection compares the best finished hypothesis against the best
    # live beam on length-penalty-normalized scores (HF finalize semantics:
    # live beams are added to the hypothesis pool at the end, then the
    # highest normalized score wins).
    live_norm = lp_norm(live_scores, jnp.asarray(max_length))
    best_live_idx = jnp.argmax(live_norm, axis=1)
    best_live_seq = jnp.take_along_axis(live_seqs, best_live_idx[:, None, None], axis=1)[:, 0]
    best_live_score = jnp.take_along_axis(live_norm, best_live_idx[:, None], axis=1)[:, 0]
    have_fin = fin_scores[:, 0] > NEG_INF / 2
    use_fin = have_fin & (fin_scores[:, 0] >= best_live_score)
    best_fin_seq = fin_seqs[:, 0]
    return jnp.where(use_fin[:, None], best_fin_seq, best_live_seq)


def generate(
    module,
    params,
    vision_embeddings,
    *,
    bos_token_id: int,
    eos_token_id: int,
    pad_token_id: int,
    max_length: int = 128,
    num_beams: int = 1,
    temperature: float = 1.0,
    do_sample: bool = False,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    length_penalty: float = 1.0,
    rng: Optional[jax.Array] = None,
    early_stop: bool = False,
) -> jax.Array:
    """Decode captions from vision embeddings. Returns (B, max_length) int32.

    ``num_beams > 1`` uses beam search (sampling flags ignored, as in HF when
    beams dominate); otherwise greedy or top-p sampling per ``do_sample``.

    ``early_stop=True`` swaps the fixed-length scan for a ``lax.while_loop``:
    greedy/sampling exits once every sequence emitted EOS (token-identical);
    beam search exits once every row's best finished hypothesis provably beats
    any live beam's best achievable normalized score (result-identical for
    ``length_penalty >= 0``; negative penalties keep the fixed scan). Use for
    serving real traffic; benchmarks keep the fixed-length scan for
    run-to-run comparability.

    ``bos_token_id`` is accepted for API symmetry but unused: like the
    reference's HF ``generate(inputs_embeds=...)`` path (model.py:611-617),
    decoding is seeded by the projected vision embedding at position 0 and
    the first text token is predicted directly from it.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if num_beams > 1:
        return _beam_search(
            module,
            params,
            vision_embeddings,
            repetition_penalty,
            max_length=max_length,
            num_beams=num_beams,
            length_penalty=length_penalty,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            early_stop=early_stop,
        )
    return _greedy_or_sample(
        module,
        params,
        vision_embeddings,
        rng,
        temperature,
        top_p,
        repetition_penalty,
        max_length=max_length,
        do_sample=do_sample,
        eos_token_id=eos_token_id,
        pad_token_id=pad_token_id,
        early_stop=early_stop,
    )
