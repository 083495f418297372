"""Batch logits processing + sampling.

Behavioral parity with the reference's standalone logits pipeline
(reference: hydrainfer/sampling/logits_processor.py:55-100): frequency /
presence / repetition penalties, temperature, top-k, top-p — implemented as
pure jnp transforms over (n_seqs, vocab) logits. The engine's hot path stays
greedy argmax like the reference; this pipeline backs the sampling params
surface and offline evaluation.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def apply_count_penalties(logits: jax.Array, token_counts: jax.Array,
                          frequency_penalty: jax.Array,
                          presence_penalty: jax.Array) -> jax.Array:
    """token_counts: (S, vocab) occurrence counts of generated tokens."""
    logits = logits - frequency_penalty[:, None] * token_counts
    logits = logits - presence_penalty[:, None] * (token_counts > 0)
    return logits


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array,
                             repetition_penalty: jax.Array) -> jax.Array:
    """seen_mask: (S, vocab) bool — tokens present in prompt or output."""
    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    return jnp.where(seen_mask, penalized, logits)


def apply_temperature(logits: jax.Array, temperature: jax.Array) -> jax.Array:
    t = jnp.maximum(temperature, 1e-6)[:, None]
    return logits / t


def apply_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """top_k: (S,) int32; <=0 disables."""
    vocab = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # descending
    k = jnp.where(top_k <= 0, vocab, top_k)
    kth = jnp.take_along_axis(
        sorted_logits, jnp.minimum(k - 1, vocab - 1)[:, None], axis=-1)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering; top_p: (S,) float, >=1 disables."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix with cumulative prob >= top_p (always >= 1 tok)
    keep = (cum - probs) < top_p[:, None]
    cutoff = jnp.where(keep, sorted_logits, jnp.inf).min(axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def spec_verify_tokens(logits: jax.Array, draft_next: jax.Array,
                       draft_lens: jax.Array,
                       temperature: Optional[jax.Array] = None,
                       top_k: Optional[jax.Array] = None,
                       top_p: Optional[jax.Array] = None,
                       key: Optional[jax.Array] = None):
    """Speculative verification over S segments of K1 rows.

    logits (S, K1, V): row j's next-token distribution after consuming
    position j. draft_next (S, K1): the token PROPOSED as row j's output
    (i.e. draft j+1); only the first draft_lens entries per row are real.
    Returns (emitted (S, K1) int32, acc (S,) int32): emitted[i, :acc[i]]
    are accepted drafts, emitted[i, acc[i]] is the final token, entries
    past acc are garbage the caller drops.

    Greedy rows (temperature absent or <= 0): acceptance is the exact
    argmax match — byte-identical to plain greedy decoding. Stochastic
    rows: standard rejection sampling against the one-hot draft proposal —
    accept draft d at row j with probability p_j(d) (p = the
    temperature/top-k/top-p–filtered distribution); on the first rejection
    sample from the residual normalize(max(p - onehot_d, 0)), which for a
    one-hot proposal is p with d zeroed — this preserves the target
    sampling distribution EXACTLY (the spec-sampling theorem), so
    speculation changes no output statistics, only latency. When every
    real draft is accepted the final token is a bonus sample from the last
    row's distribution."""
    S, K1, V = logits.shape
    lg = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)      # (S, K1)
    dn = jnp.clip(draft_next, 0, V - 1)
    dl = jnp.clip(draft_lens, 0, K1 - 1)

    stoch = None
    probs = None
    if temperature is not None and key is not None:
        stoch = temperature > 0
        flat = lg.reshape(S * K1, V)
        flat = apply_temperature(flat, jnp.repeat(temperature, K1))
        if top_k is not None:
            flat = apply_top_k(flat, jnp.repeat(top_k, K1))
        if top_p is not None:
            flat = apply_top_p(flat, jnp.repeat(top_p, K1))
        probs = jax.nn.softmax(flat, axis=-1).reshape(S, K1, V)

    if probs is not None:
        p_draft = jnp.take_along_axis(probs, dn[..., None], axis=-1)[..., 0]
        k_u, k_s = jax.random.split(key)
        u = jax.random.uniform(k_u, (S, K1))
        accept = jnp.where(stoch[:, None], u < p_draft, greedy_tok == dn)
    else:
        accept = greedy_tok == dn

    j = jnp.arange(K1, dtype=jnp.int32)
    in_draft = j[None, :] < dl[:, None]
    acc = jnp.sum(jnp.cumprod((accept & in_draft).astype(jnp.int32), axis=1),
                  axis=1)                                        # (S,)
    row = jnp.arange(S)
    if probs is not None:
        p_row = probs[row, acc]                                  # (S, V)
        d_row = dn[row, acc]
        resid = p_row.at[row, d_row].set(0.0)
        dist = jnp.where((acc < dl)[:, None], resid, p_row)
        dist = dist / jnp.maximum(dist.sum(-1, keepdims=True), 1e-20)
        samp = jax.random.categorical(
            k_s, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1).astype(jnp.int32)
        final = jnp.where(stoch, samp, greedy_tok[row, acc])
    else:
        final = greedy_tok[row, acc]
    emitted = jnp.where(j[None, :] < acc[:, None], dn, 0)
    emitted = emitted.at[row, acc].set(final)
    return emitted.astype(jnp.int32), acc.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("greedy",))
def process_logits(logits: jax.Array,
                   token_counts: Optional[jax.Array] = None,
                   seen_mask: Optional[jax.Array] = None,
                   frequency_penalty: Optional[jax.Array] = None,
                   presence_penalty: Optional[jax.Array] = None,
                   repetition_penalty: Optional[jax.Array] = None,
                   temperature: Optional[jax.Array] = None,
                   top_k: Optional[jax.Array] = None,
                   top_p: Optional[jax.Array] = None,
                   key: Optional[jax.Array] = None,
                   greedy: bool = False) -> jax.Array:
    """Full pipeline → sampled token ids (S,)."""
    logits = logits.astype(jnp.float32)
    if token_counts is not None:
        logits = apply_count_penalties(logits, token_counts,
                                       frequency_penalty, presence_penalty)
    if seen_mask is not None and repetition_penalty is not None:
        logits = apply_repetition_penalty(logits, seen_mask, repetition_penalty)
    if temperature is not None:
        logits = apply_temperature(logits, temperature)
    if top_k is not None:
        logits = apply_top_k(logits, top_k)
    if top_p is not None:
        logits = apply_top_p(logits, top_p)
    if greedy or key is None:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
