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
