"""Focal visual-token pruning (reference: hydrainfer/layer/token_prunning.py:5-72).

Selects the most-attended visual tokens from the ViT's last-layer attention
scores. Two strategies, mirroring the reference:
  - 'rank': score each token by the class-token attention (or mean over
    queries when no class token), keep the global top-n.
  - 'row':  keep the top-(n/rows) per attention row, union-style.
Like the reference, the plumbing exists (VisionModelParameters.
return_last_layer_attention, CLIP/ViT score outputs, TokenParameters) and
pruning is applied by callers that opt in.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def focal_pruning_rank(scores: jax.Array, n_keep: int,
                       use_cls_query: bool = True) -> jax.Array:
    """scores: (n_heads, n_q, n_k) last-layer attention of ONE image.
    Returns sorted indices (n_keep,) of the kept tokens (class excluded)."""
    s = jnp.mean(scores, axis=0)             # (n_q, n_k)
    token_scores = s[0, 1:] if use_cls_query else jnp.mean(s[:, 1:], axis=0)
    _, idx = jax.lax.top_k(token_scores, n_keep)
    return jnp.sort(idx)


def focal_pruning_row(scores: jax.Array, n_keep: int) -> jax.Array:
    """Row strategy: each query row votes for its top tokens; keep the
    n_keep tokens with the most votes."""
    s = jnp.mean(scores, axis=0)[:, 1:]      # (n_q, n_k-1)
    per_row = max(1, n_keep // s.shape[0])
    _, row_top = jax.lax.top_k(s, per_row)   # (n_q, per_row)
    votes = jnp.zeros(s.shape[1], jnp.float32).at[row_top.reshape(-1)].add(1.0)
    # tie-break by mean score
    votes = votes + jnp.mean(s, axis=0)
    _, idx = jax.lax.top_k(votes, n_keep)
    return jnp.sort(idx)


def focal_pruning(features: jax.Array, scores: jax.Array, n_keep: int,
                  strategy: str = "rank") -> Tuple[jax.Array, jax.Array]:
    """features: (n_tokens, d) of one image (class token already dropped);
    scores: (n_heads, n_q, n_k). Returns (kept features, kept indices)."""
    idx = (focal_pruning_rank(scores, n_keep) if strategy == "rank"
           else focal_pruning_row(scores, n_keep))
    return jnp.take(features, idx, axis=0), idx
