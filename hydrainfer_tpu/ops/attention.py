"""Paged causal attention over the HBM block cache + varlen ViT attention.

TPU-native replacement for the reference's attention handler chain
(reference: hydrainfer/layer/causal_attention.py:225-392 — flashinfer →
self-built flash_attn → torch reference; csrc/kernel/flash_attn). The same
chain idea survives as implementations selected by `impl`:

  - 'jnp'    : gather-dense masked attention. The correctness oracle; also a
               respectable XLA path (dense einsum on the MXU) for small
               batches and the interpret/CPU path for tests.
  - 'pallas' : flash-style kernel reading KV pages directly from HBM with
               scalar-prefetched block tables (no page materialization).
  - 'auto'   : pallas on TPU when shapes allow, else jnp.

Batch geometry (static shapes — every array is padded to a bucket):
  tokens of all sequences are flattened to one (T,) axis; sequences to (S,).
  A single batch mixes prefill chunks and decode steps freely, matching the
  reference's unified Fill instruction (reference: hydrainfer/engine/isa.py).
"""
import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .cache_ops import gather_token_cache

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PagedAttentionParams:
    """Device-side batch geometry for one fill step.

    q_seq_ids:    (T,) int32  sequence index of each token; -1 = padding
    q_local_ids:  (T,) int32  token's index within its sequence's q chunk
    positions:    (T,) int32  absolute kv position of each token
    kv_lens:      (S,) int32  kv length per sequence incl. this chunk; 0 = pad
    block_tables: (S, max_blocks) int32 physical block ids; -1 = pad
    new_kv_slot_ids: (T,) int32 physical slot receiving each token's K/V; -1 = pad
    """
    q_seq_ids: jax.Array
    q_local_ids: jax.Array
    positions: jax.Array
    kv_lens: jax.Array
    block_tables: jax.Array
    new_kv_slot_ids: jax.Array

    @property
    def n_seqs(self) -> int:
        return self.kv_lens.shape[0]

    @property
    def n_tokens(self) -> int:
        return self.q_seq_ids.shape[0]


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def paged_attention_jnp(q: jax.Array, cache: jax.Array, layer_id,
                        params: PagedAttentionParams, sm_scale: float,
                        max_q: int) -> jax.Array:
    """Gather-dense reference implementation.

    q: (T, H, D). cache: (L, 2, n_blocks, block_size, KVH, D).
    max_q: static upper bound on any sequence's q-chunk length in this batch.
    returns (T, H, D).
    """
    T, H, D = q.shape
    KVH = cache.shape[-2]
    S = params.n_seqs

    k = gather_token_cache(cache, layer_id, 0, params.block_tables)  # (S, max_kv, KVH, D)
    v = gather_token_cache(cache, layer_id, 1, params.block_tables)
    max_kv = k.shape[1]
    k = _repeat_kv(k, H // KVH)  # (S, max_kv, H, D)
    v = _repeat_kv(v, H // KVH)

    # Scatter flat q into per-sequence padded layout (S, max_q, H, D).
    # Padding rows (seq -1) map to the out-of-bounds index S: under
    # mode='drop' negative indices wrap numpy-style, but >= S drops.
    q_pad = jnp.zeros((S, max_q, H, D), dtype=q.dtype)
    seq_ids = jnp.where(params.q_seq_ids < 0, S, params.q_seq_ids)
    q_pad = q_pad.at[seq_ids, params.q_local_ids].set(q, mode="drop")
    pos_pad = jnp.zeros((S, max_q), dtype=jnp.int32)
    pos_pad = pos_pad.at[seq_ids, params.q_local_ids].set(params.positions, mode="drop")

    qf = q_pad.astype(jnp.float32) * sm_scale
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("sqhd,skhd->shqk", qf, kf)  # (S, H, max_q, max_kv)

    kv_idx = jnp.arange(max_kv, dtype=jnp.int32)
    # causal: kv position j visible iff j <= token's absolute position
    causal = kv_idx[None, None, :] <= pos_pad[:, :, None]          # (S, max_q, max_kv)
    valid = kv_idx[None, None, :] < params.kv_lens[:, None, None]  # (S, 1->max_q, max_kv)
    mask = (causal & valid)[:, None, :, :]                         # (S, 1, max_q, max_kv)

    scores = jnp.where(mask, scores, _NEG_INF)
    # safe softmax: fully-masked rows (padded seqs) produce zeros, not NaN
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.maximum(m, _NEG_INF / 2))
    e = jnp.where(mask, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-30)
    out_pad = jnp.einsum("shqk,skhd->sqhd", p, v.astype(jnp.float32))

    out = out_pad[jnp.minimum(seq_ids, S - 1), params.q_local_ids]  # (T, H, D)
    return out.astype(q.dtype)


def paged_attention(q: jax.Array, cache: jax.Array, layer_id,
                    params: PagedAttentionParams, sm_scale: float,
                    max_q: int, impl: str = "auto") -> jax.Array:
    """Handler-chain entry point. See module docstring for impl choices."""
    if impl in ("auto", "pallas"):
        try:
            from .pallas.paged_attention import paged_attention_pallas
            return paged_attention_pallas(q, cache, layer_id, params, sm_scale, max_q)
        except Exception:
            if impl == "pallas":
                raise
    return paged_attention_jnp(q, cache, layer_id, params, sm_scale, max_q)


# ---------------- ViT attention ----------------

@functools.partial(jax.jit, static_argnames=("return_scores",))
def mha_varlen(q: jax.Array, k: jax.Array, v: jax.Array,
               seq_ids: jax.Array, sm_scale: Optional[float] = None,
               return_scores: bool = False
               ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Varlen (segment-masked) bidirectional MHA over concatenated patches.

    Replaces the reference's varlen flash_attn chain for ViT towers
    (reference: hydrainfer/layer/multihead_attention.py:170-281). q/k/v:
    (T, H, D) flat across images; seq_ids: (T,) image index per patch
    (-1 = padding). Optionally returns the attention scores for focal
    token pruning (reference: hydrainfer/layer/token_prunning.py).
    """
    T, H, D = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("qhd,khd->hqk", qf, k.astype(jnp.float32))
    same = (seq_ids[:, None] == seq_ids[None, :]) & (seq_ids >= 0)[:, None]
    scores = jnp.where(same[None, :, :], scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - jnp.maximum(m, _NEG_INF / 2))
    e = jnp.where(same[None], e, 0.0)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("hqk,khd->qhd", p, v.astype(jnp.float32)).astype(q.dtype)
    return (out, p) if return_scores else (out, None)
