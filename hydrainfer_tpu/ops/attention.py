"""Paged causal attention over the HBM block cache + varlen ViT attention.

TPU-native replacement for the reference's attention handler chain
(reference: hydrainfer/layer/causal_attention.py:225-392 — flashinfer →
self-built flash_attn → torch reference; csrc/kernel/flash_attn). The same
chain idea survives as implementations selected by `impl`:

  - 'ragged' : the tuned TPU Pallas ragged-paged-attention kernel
               (mixed prefill+decode, flash-style, reads KV pages from HBM
               with no page materialization; also the int8-KV path via
               k_scale/v_scale).
  - 'jnp'    : gather-dense masked attention. The correctness oracle, the
               CPU/interpret path for tests, and the fallback.
  - 'auto'   : ragged on TPU, else jnp.

Cache layout (shared with the kernel, zero-copy):
  (n_layers, 1, n_blocks, block_size, 2*n_kv_heads, head_dim)
with K at even combined-head indices and V at odd.

Batch geometry (static shapes — every array is padded to a bucket):
  tokens of all sequences are flattened to one (T,) axis with each
  sequence's tokens contiguous; sequences to (S,). A single batch mixes
  prefill chunks and decode steps freely, matching the reference's unified
  Fill instruction (reference: hydrainfer/engine/isa.py).
"""
import functools
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)
# dense-oracle score workspace above this switches to the per-sequence
# lax.map form (see paged_attention_jnp)
_ORACLE_SCORE_BYTES_LIMIT = int(os.environ.get(
    "HYDRAINFER_ORACLE_SCORE_BYTES", 1 << 30))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PagedAttentionParams:
    """Device-side batch geometry for one fill step.

    q_seq_ids:    (T,) int32  sequence index of each token; -1 = padding
    q_local_ids:  (T,) int32  token's index within its sequence's q chunk
    positions:    (T,) int32  absolute kv position of each token
    kv_lens:      (S,) int32  kv length per sequence incl. this chunk; 0 = pad
    block_tables: (S, MB) int32 physical block ids; -1 = pad
    new_kv_slot_ids: (T,) int32 physical slot receiving each token's K/V; -1 = pad
    cu_q_lens:    (S+1,) int32 cumulative q-chunk lengths (tokens contiguous)
    num_seqs:     (1,) int32 dynamic number of real sequences
    """
    q_seq_ids: jax.Array
    q_local_ids: jax.Array
    positions: jax.Array
    kv_lens: jax.Array
    block_tables: jax.Array
    new_kv_slot_ids: jax.Array
    cu_q_lens: jax.Array
    num_seqs: jax.Array

    @property
    def n_seqs(self) -> int:
        return self.kv_lens.shape[0]

    @property
    def n_tokens(self) -> int:
        return self.q_seq_ids.shape[0]


def _gather_pages(cache: jax.Array, layer_id, tensor_id: int,
                  block_tables: jax.Array, combined_offset: int,
                  step: int = 2) -> jax.Array:
    """Gather K or V pages into dense (S, MB*bs, KVH, D) from the
    combined-head layout (K at even indices, V at odd). step=1 reads a
    single-plane cache (MLA latent: one vector is both K and V)."""
    tables = jnp.maximum(block_tables, 0)
    pages = cache[layer_id, tensor_id][tables]     # (S, MB, bs, 2KVH, D)
    kv = pages[..., combined_offset::step, :]       # (S, MB, bs, KVH, D)
    s, mb, bs, h, d = kv.shape
    return kv.reshape(s, mb * bs, h, d)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def paged_attention_jnp(q: jax.Array, cache: jax.Array, layer_id,
                        params: PagedAttentionParams, sm_scale: float,
                        max_q: int, kv_scale: Optional[float] = None) -> jax.Array:
    """Gather-dense reference implementation.

    q: (T, H, D). cache: (L, 1, n_blocks, block_size, 2*KVH, D).
    max_q: static upper bound on any sequence's q-chunk length in this batch.
    returns (T, H, D).
    """
    T, H, D = q.shape
    KVH = max(cache.shape[-2] // 2, 1)   # single-plane (MLA latent): 1
    S = params.n_seqs

    if cache.shape[-2] == 1:
        # single-plane latent cache (MLA): one vector serves as K and V
        k = _gather_pages(cache, layer_id, 0, params.block_tables, 0, step=1)
        v = k
    else:
        k = _gather_pages(cache, layer_id, 0, params.block_tables, 0)
        v = _gather_pages(cache, layer_id, 0, params.block_tables, 1)
    if kv_scale is not None:
        k = (k.astype(jnp.float32) * kv_scale).astype(q.dtype)
        v = (v.astype(jnp.float32) * kv_scale).astype(q.dtype)
    max_kv = k.shape[1]
    k = _repeat_kv(k, H // KVH)  # (S, max_kv, H, D)
    v = _repeat_kv(v, H // KVH)

    # Scatter flat q into per-sequence padded layout (S, max_q, H, D).
    # Padding rows (seq -1) map to the out-of-bounds index S: under
    # mode='drop' negative indices wrap numpy-style, but >= S drops.
    q_pad = jnp.zeros((S, max_q, H, D), dtype=q.dtype)
    seq_ids = jnp.where(params.q_seq_ids < 0, S, params.q_seq_ids)
    q_pad = q_pad.at[seq_ids, params.q_local_ids].set(q, mode="drop")
    # causal masking runs over CACHE positions (kv_len - q_len + local id),
    # not rope positions — under M-RoPE image tokens share rope positions
    # while occupying distinct cache slots
    q_lens = params.cu_q_lens[1:] - params.cu_q_lens[:-1]          # (S,)
    cache_pos = (jnp.take(params.kv_lens - q_lens,
                          jnp.maximum(params.q_seq_ids, 0), axis=0)
                 + params.q_local_ids)
    pos_pad = jnp.zeros((S, max_q), dtype=jnp.int32)
    pos_pad = pos_pad.at[seq_ids, params.q_local_ids].set(cache_pos, mode="drop")

    kv_idx = jnp.arange(max_kv, dtype=jnp.int32)
    if S * H * max_q * max_kv * 4 > _ORACLE_SCORE_BYTES_LIMIT:
        # Memory-safe form: one sequence at a time under lax.map, so the
        # score workspace is (H, max_q, max_kv) instead of (S, ...). The
        # dense form's (S, H, 2048, 512) fp32 tensor at a 13B prefill is
        # ~10 GB and crashes the TPU compiler outright (same failure class
        # as the MLA oracle blow-up, PERF_NOTES round 3); per-sequence the
        # oracle prefills models whose heads no Pallas kernel serves yet.
        def one_seq(args):
            q_s, k_s, v_s, pos_s, kv_len = args
            qf = q_s.astype(jnp.float32) * sm_scale
            scores = jnp.einsum("qhd,khd->hqk", qf, k_s.astype(jnp.float32))
            causal = kv_idx[None, :] <= pos_s[:, None]        # (max_q, max_kv)
            valid = kv_idx[None, :] < kv_len
            mask = (causal & valid)[None]                     # (1, max_q, max_kv)
            scores = jnp.where(mask, scores, _NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - jnp.maximum(m, _NEG_INF / 2))
            e = jnp.where(mask, e, 0.0)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = e / jnp.maximum(denom, 1e-30)
            out_s = jnp.einsum("hqk,khd->qhd", p, v_s.astype(jnp.float32))
            return out_s

        out_pad = jax.lax.map(one_seq,
                              (q_pad, k, v, pos_pad, params.kv_lens))
        out = out_pad[jnp.minimum(seq_ids, S - 1), params.q_local_ids]
        return out.astype(q.dtype)

    qf = q_pad.astype(jnp.float32) * sm_scale
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("sqhd,skhd->shqk", qf, kf)  # (S, H, max_q, max_kv)

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


def paged_attention_ragged(q: jax.Array, cache: jax.Array, layer_id,
                           params: PagedAttentionParams, sm_scale: float,
                           k_scale: Optional[float] = None,
                           v_scale: Optional[float] = None,
                           pages_per_block: Optional[int] = None) -> jax.Array:
    """TPU Pallas kernel path (vLLM-style ragged paged attention)."""
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention.kernel import (
        ragged_paged_attention)
    kv_pages = cache[layer_id, 0]  # (n_blocks, block_size, 2*KVH, D) view
    if pages_per_block is not None:
        pages_per_block = min(pages_per_block, params.block_tables.shape[1])
    # The kernel's tuned block table has no entries for WIDE page tables
    # (pages_per_seq > 64): at T=2048/MB=128 it picks a q block whose
    # scoped-vmem footprint (q + out + f32 acc + l/m scratch) exceeds the
    # 16MB limit and the COMPILE fails, killing the serving step that
    # minted the key. Override both block sizes there (the kernel discards
    # a lone q cap — it re-derives BOTH from the table when either is
    # None, kernel.py:806) with a conservative 128-row q block (~10MB
    # total at 32 heads x d128). Narrow-table shapes keep the tuned table
    # (measured fine through MB<=64).
    T, H, D = q.shape
    nqpb = None
    pages_per_seq = params.block_tables.shape[1]
    if pages_per_seq > 64:
        # ALL T: at T=64/MB=128 the table instead picks a kv-pages block
        # whose double buffers alone blow the limit (measured 16.75M)
        nqpb = 128
        if pages_per_block is None:
            pages_per_block = min(8, pages_per_seq)
    return ragged_paged_attention(
        q, kv_pages,
        kv_lens=params.kv_lens,
        page_indices=jnp.maximum(params.block_tables, 0),
        cu_q_lens=params.cu_q_lens,
        num_seqs=params.num_seqs,
        num_queries_per_block=nqpb,
        sm_scale=sm_scale,
        k_scale=k_scale, v_scale=v_scale,
        num_kv_pages_per_block=pages_per_block,
    )


def paged_attention_layered(q: jax.Array, cache: jax.Array, layer_id,
                            params: PagedAttentionParams, sm_scale: float,
                            k_scale: Optional[float] = None,
                            v_scale: Optional[float] = None,
                            interpret: bool = False,
                            return_cache: bool = False):
    """Builder-owned Pallas kernel over the FULL multi-layer cache with a
    runtime layer scalar — no per-layer slice materialization (the per-step
    pool-size cost of the 'ragged' path, PERF_NOTES.md). Requires a value
    cache (not jax.Ref): the kernel reads pages straight from HBM. With
    return_cache=True the cache is passed through ALIASED so a scan carry
    stays pinned in place."""
    from .pallas.paged_attention import layered_paged_attention
    if isinstance(cache, jax.Ref):
        raise TypeError(
            "layered attention reads the cache value directly; configure the "
            "node with kv_cache_ref=False (a Ref snapshot read would copy "
            "the whole pool per step)")
    return layered_paged_attention(
        q, cache, jnp.asarray(layer_id, jnp.int32).reshape(1),
        params.kv_lens,
        jnp.maximum(params.block_tables, 0),
        params.cu_q_lens,
        params.num_seqs,
        sm_scale=sm_scale,
        k_scale=k_scale, v_scale=v_scale,
        interpret=interpret,
        return_cache=return_cache)


def paged_attention_mha_decode(q: jax.Array, cache: jax.Array, layer_id,
                               params: PagedAttentionParams, sm_scale: float,
                               kv_scale: Optional[float] = None,
                               pages_per_block: Optional[int] = None,
                               interpret: bool = False) -> jax.Array:
    """Builder decode kernel (ops/pallas/mha_decode.py, MHA + GQA):
    all-decode windows where every sequence has ONE query token (row i =
    seq i — the params builder emits decode rows in sequence order). q is
    permuted to the kernel's bulk-extraction head order (q heads move in
    blocks of Hq/Hkv with their kv head) and the output unpermuted."""
    from .pallas.mha_decode import decode_q_perm, mha_decode_attention
    kv_pages = cache[layer_id, 0]
    perm = decode_q_perm(q.shape[1], kv_pages.shape[-2] // 2, kv_pages.dtype)
    if perm is not None:
        q = q[:, perm, :]
    # kernel invariant: every LIVE row has kv_len >= 1 (a zero-len live row
    # would skip its block loop and deadlock the next row's DMA waits).
    # Decode rows always attend at least their own token; clamp so padding
    # rows (len 0, never processed) can't trip it either.
    kv_lens = jnp.maximum(params.kv_lens, 1)
    out = mha_decode_attention(
        q, kv_pages, kv_lens, jnp.maximum(params.block_tables, 0),
        params.num_seqs, sm_scale=sm_scale,
        k_scale=kv_scale, v_scale=kv_scale,
        num_kv_pages_per_block=pages_per_block, interpret=interpret)
    if perm is not None:
        inv = perm.argsort()
        out = out[:, inv, :]
    return out


def paged_attention_varlen_prefill(q: jax.Array, cache: jax.Array, layer_id,
                                   params: PagedAttentionParams,
                                   sm_scale: float,
                                   kv_scale: Optional[float] = None,
                                   interpret: bool = False) -> jax.Array:
    """Causal varlen flash over GATHERED pages — the prefill path for head
    shapes the upstream ragged kernel rejects (e.g. 80 combined kv heads at
    13B: "can not be XLA fully tiled"). Gathers each sequence's pages dense
    (O(kv bytes)), flattens them with per-row segment ids + cache
    positions, and runs the segment-masked flash kernel with its causal
    leg — O(Tq·Tkv) FLOPs like any attention, but O(T) HBM traffic where
    the dense oracle materializes an (S, H, max_q, max_kv) score tensor
    (~10 GB at a 13B T=2048 prefill — a compiler-killing allocation)."""
    T, H, D = q.shape
    KVH = max(cache.shape[-2] // 2, 1)
    S = params.n_seqs
    k = _gather_pages(cache, layer_id, 0, params.block_tables, 0)
    v = _gather_pages(cache, layer_id, 0, params.block_tables, 1)
    if kv_scale is not None:
        k = (k.astype(jnp.float32) * kv_scale).astype(q.dtype)
        v = (v.astype(jnp.float32) * kv_scale).astype(q.dtype)
    k = _repeat_kv(k, H // KVH)          # (S, max_kv, H, D)
    v = _repeat_kv(v, H // KVH)
    max_kv = k.shape[1]

    # flatten (S, max_kv) → rows with segment ids (-1 past each kv_len)
    k_flat = k.reshape(S * max_kv, H, D)
    v_flat = v.reshape(S * max_kv, H, D)
    kv_pos = jnp.tile(jnp.arange(max_kv, dtype=jnp.int32), S)
    kv_seg = jnp.repeat(jnp.arange(S, dtype=jnp.int32), max_kv)
    kv_seg = jnp.where(kv_pos < jnp.repeat(params.kv_lens, max_kv),
                       kv_seg, -1)

    # q rows carry their CACHE position (kv_len - q_len + local id) — the
    # same causal coordinate the oracle uses (rope positions diverge from
    # cache ids under M-RoPE)
    q_lens = params.cu_q_lens[1:] - params.cu_q_lens[:-1]
    cache_pos = (jnp.take(params.kv_lens - q_lens,
                          jnp.maximum(params.q_seq_ids, 0), axis=0)
                 + params.q_local_ids)

    from .pallas.mha_varlen import mha_varlen_flash
    return mha_varlen_flash(
        q, k_flat, v_flat, params.q_seq_ids, sm_scale,
        kv_seq_ids=kv_seg, q_pos=cache_pos, kv_pos=kv_pos,
        interpret=interpret)


def paged_attention_tp(q: jax.Array, cache: jax.Array, layer_id,
                       params: PagedAttentionParams, sm_scale: float,
                       max_q: int, mesh, impl: str = "auto",
                       kv_scale: Optional[float] = None) -> jax.Array:
    """Tensor-parallel paged attention: shard_map over the mesh's 'tp' axis.

    q's head axis and the cache's combined-kv-head axis are sharded, the
    batch geometry is replicated, and each device runs the single-device
    handler chain on its local heads — paged attention is embarrassingly
    parallel over heads, so no collectives are needed (the o_proj all-reduce
    falls out of the row-parallel matmul that follows). This is what lets
    the Pallas ragged kernel (which GSPMD cannot partition) run under the
    kv-head-sharded cache every real TP deployment uses.

    The combined-head layout interleaves K/V (even/odd): a contiguous shard
    of size 2*KVH/tp starts at an even index, so each device keeps whole
    K/V pairs. Falls back to the GSPMD-partitioned dense path when head
    counts don't divide the axis.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    tp = mesh.shape.get("tp", 1)
    H = q.shape[1]
    KVH = cache.shape[-2] // 2
    if cache.shape[-2] == 1 and H % tp == 0 and not isinstance(cache, jax.Ref):
        # single-plane MLA latent cache under TP: the cache REPLICATES
        # (kv head 1 cannot split) while q heads shard — and the latent
        # kernel is embarrassingly parallel over q heads, so each device
        # runs the handler chain on its head shard against the full
        # replicated plane (kernel on TPU, oracle in interpret/CPU)
        def local_latent(q_l, cache_l, layer_l, p_l):
            return paged_attention(q_l, cache_l, layer_l[0], p_l, sm_scale,
                                   max_q, impl=impl, kv_scale=kv_scale)

        rep = jax.tree_util.tree_map(lambda _: P(), params)
        return shard_map(
            local_latent, mesh=mesh,
            in_specs=(P(None, "tp", None), P(), P(), rep),
            out_specs=P(None, "tp", None),
            check_vma=False,
        )(q, cache, jnp.asarray(layer_id, jnp.int32).reshape(1), params)
    if cache.shape[-2] % 2 or H % tp or KVH % tp:
        # indivisible kv heads (or a Ref-held single-plane cache): GSPMD
        # partitions the oracle along the sharded q-head operands instead
        # of an explicit shard_map
        return paged_attention_jnp(q, cache, layer_id, params, sm_scale,
                                   max_q, kv_scale=kv_scale)

    def local(q_l, cache_l, layer_l, p_l):
        return paged_attention(q_l, cache_l, layer_l[0], p_l, sm_scale,
                               max_q, impl=impl, kv_scale=kv_scale)

    cache_spec = P(*([None] * (cache.ndim - 2) + ["tp", None]))
    rep = jax.tree_util.tree_map(lambda _: P(), params)
    out = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "tp", None), cache_spec, P(), rep),
        out_specs=P(None, "tp", None),
        check_vma=False,
    )(q, cache, jnp.asarray(layer_id, jnp.int32).reshape(1), params)
    return out


_FALLBACK_LOGGED = False


def paged_attention(q: jax.Array, cache: jax.Array, layer_id,
                    params: PagedAttentionParams, sm_scale: float,
                    max_q: int, impl: str = "auto",
                    kv_scale: Optional[float] = None,
                    pages_per_block: Optional[int] = None) -> jax.Array:
    """Handler-chain entry point. See module docstring for impl choices."""
    global _FALLBACK_LOGGED
    if cache.shape[-2] == 1:
        # single-plane latent cache (MLA): the upstream interleaved-K/V
        # ragged kernel cannot read it, but the builder layered kernel can
        # (ckv=1, the v:=k plane is both K and V) — and unlike the dense
        # oracle its HBM traffic is O(tokens attended) instead of
        # O(S * MB * block_size) gathered pages. Requires a stacked value
        # cache (layer_loop="scan", kv_cache_ref=False), like every layered
        # call; otherwise the oracle serves.
        if impl in ("auto", "layered") and not isinstance(cache, jax.Ref):
            try:
                if impl == "auto" and jax.default_backend() != "tpu":
                    raise ImportError("latent kernel auto-path is TPU-only")
                return paged_attention_layered(
                    q, cache, layer_id, params, sm_scale,
                    k_scale=kv_scale, v_scale=kv_scale,
                    interpret=jax.default_backend() != "tpu")
            except Exception as e:
                if impl == "layered":
                    raise
                if not _FALLBACK_LOGGED:
                    _FALLBACK_LOGGED = True
                    import logging
                    logging.getLogger(__name__).warning(
                        "latent paged-attention kernel unavailable, using "
                        "dense jnp fallback (first occurrence only): %s", e)
        return paged_attention_jnp(q, cache, layer_id, params, sm_scale,
                                   max_q, kv_scale=kv_scale)
    if impl == "layered":
        return paged_attention_layered(
            q, cache, layer_id, params, sm_scale,
            k_scale=kv_scale, v_scale=kv_scale,
            interpret=jax.default_backend() != "tpu")
    # all-decode window (max_q == 1): the builder decode kernel vectorizes
    # over kv heads and DMAs each sequence's pages once for ALL heads —
    # the upstream kernel's unrolled per-head loop costs ~8 ms/step at the
    # llava-7b MHA shape (PERF_NOTES r4). AUTO dispatches it at MHA
    # (ratio == 1) only: at GQA shapes the upstream kernel's per-kv-head
    # q tiles are dense and it measured 1.14x FASTER than this kernel
    # (qwen2-vl-2b engine A/B, PERF_NOTES r5) — impl="mha_decode" can
    # still force the GQA form (exact on chip; the capability exists for
    # combined-head shapes the upstream kernel rejects).
    if impl in ("auto", "mha_decode") and max_q == 1:
        from .pallas import mha_decode as _mhad
        if (_mhad.supports(q.shape[1], cache.shape[-2] // 2, q.shape[-1],
                           cache.dtype)
                and (impl == "mha_decode"
                     or q.shape[1] == cache.shape[-2] // 2)
                and os.environ.get("HYDRAINFER_MHA_DECODE", "1") != "0"):
            try:
                if impl == "auto" and jax.default_backend() != "tpu":
                    raise ImportError("mha decode auto-path is TPU-only")
                return paged_attention_mha_decode(
                    q, cache, layer_id, params, sm_scale, kv_scale=kv_scale,
                    pages_per_block=pages_per_block,
                    interpret=jax.default_backend() != "tpu")
            except Exception as e:
                if impl == "mha_decode":
                    raise
                if not _FALLBACK_LOGGED:
                    _FALLBACK_LOGGED = True
                    import logging
                    logging.getLogger(__name__).warning(
                        "mha decode kernel unavailable, trying the ragged "
                        "kernel (first occurrence only): %s", e)
    if impl == "mha_decode":
        # forced but this batch is not an all-decode window (prefill /
        # mixed) or the shape is unsupported: continue down the normal
        # chain (ragged with jnp fallback), NOT forced-ragged — a forced
        # ragged would re-raise off-TPU instead of falling back
        impl = "auto"
    if impl in ("auto", "ragged", "pallas"):
        try:
            if impl == "auto" and jax.default_backend() != "tpu":
                raise ImportError("ragged kernel is TPU-only; fall back")
            return paged_attention_ragged(q, cache, layer_id, params, sm_scale,
                                          k_scale=kv_scale, v_scale=kv_scale,
                                          pages_per_block=pages_per_block)
        except Exception as e:
            if impl in ("ragged", "pallas"):
                raise
            if not _FALLBACK_LOGGED:
                _FALLBACK_LOGGED = True
                import logging
                logging.getLogger(__name__).warning(
                    "paged attention kernel unavailable, trying the varlen "
                    "prefill kernel (first occurrence only): %s", e)
    # last kernel before the dense oracle: causal varlen flash over
    # gathered pages — serves prefill at head shapes the ragged kernel
    # rejects (13B's 80 combined kv heads) with O(T) HBM traffic
    if impl in ("auto", "varlen_prefill") and cache.shape[-2] > 1:
        try:
            if impl == "auto" and jax.default_backend() != "tpu":
                raise ImportError("varlen prefill auto-path is TPU-only")
            return paged_attention_varlen_prefill(
                q, cache, layer_id, params, sm_scale, kv_scale=kv_scale,
                interpret=jax.default_backend() != "tpu")
        except Exception as e:
            if impl == "varlen_prefill":
                raise
            if not _FALLBACK_LOGGED:
                _FALLBACK_LOGGED = True
                import logging
                logging.getLogger(__name__).warning(
                    "varlen prefill kernel unavailable, using dense jnp "
                    "fallback (first occurrence only): %s", e)
    return paged_attention_jnp(q, cache, layer_id, params, sm_scale, max_q,
                               kv_scale=kv_scale)


# ---------------- ViT attention ----------------

def mha_varlen(q: jax.Array, k: jax.Array, v: jax.Array,
               seq_ids: jax.Array, sm_scale: Optional[float] = None,
               return_scores: bool = False, impl: str = "auto"
               ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Varlen (segment-masked) bidirectional MHA over concatenated patches.

    Replaces the reference's varlen flash_attn chain for ViT towers
    (reference: hydrainfer/layer/multihead_attention.py:170-281). q/k/v:
    (T, H, D) flat across images; seq_ids: (T,) image index per patch
    (-1 = padding). Optionally returns the attention scores for focal
    token pruning (reference: hydrainfer/layer/token_prunning.py).

    Handler chain: the Pallas segment-masked flash kernel
    (ops/pallas/mha_varlen.py — O(T) HBM traffic) on TPU; the dense O(T²)
    jnp twin as oracle/fallback, and whenever the full score tensor is
    requested for token pruning.
    """
    if impl in ("auto", "flash") and not return_scores:
        use_kernel = jax.default_backend() == "tpu" or impl == "flash"
        if use_kernel and q.shape[0] >= 8:
            from .pallas.mha_varlen import mha_varlen_flash
            D = q.shape[-1]
            scale = sm_scale if sm_scale is not None else 1.0 / (D ** 0.5)
            try:
                out = mha_varlen_flash(
                    q, k, v, seq_ids, scale,
                    interpret=jax.default_backend() != "tpu")
                return out, None
            except Exception as e:
                global _FALLBACK_LOGGED
                if not _FALLBACK_LOGGED:
                    _FALLBACK_LOGGED = True
                    import logging
                    logging.getLogger(__name__).warning(
                        "varlen flash kernel unavailable, dense jnp fallback "
                        "(first occurrence only): %s", e)
    return _mha_varlen_dense(q, k, v, seq_ids, sm_scale, return_scores)


@functools.partial(jax.jit, static_argnames=("return_scores",))
def _mha_varlen_dense(q: jax.Array, k: jax.Array, v: jax.Array,
                      seq_ids: jax.Array, sm_scale: Optional[float] = None,
                      return_scores: bool = False
                      ) -> Tuple[jax.Array, Optional[jax.Array]]:
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
