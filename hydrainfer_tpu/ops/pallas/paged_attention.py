"""Builder-owned ragged paged attention over the FULL multi-layer KV cache.

Why this kernel exists: a per-layer kernel (like the upstream
jax.experimental ragged-paged-attention) takes one layer's pages
(n_pages, page_size, CKV, D). Calling it from inside the layer scan as
``cache[layer_id, 0]`` with a traced layer index makes XLA materialize a
layer slice (~cache_bytes / n_layers) per scan step as the kernel operand —
at multi-GB pools that slice traffic dominates the decode step
(PERF_NOTES.md round 1: ~3.2 ms per GB of pool per step). This kernel
instead takes the WHOLE cache ``(L, 1, NB, BS, CKV, D)`` in ANY/HBM memory
space plus a LAYER SCALAR (scalar-prefetched), and DMAs exactly the pages
each sequence references — per-step HBM traffic is O(tokens attended),
independent of pool size.

Functional scope matches the reference's paged attention chain
(reference: hydrainfer/layer/causal_attention.py:225-392 and the vendored
FA2 at csrc/kernel/flash_attn/flash_api.cpp:217): mixed prefill+decode
ragged batches, GQA, causal masking, int8 KV with static scales.

Layout contract (shared with ops/cache_ops.py — zero copy):
  cache[l, 0, page, slot_in_page, 2*kv_head + (0=K | 1=V), :]
i.e. K at even combined-head indices, V at odd.

Structure: flash attention with online softmax over double-buffered page
DMAs. The grid walks q blocks; within a q block a while-loop walks the
overlapping sequences and each sequence's kv blocks, prefetching the next
kv block's pages while computing the current one. The (seq, buf) walk state
crosses grid steps through an SMEM scalar ref. This shape — q-block grid ×
seq/kv-block while-walk, strided K/V extraction from the combined-head
page buffer, masked l/m/acc stores — follows the publicly documented TPU
ragged-attention recipe; the layer-indexed full-cache operand is the part
the upstream kernel cannot do.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _packing(dtype) -> int:
    return 32 // (jnp.dtype(dtype).itemsize * 8)


class _PageCopies:
    """Async copies of one kv block's pages: cache[layer, 0, page] → buf.

    The MLA latent cache arrives SQUEEZED to (L, NB, BS, D) — slicing its
    size-1 plane axis would violate Mosaic's sublane tiling (bf16 tiles the
    second-minor axis by 2, and a 1-wide slice of a tiled axis cannot
    lower) — so the 4-D form slices (BS, D) pages directly."""

    def __init__(self, cache_ref, buf, sem, page_indices_ref, layer,
                 seq_idx, start_page, end_page):
        self._buf = buf
        self._copies = []
        latent = len(cache_ref.shape) == 4
        for i in range(buf.shape[0]):
            page_idx = start_page + i
            page_idx = lax.select(page_idx < end_page, page_idx, 0)
            page = page_indices_ref[seq_idx, page_idx]
            src = (cache_ref.at[layer, page] if latent
                   else cache_ref.at[layer, 0, page])
            self._copies.append(pltpu.make_async_copy(src, buf.at[i], sem))

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()
        return self._buf


def _split_kv(kv_flat, ckv: int, plain_loads: bool):
    """(N*CKV, D) combined-head rows → ([K_h], [V_h]) per kv head, each
    (N, D). Strided slices with static start/stride.

    ckv == 1 is the MLA single-plane latent cache: every row is the
    [c_kv | k_pe] vector, which serves as BOTH K and V (the v:=k trick —
    models/decoder.py:_mla_layer slices the output's first kv_lora dims) —
    no striding, no extraction.

    On real TPU hardware Mosaic cannot lower arbitrary strided loads for
    sub-32-bit types, so packed dtypes go through a uint32 bitcast and
    shift/mask extraction (bf16: shift halves; int8: byte lanes). In
    interpret mode (CPU tests) plain strided slicing is exact for every
    dtype."""
    if ckv == 1:
        lat = kv_flat[...]      # load the whole plane once; K and V share it
        return [lat], [lat]
    n_kv_heads = ckv // 2
    if plain_loads or _packing(kv_flat.dtype) == 1:
        ks = [kv_flat[2 * h::ckv, :] for h in range(n_kv_heads)]
        vs = [kv_flat[2 * h + 1::ckv, :] for h in range(n_kv_heads)]
        return ks, vs
    pack = _packing(kv_flat.dtype)
    assert ckv % pack == 0, f"combined heads {ckv} not packable by {pack}"
    b_ref = kv_flat.bitcast(jnp.uint32) if hasattr(kv_flat, "bitcast") else None
    ks, vs = [], []
    if kv_flat.dtype == jnp.bfloat16:
        # one uint32 = [K_h | V_h] for one head: extract via shifts
        for h in range(n_kv_heads):
            b = b_ref[(2 * h) // pack::ckv // pack, :]
            k = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
            v = pltpu.bitcast(b & jnp.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)
            ks.append(k)
            vs.append(v)
        return ks, vs
    if jnp.dtype(kv_flat.dtype).itemsize == 1:  # int8 / fp8: 4 rows per word
        assert ckv % 4 == 0 or ckv == 2, f"int8 CKV={ckv}"
        step = max(ckv // pack, 1)
        for h in range(n_kv_heads):
            word = (2 * h) // pack
            lane_k = (2 * h) % pack
            b = b_ref[word::step, :]
            bits = 8
            k = pltpu.bitcast((b >> (lane_k * bits)).astype(jnp.uint8), kv_flat.dtype)
            v = pltpu.bitcast((b >> ((lane_k + 1) * bits)).astype(jnp.uint8), kv_flat.dtype)
            ks.append(k)
            vs.append(v)
        return ks, vs
    raise NotImplementedError(f"kv dtype {kv_flat.dtype}")


def _paged_attention_kernel(
    # scalar prefetch
    layer_ref,         # i32[1]
    kv_lens_ref,       # i32[S]
    page_indices_ref,  # i32[S, pages_per_seq]
    cu_q_lens_ref,     # i32[S+1]
    seq_buf_ref,       # i32[2] — (seq_idx, buf_idx) walk state across q blocks
    num_seqs_ref,      # i32[1]
    # inputs
    q_ref,             # (nq, Hq, D) VMEM
    cache_ref,         # (L, 1, NB, BS, CKV, D) ANY
    # outputs
    o_ref,             # (nq, Hq, D) VMEM
    # scratch
    kv_bufs,           # (2, PP, BS, CKV, D) VMEM
    sems,              # DMA (2,)
    l_ref, m_ref,      # (KVH, nq*ratio, 128) f32
    acc_ref,           # (nq, Hq, D) f32
    *,
    sm_scale: float,
    k_scale, v_scale,
    plain_loads: bool,
):
    nq, n_q_heads, head_dim = q_ref.shape
    if len(kv_bufs.shape) == 4:      # MLA latent: (2, PP, BS, D), plane axis
        _, pp, page_size = kv_bufs.shape[:3]   # squeezed away (see _PageCopies)
        ckv = 1
    else:
        _, pp, page_size, ckv, _ = kv_bufs.shape
    n_kv_heads = max(ckv // 2, 1)   # ckv==1: MLA single-plane (MQA, v:=k)
    ratio = n_q_heads // n_kv_heads
    kv_per_blk = pp * page_size
    pages_per_seq = page_indices_ref.shape[1]

    layer = layer_ref[0]
    num_seqs = num_seqs_ref[0]
    q_blk_idx = pl.program_id(0)
    q_len_start = q_blk_idx * nq
    q_len_end = q_len_start + nq
    init_seq = seq_buf_ref[0]
    init_buf = seq_buf_ref[1]

    def copies_for(seq_idx, kv_blk_idx, buf_idx):
        start_page = kv_blk_idx * pp
        end_page = jnp.minimum(pages_per_seq,
                               pl.cdiv(kv_lens_ref[seq_idx], page_size))
        return _PageCopies(cache_ref, kv_bufs.at[buf_idx], sems.at[buf_idx],
                           page_indices_ref, layer, seq_idx, start_page,
                           end_page)

    @pl.when(q_blk_idx == 0)
    def _prefetch_first():
        copies_for(init_seq, 0, init_buf).start()

    # rows of this q block not covered by any sequence (batch tail padding)
    # must still produce finite output — zero the fresh accumulator
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def masked_store(ref, val, start, end, group=1):
        iota = lax.broadcasted_iota(jnp.int32, ref.shape, 0) // group
        pltpu.store(ref, val, mask=(iota >= start) & (iota < end))

    def q_blk_live(state):
        done, seq_idx, _ = state
        more = (q_len_start < cu_q_lens_ref[num_seqs]) & (seq_idx < num_seqs)
        return (done == 0) & more

    def process_seq(state):
        done, seq_idx, buf_idx = state
        q_start = cu_q_lens_ref[seq_idx]
        q_end = cu_q_lens_ref[seq_idx + 1]
        q_len = q_end - q_start
        kv_len = kv_lens_ref[seq_idx]
        store_start = jnp.maximum(q_start - q_len_start, 0)
        store_end = jnp.minimum(q_end - q_len_start, nq)

        def next_ids(kv_blk_idx, buf_idx):
            last_kv = (kv_blk_idx + 1) * kv_per_blk >= kv_len
            seq_done_here = q_end <= q_len_end
            nxt_kv = lax.select(last_kv, 0, kv_blk_idx + 1)
            nxt_seq = lax.select(last_kv & seq_done_here, seq_idx + 1, seq_idx)
            wrap = nxt_seq == num_seqs
            return lax.select(wrap, 0, nxt_seq), nxt_kv, lax.select(buf_idx == 0, 1, 0), wrap

        def flash(q, k, v, h_l, h_m, h_acc, kv_blk_idx):
            # q: (nq*ratio, D); k/v: (kv_per_blk, D)
            kv_start = kv_blk_idx * kv_per_blk
            kv_mask = lax.broadcasted_iota(jnp.int32, k.shape, 0) < kv_len - kv_start
            k = jnp.where(kv_mask, k.astype(jnp.float32), 0).astype(k.dtype)
            v = jnp.where(kv_mask, v.astype(jnp.float32), 0).astype(v.dtype)

            qk = jnp.einsum("nd,md->nm", q, k,
                            preferred_element_type=jnp.float32) * sm_scale
            # causal over absolute positions: token row r (grouped by ratio)
            # has absolute kv position (kv_len - q_len) + its q offset
            row = ((kv_len - q_len) + q_len_start - q_start
                   + lax.broadcasted_iota(jnp.int32, qk.shape, 0) // ratio)
            col = kv_start + lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            qk += jnp.where(row < col, MASK_VALUE, 0.0)

            m_curr = jnp.max(qk, axis=1, keepdims=True)
            s_curr = jnp.exp(qk - m_curr)
            pv = jnp.dot(s_curr, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
            lm_shape = h_m.shape  # (nq*ratio, 128)
            m_curr = jnp.broadcast_to(m_curr, lm_shape)
            l_curr = jnp.broadcast_to(s_curr.sum(axis=1, keepdims=True), lm_shape)

            first = kv_blk_idx == 0
            m_prev = jnp.where(first, jnp.full_like(h_m, -jnp.inf), h_m[...])
            l_prev = jnp.where(first, jnp.zeros_like(h_l), h_l[...])
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_curr - m_next)
            l_next = alpha * l_prev + beta * l_curr
            l_safe = jnp.where(l_next == 0.0, 1.0, l_next)
            masked_store(h_m, m_next, store_start, store_end, ratio)
            masked_store(h_l, l_safe, store_start, store_end, ratio)

            acc_prev = jnp.where(first, jnp.zeros_like(h_acc), h_acc[...])
            acc_prev = acc_prev.reshape(-1, head_dim)
            tile = lambda a: jnp.concatenate(
                [a[:, :1]] * head_dim, axis=1) if a.shape[1] != head_dim else a
            out = (tile(alpha * l_prev / l_safe) * acc_prev
                   + tile(beta / l_safe) * pv)
            masked_store(h_acc, out.reshape(h_acc.shape), store_start, store_end)

        def kv_blk_live(st):
            kv_blk_idx, _ = st
            return kv_blk_idx * kv_per_blk < kv_len

        def process_kv_blk(st):
            kv_blk_idx, buf_idx = st
            nxt_seq, nxt_kv, nxt_buf, wrap = next_ids(kv_blk_idx, buf_idx)

            @pl.when(~wrap | (q_blk_idx + 1 < pl.num_programs(0)))
            def _prefetch_next():
                copies_for(nxt_seq, nxt_kv, nxt_buf).start()

            buf = copies_for(seq_idx, kv_blk_idx, buf_idx).wait()
            kv_flat = buf.reshape(kv_per_blk * ckv, head_dim)
            ks, vs = _split_kv(kv_flat, ckv, plain_loads)
            for h in range(n_kv_heads):
                k, v = ks[h], vs[h]
                if k_scale is not None:
                    k = (k.astype(jnp.float32) * k_scale).astype(q_ref.dtype)
                if v_scale is not None:
                    v = (v.astype(jnp.float32) * v_scale).astype(q_ref.dtype)
                q = q_ref[:, h * ratio:(h + 1) * ratio, :].astype(
                    jnp.float32).reshape(nq * ratio, head_dim)
                flash(q, k, v,
                      h_l=l_ref.at[h], h_m=m_ref.at[h],
                      h_acc=acc_ref.at[:, h * ratio:(h + 1) * ratio, :],
                      kv_blk_idx=kv_blk_idx)
            return kv_blk_idx + 1, nxt_buf

        _, buf_idx = lax.while_loop(kv_blk_live, process_kv_blk, (0, buf_idx))
        nxt_seq = lax.select(q_end <= q_len_end, seq_idx + 1, seq_idx)
        done = lax.select(q_end < q_len_end, done, 1)
        return done, nxt_seq, buf_idx

    _, seq_idx, buf_idx = lax.while_loop(
        q_blk_live, process_seq, (0, init_seq, init_buf))
    seq_buf_ref[0] = lax.select(seq_idx < num_seqs, seq_idx, 0)
    seq_buf_ref[1] = buf_idx
    o_ref[...] = acc_ref[...].astype(q_ref.dtype)


def _default_block_sizes(page_size, pages_per_seq, n_tokens, ratio=1):
    # target ~256 kv tokens per DMA'd block, ~<=64 q rows per grid step —
    # where a q row fans out to `ratio` flash rows (GQA group / MQA heads),
    # so high-ratio caches (MLA: ratio == n_q_heads) cap nq lower to keep
    # the (nq*ratio, D) f32 flash intermediates inside scoped VMEM
    pp = max(1, min(pages_per_seq, pl.cdiv(256, page_size)))
    nq = min(max(n_tokens, 8), max(8, 256 // max(ratio, 1)), 64)
    return pp, nq


def _kernel_dropping_cache_out(*args, **kwargs):
    """Adapter when the cache is passed through as an aliased output: drop
    the (never-written) cache_out ref at position 9 (6 scalars + q + cache +
    o) before calling the real kernel body."""
    args = list(args)
    del args[9]
    return _paged_attention_kernel(*args, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=["sm_scale", "k_scale", "v_scale",
                     "num_kv_pages_per_block", "num_queries_per_block",
                     "vmem_limit_bytes", "interpret", "return_cache"])
def layered_paged_attention(
    q: jax.Array,             # (T, Hq, D)
    cache: jax.Array,         # (L, 1, NB, BS, CKV, D), K even / V odd heads
    layer_id: jax.Array,      # i32[1]
    kv_lens: jax.Array,       # i32[S]
    page_indices: jax.Array,  # i32[S, pages_per_seq]
    cu_q_lens: jax.Array,     # i32[S+1]
    num_seqs: jax.Array,      # i32[1]
    *,
    sm_scale: float = 1.0,
    k_scale=None,
    v_scale=None,
    num_kv_pages_per_block=None,
    num_queries_per_block=None,
    vmem_limit_bytes=None,
    interpret: bool = False,
    return_cache: bool = False,
):
    """Ragged paged attention reading pages straight from the multi-layer
    cache at a runtime layer index. Mixed prefill+decode. Returns (T, Hq, D),
    or (out, cache) with the cache ALIASED in/out when return_cache=True —
    threading the aliased cache through the layer scan pins the buffer in
    place (XLA otherwise ping-pongs the multi-GB carry: a whole-cache copy
    per step, measured ~14ms at a 3.7GB pool).
    """
    n_tokens, n_q_heads, head_dim = q.shape
    n_layers, n_tensors, nb, page_size, ckv, hd = cache.shape
    # ckv even: interleaved K/V combined heads. ckv == 1: the MLA
    # single-plane latent cache (one [c_kv|k_pe] vector per token serving
    # as both K and V)
    assert n_tensors == 1 and hd == head_dim and (ckv % 2 == 0 or ckv == 1)
    n_kv_heads = max(ckv // 2, 1)
    assert n_q_heads % n_kv_heads == 0
    s, pages_per_seq = page_indices.shape
    assert kv_lens.shape == (s,) and cu_q_lens.shape == (s + 1,)

    if ckv == 1:
        # MLA latent: squeeze the tensor + plane axes so the page DMA never
        # slices a size-1 tiled axis (Mosaic sublane tiling, see _PageCopies)
        assert not return_cache, "latent path does not alias the cache"
        cache = cache.reshape(n_layers, nb, page_size, hd)

    pp, nq = _default_block_sizes(page_size, pages_per_seq, n_tokens,
                                  ratio=n_q_heads // n_kv_heads)
    if num_kv_pages_per_block is not None:
        pp = num_kv_pages_per_block
    if num_queries_per_block is not None:
        nq = num_queries_per_block
    num_q_blks = pl.cdiv(n_tokens, nq)

    ratio = n_q_heads // n_kv_heads
    o_spec = pl.BlockSpec((nq, n_q_heads, head_dim), lambda i, *_: (i, 0, 0))
    if return_cache:
        # cache passed through as an ALIASED output (input 7 = cache, after
        # 6 scalar-prefetch operands + q) so the scan carry stays in place
        body_fn, out_specs, alias = _kernel_dropping_cache_out, [
            o_spec, pl.BlockSpec(memory_space=pl.ANY)], {7: 1}
        out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype),
                     jax.ShapeDtypeStruct(cache.shape, cache.dtype)]
    else:
        body_fn, out_specs, alias = _paged_attention_kernel, o_spec, {}
        out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    body = functools.partial(
        body_fn, sm_scale=sm_scale, k_scale=k_scale, v_scale=v_scale,
        plain_loads=bool(interpret))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_q_blks,),
        in_specs=[
            pl.BlockSpec((nq, n_q_heads, head_dim), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, pp, page_size, head_dim) if ckv == 1
                       else (2, pp, page_size, ckv, head_dim), cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((n_kv_heads, nq * ratio, 128), jnp.float32),
            pltpu.VMEM((n_kv_heads, nq * ratio, 128), jnp.float32),
            pltpu.VMEM((nq, n_q_heads, head_dim), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
        name="layered_paged_attention",
    )
    return kernel(
        layer_id.astype(jnp.int32).reshape(1),
        kv_lens, page_indices, cu_q_lens,
        jnp.zeros((2,), jnp.int32), num_seqs,
        q, cache)
