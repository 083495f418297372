"""Decode-specialized paged attention (MHA and GQA).

Why this kernel exists: the upstream ragged kernel walks, per sequence, an
UNROLLED loop over kv heads — each iteration a strided per-head extraction
plus a (nq, kv) flash tile of which a decode step uses ONE row. At GQA
shapes (few kv heads, ratio >> 1) that loop is short and the q tile dense,
so the kernel is near-free; at MHA (32 kv heads, ratio 1 — the LLaVA-7B /
vicuna shape) the measured cost is ~8 ms/step at b32 where the ideal KV
read is 1.9 ms (PERF_NOTES round 4): fixed per-(seq, head) work dominates.

This kernel flips the layout: one query TOKEN per sequence (the decode
contract) means each sequence's queries form a dense (Hq, D) tile. Pages
are DMA'd ONCE per sequence for ALL heads, K/V are extracted from the
interleaved combined-head pages in BULK (one byte-lane shift per packed
word, not per head), and scores/weighted-sum run vectorized over all Hq
heads:

    scores[n, j] = sum_d K[n, j // R, d] * q[j, d]   (N, Hq), R = Hq/Hkv
    out[j, d]    = sum_n softmax(scores)[n, j] * V[n, j // R, d]

GQA (R > 1) reuses the same diag-trick matmuls with the δ(h, h') selector
widened to the block-repeat mask δ(h, j // R): each kv row's score/PV
matmul column block covers its R query heads. At R == 1 the mask IS the
identity and the kernel is the original MHA form.

Head order: byte-lane extraction of int8/fp8 yields kv heads in the order
[0, 2, .., H-2, 1, 3, .., H-1] (K lives at even combined indices; words
pack 4 combined rows). Rather than reshuffle K/V inside the kernel, the
CALLER permutes q to match — q heads move in blocks of R with their kv
head (`decode_q_perm`) — and inverse-permutes the output; attention is
permutation-equivariant over heads.

Functional scope: the all-decode fused-window batches the engine spends
its life in (reference's decode path: hydrainfer/layer/causal_attention.py
+ csrc/kernel/flash_attn — per-architecture dispatch, which a TPU kernel
replaces with shape specialization). Mixed prefill batches stay on the
upstream ragged kernel.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _packing(dtype) -> int:
    return 32 // (jnp.dtype(dtype).itemsize * 8)


def decode_head_perm(n_kv_heads: int, kv_dtype) -> np.ndarray | None:
    """Head permutation the kernel's bulk extraction produces; the caller
    permutes q by this and inverse-permutes the output. None = identity."""
    if _packing(jnp.dtype(kv_dtype)) == 4:      # int8 / fp8: byte lanes
        if n_kv_heads % 2:
            return None                          # handled by fallback gate
        return np.concatenate([np.arange(0, n_kv_heads, 2),
                               np.arange(1, n_kv_heads, 2)])
    return None                                  # bf16 / f32: in order


def decode_q_perm(n_q_heads: int, n_kv_heads: int, kv_dtype
                  ) -> np.ndarray | None:
    """Query-head permutation matching `decode_head_perm`: q heads move in
    blocks of R = Hq/Hkv with their kv head. None = identity."""
    kvp = decode_head_perm(n_kv_heads, kv_dtype)
    if kvp is None:
        return None
    r = n_q_heads // n_kv_heads
    return (kvp[:, None] * r + np.arange(r)[None, :]).reshape(-1)


def supports(n_q_heads, n_kv_heads, head_dim, kv_dtype) -> bool:
    """Static dispatch gate (the adapter also requires max_q == 1)."""
    if n_kv_heads <= 0 or n_q_heads % n_kv_heads:   # MHA or uniform GQA
        return False
    if head_dim % 128:
        return False
    pack = _packing(jnp.dtype(kv_dtype))
    if pack == 4:
        # byte-lane extraction splits kv heads into even/odd groups —
        # needs an even count. Extraction reshapes (N*Hkv/2, D) bf16 →
        # (N, Hkv/2, D): verified on hardware for Hkv/2 ∈ {16, 20} —
        # non-sublane-aligned split factors lower correctly (numerics
        # exact vs the oracle) at reduced speed, still 2.4x the jnp-oracle
        # fallback at Hkv=40 where the upstream kernel REJECTS the shape
        # ("num_combined_kv_heads=80 can not be XLA fully tiled") — the
        # llava-NeXT-13B int8-KV case. GQA kv-head counts (2, 4, 8) are
        # covered by the same lowering; the auto dispatch path catches a
        # Mosaic rejection and falls back to the upstream kernel.
        return n_kv_heads % 2 == 0
    return True                       # bf16 word-split / f32 strided loads


def _extract_kv_groups(buf, n_tok, ckv, head_dim, plain_loads):
    """(PP, BS, CKV, D) page buffer ref → [(K_g, V_g)] per HEAD GROUP, each
    (n_tok, Hg, D) bfloat16 UNSCALED in the kernel's head order
    (decode_head_perm). int8/fp8 dequant scales are folded elsewhere
    (k_scale into the pre-scaled q, v_scale into the final normalize) so
    the extraction is a bare cast — no per-element scale multiplies.
    Groups stay separate — concatenating (n_tok, H, D) K/V tiles costs ~1MB
    of VMEM relayout copies per kv block; per-group flash only touches the
    tiny (n_tok, Hg) score tiles."""
    n_kv_heads = ckv // 2
    if plain_loads:
        # interpret mode / f32: plain strided slices are exact. Emulate the
        # packed head order so the caller-side permutation stays uniform.
        kv = buf[...].reshape(n_tok, ckv, head_dim)
        kv = kv.astype(jnp.float32 if kv.dtype == jnp.float32
                       else jnp.bfloat16)
        k = kv[:, 0::2, :]
        v = kv[:, 1::2, :]
        if decode_head_perm(n_kv_heads, buf.dtype) is not None:
            # packed byte-lane head order: [evens] + [odds], as two groups
            return [(k[:, 0::2, :], v[:, 0::2, :]),
                    (k[:, 1::2, :], v[:, 1::2, :])]
        return [(k, v)]
    flat = buf.reshape(n_tok * ckv, head_dim)
    pack = _packing(flat.dtype)
    words = flat.bitcast(jnp.uint32)[...]    # (n_tok*ckv/pack, D)
    if pack == 2:        # bf16: word = [K_h | V_h], heads in order
        k = pltpu.bitcast(words << 16, jnp.float32).astype(jnp.bfloat16)
        v = pltpu.bitcast(words & jnp.uint32(0xFFFF0000),
                          jnp.float32).astype(jnp.bfloat16)
        return [(k.reshape(n_tok, n_kv_heads, head_dim),
                 v.reshape(n_tok, n_kv_heads, head_dim))]
    if pack == 4:        # int8/fp8: bytes {0,2}=K, {1,3}=V
        def byte(i):
            b = pltpu.bitcast((words >> (8 * i)).astype(jnp.uint8),
                              flat.dtype)
            return b.astype(jnp.bfloat16).reshape(n_tok, ckv // 4, head_dim)
        return [(byte(0), byte(1)), (byte(2), byte(3))]
    raise NotImplementedError(f"kv dtype {flat.dtype}")


def _mha_decode_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[S]
    page_indices_ref,  # i32[S, pages_per_seq]
    num_seqs_ref,      # i32[1]
    # inputs
    q_ref,             # (T, H, D) VMEM — row i is sequence i's query
    pages_ref,         # (NB, BS, CKV, D) ANY
    # outputs
    o_ref,             # (T, H, D) VMEM
    # scratch
    kv_bufs,           # (2, PP, BS, CKV, D) VMEM
    sems,              # DMA (2,)
    *,
    sm_scale: float,
    k_scale, v_scale,
    plain_loads: bool,
    bisect: str = "",
):
    T, n_heads, head_dim = q_ref.shape
    _, pp, page_size, ckv, _ = kv_bufs.shape
    kv_per_blk = pp * page_size
    pages_per_seq = page_indices_ref.shape[1]
    num_seqs = num_seqs_ref[0]
    # compute dtype of the extracted K/V tiles (f32 only in plain-f32
    # interpret mode); MXU operands must match it
    cd = (jnp.float32 if plain_loads and kv_bufs.dtype == jnp.float32
          else jnp.bfloat16)
    n_kv_heads = ckv // 2
    ratio = n_heads // n_kv_heads                # GQA group size R (1 = MHA)
    n_groups = 2 if decode_head_perm(n_kv_heads, kv_bufs.dtype) is not None \
        else 1
    hg_kv = n_kv_heads // n_groups               # kv heads per group
    hq_g = hg_kv * ratio                         # q heads per group
    # δ(h, j // R) selector for the diag-extract / p-expand matmul tricks
    # (identity when R == 1 — the original MHA diag trick)
    sel = (lax.broadcasted_iota(jnp.int32, (hg_kv, hq_g), 0)
           == lax.broadcasted_iota(jnp.int32, (hg_kv, hq_g), 1) // ratio
           ).astype(jnp.float32)

    def copies_for(seq_idx, kv_blk_idx, buf_idx):
        copies = []
        end_page = jnp.minimum(pages_per_seq,
                               pl.cdiv(kv_lens_ref[seq_idx], page_size))
        for i in range(pp):
            page_idx = kv_blk_idx * pp + i
            page_idx = lax.select(page_idx < end_page, page_idx, 0)
            page = page_indices_ref[seq_idx, page_idx]
            copies.append(pltpu.make_async_copy(
                pages_ref.at[page], kv_bufs.at[buf_idx, i],
                sems.at[buf_idx]))
        return copies

    o_ref[...] = jnp.zeros_like(o_ref)   # padding rows must stay finite

    @pl.when(num_seqs > 0)
    def _prefetch_first():
        for c in copies_for(0, 0, 0):
            c.start()

    def next_ids(seq_idx, kv_blk_idx):
        last = (kv_blk_idx + 1) * kv_per_blk >= kv_lens_ref[seq_idx]
        return (lax.select(last, seq_idx + 1, seq_idx),
                lax.select(last, 0, kv_blk_idx + 1))

    def seq_live(state):
        seq_idx = state[0]
        return seq_idx < num_seqs

    def process_seq(state):
        seq_idx, buf_idx = state
        kv_len = kv_lens_ref[seq_idx]
        # sm_scale AND k_scale fold into q (K stays a bare dequant cast)
        qf = (q_ref[pl.ds(seq_idx, 1)].astype(jnp.float32)
              .reshape(n_heads, head_dim)
              * (sm_scale * (k_scale if k_scale is not None else 1.0))
              ).astype(cd)

        def blk_live(st):
            kv_blk_idx = st[0]
            return kv_blk_idx * kv_per_blk < kv_len

        def process_blk(st):
            kv_blk_idx, buf_idx, m_prev, l_prev, acc = st
            nxt_seq, nxt_blk = next_ids(seq_idx, kv_blk_idx)
            nxt_buf = lax.select(buf_idx == 0, 1, 0)

            @pl.when(nxt_seq < num_seqs)
            def _prefetch_next():
                for c in copies_for(nxt_seq, nxt_blk, nxt_buf):
                    c.start()

            for c in copies_for(seq_idx, kv_blk_idx, buf_idx):
                c.wait()
            if bisect == "dma":
                # consume one element so the DMAs aren't dead-code-eliminated
                probe = kv_bufs[buf_idx, 0, 0, 0, 0].astype(jnp.float32)
                return (kv_blk_idx + 1, nxt_buf, m_prev + probe,
                        l_prev, acc)
            groups = _extract_kv_groups(kv_bufs.at[buf_idx], kv_per_blk,
                                        ckv, head_dim, plain_loads)
            assert len(groups) == n_groups
            if bisect == "extract":
                # consume K/V cheaply: running sums, no flash math
                m_d = sum(jnp.sum(k, axis=0) + jnp.sum(v, axis=0)
                          for k, v in groups).astype(jnp.float32)
                return (kv_blk_idx + 1, nxt_buf, m_prev,
                        l_prev, acc + jnp.concatenate(
                            [m_d] * (len(groups) * ratio), axis=0))

            # scores on the MXU via the diag trick: K2 (N·Hg, D) @ q_g
            # contracts d for EVERY (token-head, q-head) pair; row n·Hg+h
            # only needs the R columns of kv head h's query group,
            # extracted with the δ-mask (a VPU lane-reduce over d here
            # instead costs ~17 µs/block — the dominant term of the first
            # kernel revision, PERF_NOTES r4)
            N = kv_per_blk
            s_parts = []
            for g, (k, _) in enumerate(groups):
                q_g = lax.slice_in_dim(qf, g * hq_g, (g + 1) * hq_g, axis=0)
                sg_all = lax.dot_general(
                    k.reshape(N * hg_kv, head_dim), q_g,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (N·Hg, Hq_g)
                s_parts.append((sg_all.reshape(N, hg_kv, hq_g)
                                * sel[None]).sum(1))          # (N, Hq_g)
            s = jnp.concatenate(s_parts, axis=1) if n_groups > 1 \
                else s_parts[0]                               # (N, H)
            n_live = kv_len - kv_blk_idx * kv_per_blk
            row = lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(row < n_live, s, MASK_VALUE)

            m_curr = jnp.max(s, axis=0, keepdims=True)        # (1, H)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)                  # (1, H)
            p = jnp.exp(s - m_next)                           # (N, H)
            l_next = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
            # p·V on the MXU: expand p with the δ-mask so row (n, h') of
            # P_sel carries p[n, h]·δ(h', h), then contract the (n, h')
            # axis against V2 (N·Hg, D) in one matmul per group
            pv_parts = []
            for g, (_, v) in enumerate(groups):
                p_g = lax.slice_in_dim(p, g * hq_g, (g + 1) * hq_g, axis=1)
                p_sel = (jnp.expand_dims(p_g, 1)
                         * sel[None]).astype(cd)              # (N, Hg, Hq_g)
                pv_parts.append(lax.dot_general(
                    p_sel.reshape(N * hg_kv, hq_g),
                    v.reshape(N * hg_kv, head_dim),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))      # (Hq_g, D)
            pv = jnp.concatenate(pv_parts, axis=0) if n_groups > 1 \
                else pv_parts[0]                              # (H, D)
            acc = acc * alpha.reshape(n_heads, 1) + pv
            return kv_blk_idx + 1, nxt_buf, m_next, l_next, acc

        init = (0, buf_idx,
                jnp.full((1, n_heads), -jnp.inf, jnp.float32),
                jnp.zeros((1, n_heads), jnp.float32),
                jnp.zeros((n_heads, head_dim), jnp.float32))
        _, buf_idx, _, l_fin, acc = lax.while_loop(blk_live, process_blk,
                                                   init)
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        out = acc / l_safe.reshape(n_heads, 1)
        if v_scale is not None:       # V stays a bare dequant cast too
            out = out * v_scale
        o_ref[pl.ds(seq_idx, 1)] = out[None].astype(o_ref.dtype)
        return seq_idx + 1, buf_idx

    lax.while_loop(seq_live, process_seq, (0, 0))


@functools.partial(
    jax.jit,
    static_argnames=["sm_scale", "k_scale", "v_scale",
                     "num_kv_pages_per_block", "vmem_limit_bytes",
                     "interpret", "bisect"])
def mha_decode_attention(
    q: jax.Array,             # (T, H, D) — row i = seq i, heads PERMUTED
    kv_pages: jax.Array,      # (NB, BS, CKV, D), K even / V odd heads
    kv_lens: jax.Array,       # i32[S]
    page_indices: jax.Array,  # i32[S, pages_per_seq]
    num_seqs: jax.Array,      # i32[1]
    *,
    sm_scale: float = 1.0,
    k_scale=None,
    v_scale=None,
    num_kv_pages_per_block=None,
    vmem_limit_bytes=None,
    interpret: bool = False,
    bisect: str = "",
):
    T, n_heads, head_dim = q.shape
    nb, page_size, ckv, hd = kv_pages.shape
    assert hd == head_dim and ckv % 2 == 0 and n_heads % (ckv // 2) == 0
    s, pages_per_seq = page_indices.shape
    assert kv_lens.shape == (s,)

    # ~128 kv tokens per DMA block (measured best at the 7b shape): enough
    # to amortize copies and per-block loop overhead, small enough that
    # end-of-context padding pages stay cheap
    pp = num_kv_pages_per_block or max(1, min(pages_per_seq,
                                              pl.cdiv(128, page_size)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, n_heads, head_dim), lambda *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, n_heads, head_dim), lambda *_: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, pp, page_size, ckv, head_dim), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = pl.pallas_call(
        functools.partial(_mha_decode_kernel, sm_scale=sm_scale,
                          k_scale=k_scale, v_scale=v_scale,
                          plain_loads=bool(interpret), bisect=bisect),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_limit_bytes),
        interpret=interpret,
        name="mha_decode_attention",
    )
    return kernel(kv_lens, page_indices, num_seqs, q, kv_pages)
