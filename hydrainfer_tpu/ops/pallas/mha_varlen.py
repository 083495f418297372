"""Segment-masked flash attention for ViT towers (varlen over concatenated
image patches).

TPU replacement for the reference's varlen flash_attn chain on the vision
towers (reference: hydrainfer/layer/multihead_attention.py:170-281 —
flash_attn_varlen_func over cu_seqlens). The dense jnp twin
(ops/attention.py:mha_varlen) is O(T²) in HBM traffic because the full
(H, T, T) score tensor is materialized; at InternVL/Qwen2-VL anyres patch
counts (T up to 16384) that is gigabytes per layer. This kernel streams
K/V blocks through VMEM with an online softmax: O(T²) FLOPs (inherent) but
O(T) HBM traffic, and the segment mask (patch i attends patch j iff they
belong to the same image) is computed from two int32 block slices instead
of a (T, T) boolean.

Grid: (heads, q blocks, kv blocks), kv innermost; the l/m/acc scratch
carries the online softmax across kv blocks of one (head, q block).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _mha_varlen_kernel(q_ref,      # (1, bq, D) VMEM
                       k_ref,      # (1, bk, D)
                       v_ref,      # (1, bk, D)
                       qid_ref,    # (bq, 1) int32 segment id per q row
                       kid_ref,    # (bk, 1) int32 segment id per kv row
                       qpos_ref,   # (bq, 1) int32 position per q row
                       kpos_ref,   # (bk, 1) int32 position per kv row
                       o_ref,      # (1, bq, D)
                       m_ref,      # (bq, 128) f32 scratch
                       l_ref,      # (bq, 128) f32
                       acc_ref,    # (bq, D) f32
                       *, sm_scale: float, n_tokens: int):
    kv_blk = pl.program_id(2)
    n_kv_blks = pl.num_programs(2)
    bq, bk = qid_ref.shape[0], kid_ref.shape[0]

    q = q_ref[0].astype(jnp.float32) * sm_scale           # (bq, D)
    k = k_ref[0].astype(jnp.float32)                       # (bk, D)
    v = v_ref[0].astype(jnp.float32)                       # (bk, D)
    # zero the block-tail rows past T: OOB reads are undefined (NaN in
    # interpret mode) and would poison the pv dot even with s masked to 0
    kv_valid = (kv_blk * bk
                + lax.broadcasted_iota(jnp.int32, (bk, 1), 0)) < n_tokens
    k = jnp.where(kv_valid, k, 0.0)
    v = jnp.where(kv_valid, v, 0.0)
    qk = jnp.dot(q, k.T, preferred_element_type=jnp.float32)

    qid = qid_ref[...]                                     # (bq, 1)
    kid = kid_ref[...]                                     # (bk, 1)
    # block-tail rows past T read undefined ids that could alias a real
    # image id — mask them by absolute position, not just by id sign
    col_pos = kv_blk * bk + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    same = (qid == kid.T) & (qid >= 0) & (col_pos < n_tokens)  # (bq, bk)
    # causal leg (prefill over gathered pages): kv position visible iff
    # <= the q row's absolute position. Bidirectional callers (ViT) pass
    # all-zero positions, making this a no-op (0 <= 0).
    same &= kpos_ref[...].T <= qpos_ref[...]
    qk = jnp.where(same, qk, MASK_VALUE)

    m_curr = jnp.max(qk, axis=1, keepdims=True)            # (bq, 1)
    first = kv_blk == 0
    m_prev = jnp.where(first, jnp.full_like(m_ref, -jnp.inf), m_ref[...])
    m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_ref.shape))
    m_ref[...] = m_next

    s = jnp.exp(qk - m_next[:, :1])
    s = jnp.where(same, s, 0.0)                            # kill masked cols
    l_curr = jnp.broadcast_to(s.sum(axis=1, keepdims=True), l_ref.shape)
    alpha = jnp.exp(m_prev - m_next)
    l_prev = jnp.where(first, jnp.zeros_like(l_ref), l_ref[...])
    l_ref[...] = alpha * l_prev + l_curr

    pv = jnp.dot(s, v, preferred_element_type=jnp.float32)  # (bq, D)
    acc_prev = jnp.where(first, jnp.zeros_like(acc_ref), acc_ref[...])
    acc_ref[...] = acc_prev * alpha[:, :1] + pv

    @pl.when(kv_blk == n_kv_blks - 1)
    def _store():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)               # fully-masked rows
        o_ref[0] = (acc_ref[...] / l_safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_q",
                                             "block_kv", "interpret"))
def mha_varlen_flash(q: jax.Array, k: jax.Array, v: jax.Array,
                     seq_ids: jax.Array, sm_scale: float,
                     block_q: int = 256, block_kv: int = 256,
                     interpret: bool = False,
                     kv_seq_ids: Optional[jax.Array] = None,
                     q_pos: Optional[jax.Array] = None,
                     kv_pos: Optional[jax.Array] = None) -> jax.Array:
    """q: (Tq, H, D); k/v: (Tk, H, D) — patches of all images concatenated
    (ViT form, Tk == Tq) or per-sequence gathered pages (causal prefill
    form). seq_ids: (Tq,) segment index per q row, -1 = padding;
    kv_seq_ids: (Tk,) segment per kv row (defaults to seq_ids). q_pos /
    kv_pos (optional): absolute positions — when given, kv rows are only
    visible at kv_pos <= q_pos (causal). Returns (Tq, H, D); padded rows
    are finite zeros."""
    Tq, H, D = q.shape
    Tk = k.shape[0]
    if kv_seq_ids is None:
        kv_seq_ids = seq_ids
    bq = min(block_q, max(Tq, 8))
    bk = min(block_kv, max(Tk, 8))
    grid = (H, pl.cdiv(Tq, bq), pl.cdiv(Tk, bk))

    # (H, T, D) layout so each grid step slices one head's (block, D) tile
    qt = q.transpose(1, 0, 2)
    kt = k.transpose(1, 0, 2)
    vt = v.transpose(1, 0, 2)
    qids = seq_ids.astype(jnp.int32).reshape(Tq, 1)
    kids = kv_seq_ids.astype(jnp.int32).reshape(Tk, 1)
    qp = (jnp.zeros((Tq, 1), jnp.int32) if q_pos is None
          else q_pos.astype(jnp.int32).reshape(Tq, 1))
    kp = (jnp.zeros((Tk, 1), jnp.int32) if kv_pos is None
          else kv_pos.astype(jnp.int32).reshape(Tk, 1))

    kernel = pl.pallas_call(
        functools.partial(_mha_varlen_kernel, sm_scale=sm_scale, n_tokens=Tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, D), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((bq, 1), lambda h, i, j: (i, 0)),
            pl.BlockSpec((bk, 1), lambda h, i, j: (j, 0)),
            pl.BlockSpec((bq, 1), lambda h, i, j: (i, 0)),
            pl.BlockSpec((bk, 1), lambda h, i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, Tq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
        name="mha_varlen_flash",
    )
    out = kernel(qt, kt, vt, qids, kids, qp, kp)
    return out.transpose(1, 0, 2)
