"""Ragged batch → padded static-shape LanguageModelBatch.

TPU-native replacement for the reference's LanguageModelParametersBuilder
(reference: hydrainfer/engine/parameters_builder.py:46-97, which assembles
flat varlen tensors + a flashinfer plan). Here every array is padded to a
shape bucket so each (token-bucket, seq-bucket, block-bucket, max-q-bucket)
combination compiles exactly once — the jit cache plays the role the CUDA
graph runner plays in the reference (reference:
hydrainfer/model_runner/cuda_graph_model_runner.py:29-73), but covers mixed
prefill+decode batches, not just all-decode ones.
"""
import bisect
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..memory import TokenCacheBlockManager
from ..models.factory import LanguageModelBatch, LanguageModelConfig
from ..ops.attention import PagedAttentionParams
from .isa import Fill, ImageEmbedFill
from .rcb import BatchRequest, RequestControlBlock

TOKEN_BUCKETS = [8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]
SEQ_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128, 256]


def bucket_of(n: int, buckets: List[int]) -> int:
    i = bisect.bisect_left(buckets, n)
    return buckets[i] if i < len(buckets) else _next_pow2(n)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclass
class FillBatchPlan:
    """Host-side companion of a packed fill batch: the single flat int32
    buffer, its static dims (the jit key), and which seq slot belongs to
    which request."""
    flat: np.ndarray
    dims: object                                  # models.factory.FillDims
    seq_rcbs: List[RequestControlBlock]           # per used seq slot
    seq_insts: List[Fill]
    n_tokens: int
    n_seqs: int

    @property
    def max_q(self) -> int:
        return self.dims.max_q


class LanguageModelBatchBuilder:
    def __init__(self, kv_cache_manager: TokenCacheBlockManager,
                 image_cache_manager: Optional[TokenCacheBlockManager],
                 language_config: LanguageModelConfig,
                 image_token_id: int):
        self.kv = kv_cache_manager
        self.image = image_cache_manager
        self.lcfg = language_config
        self.image_token_id = image_token_id

        self.token_ids: List[int] = []
        self.token_src_slots: List[int] = []
        self.positions: List[int] = []
        self.new_slots: List[int] = []
        self.q_seq_ids: List[int] = []
        self.q_local_ids: List[int] = []
        self.kv_lens: List[int] = []
        self.block_tables: List[np.ndarray] = []
        self.image_slot_ids: List[int] = []
        self.image_dst_idx: List[int] = []
        self.seq_rcbs: List[RequestControlBlock] = []
        self.seq_insts: List[Fill] = []

    def add(self, rcb: RequestControlBlock, inst: Fill) -> None:
        s = len(self.seq_rcbs)
        t0 = len(self.token_ids)
        n = len(inst.position_ids)

        if isinstance(inst, ImageEmbedFill) and inst.image_token_cache_ids:
            slots = self.image.v2p(rcb.virtual_image_cache,
                                   inst.image_token_cache_ids)
            self.image_slot_ids.extend(slots)
            self.image_dst_idx.extend(
                t0 + i for i, is_img in enumerate(inst.image_token_mask) if is_img)

        if n == 1 and inst.token_ids[0] < 0:
            # unresolved decode token: the device token table feeds it
            # (async decode — no host sync between producer and consumer)
            assert rcb.token_slot >= 0, "decode fill without a token slot"
            self.token_ids.append(0)
            self.token_src_slots.append(rcb.token_slot)
        else:
            self.token_ids.extend(inst.token_ids)
            self.token_src_slots.extend([-1] * n)
        self.positions.extend(inst.position_ids)
        self.new_slots.extend(self.kv.v2p(rcb.virtual_kv_cache, inst.cache_ids))
        self.q_seq_ids.extend([s] * n)
        self.q_local_ids.extend(range(n))
        self.kv_lens.append(inst.cache_ids[-1] + 1)
        self.block_tables.append(
            np.asarray(rcb.virtual_kv_cache.block_table, dtype=np.int32))
        self.seq_rcbs.append(rcb)
        self.seq_insts.append(inst)

    def add_batch(self, batch: BatchRequest) -> None:
        for rcb, inst in batch:
            if isinstance(inst, Fill):
                self.add(rcb, inst)

    def build(self) -> FillBatchPlan:
        from ..models.factory import FillDims, pack_fill_batch

        n_tokens = len(self.token_ids)
        n_seqs = len(self.seq_rcbs)
        T = bucket_of(n_tokens, TOKEN_BUCKETS)
        S = bucket_of(n_seqs, SEQ_BUCKETS)
        max_q = _next_pow2(max((len(i.token_ids) for i in self.seq_insts),
                               default=1))
        max_blocks = _next_pow2(max((len(bt) for bt in self.block_tables),
                                    default=1))
        n_img = len(self.image_slot_ids)
        Ti = bucket_of(n_img, TOKEN_BUCKETS) if n_img else 0
        dims = FillDims(T=T, S=S, MB=max_blocks, Ti=Ti, max_q=max_q)

        def pad_i32(vals, size, fill=0):
            a = np.full(size, fill, np.int32)
            a[:len(vals)] = vals
            return a

        tables = np.full((S, max_blocks), -1, np.int32)
        for i, bt in enumerate(self.block_tables):
            tables[i, :len(bt)] = bt

        # every used seq slot samples its chunk's last token; the executor
        # decides host-side which samples are consumable
        sample_idx = np.full(S, -1, np.int32)
        dst_slots = np.full(S, -1, np.int32)
        t = 0
        for i, inst in enumerate(self.seq_insts):
            t += len(inst.token_ids)
            sample_idx[i] = t - 1
            if inst.sample and inst.sample_dst is not None:
                dst_slots[i] = self.seq_rcbs[i].token_slot

        cu = np.zeros(S + 1, np.int32)
        acc = 0
        for i, inst in enumerate(self.seq_insts):
            acc += len(inst.token_ids)
            cu[i + 1] = acc
        cu[len(self.seq_insts) + 1:] = acc

        flat = pack_fill_batch(
            cu_q_lens=cu,
            num_seqs=np.asarray([n_seqs], np.int32),
            token_ids=pad_i32(self.token_ids, T),
            positions=pad_i32(self.positions, T),
            q_seq_ids=pad_i32(self.q_seq_ids, T, fill=-1),
            q_local_ids=pad_i32(self.q_local_ids, T),
            new_kv_slot_ids=pad_i32(self.new_slots, T, fill=-1),
            token_src_slots=pad_i32(self.token_src_slots, T, fill=-1),
            kv_lens=pad_i32(self.kv_lens, S),
            sample_token_idx=sample_idx,
            sample_dst_slots=dst_slots,
            block_tables=tables,
            image_slot_ids=pad_i32(self.image_slot_ids, Ti),
            image_dst_idx=pad_i32(self.image_dst_idx, Ti, fill=-1),
            dims=dims)
        return FillBatchPlan(flat=flat, dims=dims, seq_rcbs=self.seq_rcbs,
                             seq_insts=self.seq_insts, n_tokens=n_tokens,
                             n_seqs=n_seqs)
