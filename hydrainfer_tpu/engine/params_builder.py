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
    """Host-side companion of a LanguageModelBatch: which seq slot belongs to
    which request, and whether its sampled token is consumable."""
    batch: LanguageModelBatch
    max_q: int
    seq_rcbs: List[RequestControlBlock]          # per used seq slot
    seq_insts: List[Fill]
    n_tokens: int
    n_seqs: int


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
        n = len(inst.token_ids)

        if isinstance(inst, ImageEmbedFill) and inst.image_token_cache_ids:
            slots = self.image.v2p(rcb.virtual_image_cache,
                                   inst.image_token_cache_ids)
            self.image_slot_ids.extend(slots)
            self.image_dst_idx.extend(
                t0 + i for i, is_img in enumerate(inst.image_token_mask) if is_img)

        self.token_ids.extend(inst.token_ids)
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

    def build(self, image_cache_array=None) -> FillBatchPlan:
        n_tokens = len(self.token_ids)
        n_seqs = len(self.seq_rcbs)
        T = bucket_of(n_tokens, TOKEN_BUCKETS)
        S = bucket_of(n_seqs, SEQ_BUCKETS)
        max_q = _next_pow2(max((len(i.token_ids) for i in self.seq_insts),
                               default=1))
        max_blocks = _next_pow2(max((len(bt) for bt in self.block_tables),
                                    default=1))

        def pad_i32(vals, size, fill=0):
            a = np.full(size, fill, np.int32)
            a[:len(vals)] = vals
            return a

        tables = np.full((S, max_blocks), -1, np.int32)
        for i, bt in enumerate(self.block_tables):
            tables[i, :len(bt)] = bt

        attention = PagedAttentionParams(
            q_seq_ids=jnp.asarray(pad_i32(self.q_seq_ids, T, fill=-1)),
            q_local_ids=jnp.asarray(pad_i32(self.q_local_ids, T)),
            positions=jnp.asarray(pad_i32(self.positions, T)),
            kv_lens=jnp.asarray(pad_i32(self.kv_lens, S)),
            block_tables=jnp.asarray(tables),
            new_kv_slot_ids=jnp.asarray(pad_i32(self.new_slots, T, fill=-1)),
        )

        # vision features spliced into the embedding: gather from image cache
        n_img = len(self.image_slot_ids)
        hidden = self.lcfg.hidden_size
        if n_img:
            Ti = bucket_of(n_img, TOKEN_BUCKETS)
            slots = pad_i32(self.image_slot_ids, Ti)
            flat = image_cache_array[0, 0].reshape(-1, image_cache_array.shape[-2]
                                                   * image_cache_array.shape[-1])
            feats = jnp.take(flat, jnp.asarray(slots), axis=0)[:, :hidden]
            dst = jnp.asarray(pad_i32(self.image_dst_idx, Ti, fill=-1))
        else:
            feats = jnp.zeros((0, hidden), jnp.float32)
            dst = jnp.zeros((0,), jnp.int32)

        # every used seq slot samples its chunk's last token; the executor
        # decides host-side which samples are consumable
        sample_idx = np.full(S, -1, np.int32)
        t = 0
        for i, inst in enumerate(self.seq_insts):
            t += len(inst.token_ids)
            sample_idx[i] = t - 1

        batch = LanguageModelBatch(
            token_ids=jnp.asarray(pad_i32(self.token_ids, T)),
            positions=jnp.asarray(pad_i32(self.positions, T)),
            image_features=feats,
            image_dst_idx=dst,
            attention=attention,
            sample_token_idx=jnp.asarray(sample_idx),
        )
        return FillBatchPlan(batch=batch, max_q=max_q, seq_rcbs=self.seq_rcbs,
                             seq_insts=self.seq_insts, n_tokens=n_tokens,
                             n_seqs=n_seqs)
