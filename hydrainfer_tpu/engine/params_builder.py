"""Ragged batch → padded static-shape flat fill buffer.

TPU-native replacement for the reference's LanguageModelParametersBuilder
(reference: hydrainfer/engine/parameters_builder.py:46-97, which assembles
flat varlen tensors + a flashinfer plan). Here every array is padded to a
shape bucket so each (token-bucket, seq-bucket, block-bucket, max-q-bucket)
combination compiles exactly once — the jit cache plays the role the CUDA
graph runner plays in the reference (reference:
hydrainfer/model_runner/cuda_graph_model_runner.py:29-73), but covers mixed
prefill+decode batches, not just all-decode ones.

Packing runs through the native C++ extension (csrc/hostops.cpp) when built
and falls back to the pure-Python path, which doubles as the test oracle.
"""
import bisect
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .._C import hostops
from ..memory import TokenCacheBlockManager
from ..models.factory import FillDims, LanguageModelConfig, pack_fill_batch
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
    dims: FillDims
    seq_rcbs: List[RequestControlBlock]           # per used seq slot
    seq_insts: List[Fill]
    n_tokens: int
    n_seqs: int
    # fused multi-step decode window (set by the executor): the device ran
    # n_steps chained decode steps; step_insts[s] is step s's instruction row
    n_steps: int = 1
    step_insts: Optional[List[List[Fill]]] = None

    @property
    def max_q(self) -> int:
        return self.dims.max_q


def sampling_tail(seq_rcbs, S: int) -> np.ndarray:
    """Per-seq sampling controls, floats bitcast into the i32 flat buffer:
    [temps(S) | top_ks(S) | top_ps(S) | seed(1)]. The ONE definition of the
    tail layout — models/factory.py:unpack_fill_batch mirrors it on device;
    both the fill builder and the speculative plan use this."""
    temps = np.zeros(S, np.float32)
    top_ks = np.full(S, -1, np.int32)
    top_ps = np.ones(S, np.float32)
    for i, rcb in enumerate(seq_rcbs):
        sp = rcb.sampling_params
        if sp is None:
            continue
        temps[i] = sp.temperature
        top_ks[i] = sp.top_k
        top_ps[i] = sp.top_p
    LanguageModelBatchBuilder._seed_counter += 1
    seed = np.asarray([LanguageModelBatchBuilder._seed_counter], np.int32)
    return np.concatenate([temps.view(np.int32), top_ks,
                           top_ps.view(np.int32), seed])


def _is_range(ids: List[int]) -> bool:
    return len(ids) == 1 or ids[-1] - ids[0] == len(ids) - 1


class LanguageModelBatchBuilder:
    def __init__(self, kv_cache_manager: TokenCacheBlockManager,
                 image_cache_manager: Optional[TokenCacheBlockManager],
                 language_config: LanguageModelConfig,
                 image_token_id: int):
        self.kv = kv_cache_manager
        self.image = image_cache_manager
        self.lcfg = language_config
        self.image_token_id = image_token_id

        self.image_slot_ids: List[int] = []
        self.image_dst_idx: List[int] = []
        self.seq_rcbs: List[RequestControlBlock] = []
        self.seq_insts: List[Fill] = []
        self._n_tokens = 0
        self._max_q = 1
        self._max_blocks = 1
        self._contiguous = True
        self._mrope = bool(getattr(language_config, "mrope_section", ()))
        self._pos_h: List[int] = []
        self._pos_w: List[int] = []

    def add(self, rcb: RequestControlBlock, inst: Fill) -> None:
        n = len(inst.position_ids)
        if isinstance(inst, ImageEmbedFill) and inst.image_token_cache_ids:
            slots = self.image.v2p(rcb.virtual_image_cache,
                                   inst.image_token_cache_ids)
            self.image_slot_ids.extend(slots)
            self.image_dst_idx.extend(
                self._n_tokens + i
                for i, is_img in enumerate(inst.image_token_mask) if is_img)
        self.seq_rcbs.append(rcb)
        self.seq_insts.append(inst)
        if self._mrope:
            hw = inst.mrope_hw or [inst.position_ids, inst.position_ids]
            self._pos_h.extend(hw[0])
            self._pos_w.extend(hw[1])
        self._n_tokens += n
        self._max_q = max(self._max_q, n)
        self._max_blocks = max(self._max_blocks,
                               len(rcb.virtual_kv_cache.block_table))
        if not (_is_range(inst.cache_ids) and _is_range(inst.position_ids)):
            self._contiguous = False

    def add_batch(self, batch: BatchRequest) -> None:
        for rcb, inst in batch:
            if isinstance(inst, Fill):
                self.add(rcb, inst)

    def build(self, s_floor: int = 1, mb_floor: int = 1,
              ti_floor: int = 0) -> FillBatchPlan:
        """s_floor/mb_floor: HIGH-WATER floors for the S and MB jit-key
        dims (supplied by the executor). Without them, per-request context
        growth walks MB through every power of two and batch drain walks S
        back down the buckets — each transition a fresh ~30s compile on the
        TPU tunnel. Decode is weight-read-bound, so padding seq rows and
        block-table width is nearly free on device; pinning both to their
        session high-water marks makes the compile set converge instead of
        churning. T stays bucketed: padding prefill tokens wastes real
        MXU work."""
        n_seqs = len(self.seq_rcbs)
        sampling = any(
            (rcb.sampling_params is not None
             and rcb.sampling_params.temperature > 0)
            for rcb in self.seq_rcbs)
        T = bucket_of(self._n_tokens, TOKEN_BUCKETS)
        dims = FillDims(
            T=T,
            S=max(bucket_of(n_seqs, SEQ_BUCKETS), _next_pow2(s_floor)),
            MB=max(_next_pow2(self._max_blocks), _next_pow2(mb_floor)),
            # ti_floor: high-water floor for image-bearing batches only —
            # text-only programs keep Ti=0 (no image gather compiled in)
            Ti=(max(bucket_of(len(self.image_slot_ids), TOKEN_BUCKETS),
                    bucket_of(ti_floor, TOKEN_BUCKETS) if ti_floor else 0)
                if self.image_slot_ids else 0),
            # Prefill-carrying batches collapse max_q to T: (T, max_q) is a
            # 2D jit-key space that Poisson arrival mixes walk combinatorially
            # (observed: fresh keys — seconds of tracing each — 20 minutes
            # into an SLO sweep). max_q=T is always a valid upper bound, the
            # TPU-default ragged kernel never reads max_q, and the jnp oracle
            # already pads q to (S, max_q) — the only cost is oracle prefill
            # steps padding to T instead of the longest chunk. Decode-only
            # batches keep max_q=1 (their own fast program).
            max_q=T if self._max_q > 1 else 1,
            sampling=sampling,
            mrope=self._mrope)
        if hostops is not None and self._contiguous:
            flat = self._build_native(dims)
        else:
            flat = self._build_python(dims)
        if self._mrope:
            hw = np.zeros((2, dims.T), np.int32)
            hw[0, :len(self._pos_h)] = self._pos_h
            hw[1, :len(self._pos_w)] = self._pos_w
            flat = np.concatenate([flat, hw.reshape(-1)])
        if sampling:
            flat = np.concatenate([flat, self._sampling_tail(dims)])
        return FillBatchPlan(flat=flat, dims=dims, seq_rcbs=self.seq_rcbs,
                             seq_insts=self.seq_insts,
                             n_tokens=self._n_tokens, n_seqs=n_seqs)

    _seed_counter = 0

    def _sampling_tail(self, dims: FillDims) -> np.ndarray:
        return sampling_tail(self.seq_rcbs, dims.S)

    # ---------------- native packing ----------------

    def _build_native(self, dims: FillDims) -> np.ndarray:
        bs = self.kv.block_size
        seqs = []
        for rcb, inst in zip(self.seq_rcbs, self.seq_insts):
            n = len(inst.position_ids)
            unresolved = n == 1 and inst.token_ids[0] < 0
            dst = rcb.token_slot if (inst.sample and inst.sample_dst is not None) else -1
            seqs.append((
                None if unresolved else inst.token_ids,
                inst.position_ids[0], n,
                rcb.token_slot, inst.cache_ids[-1] + 1, dst,
                rcb.virtual_kv_cache.block_table, inst.cache_ids[0]))
        need = 6 * dims.T + 3 * dims.S + dims.S * dims.MB + dims.S + 2 + 2 * dims.Ti
        flat = np.empty(need, np.int32)
        hostops.pack_fill_batch(flat, dims.T, dims.S, dims.MB, dims.Ti, bs,
                                seqs, self.image_slot_ids, self.image_dst_idx)
        return flat

    # ---------------- python packing (the oracle / fallback) ----------------

    def _build_python(self, dims: FillDims) -> np.ndarray:
        T, S, MB, Ti = dims.T, dims.S, dims.MB, dims.Ti

        token_ids: List[int] = []
        token_src: List[int] = []
        positions: List[int] = []
        new_slots: List[int] = []
        q_seq_ids: List[int] = []
        q_local_ids: List[int] = []
        kv_lens: List[int] = []
        tables = np.full((S, MB), -1, np.int32)
        sample_idx = np.full(S, -1, np.int32)
        dst_slots = np.full(S, -1, np.int32)
        cu = np.zeros(S + 1, np.int32)

        for s, (rcb, inst) in enumerate(zip(self.seq_rcbs, self.seq_insts)):
            n = len(inst.position_ids)
            if n == 1 and inst.token_ids[0] < 0:
                assert rcb.token_slot >= 0, "decode fill without a token slot"
                token_ids.append(0)
                token_src.append(rcb.token_slot)
            else:
                token_ids.extend(inst.token_ids)
                token_src.extend([-1] * n)
            positions.extend(inst.position_ids)
            new_slots.extend(self.kv.v2p(rcb.virtual_kv_cache, inst.cache_ids))
            q_seq_ids.extend([s] * n)
            q_local_ids.extend(range(n))
            kv_lens.append(inst.cache_ids[-1] + 1)
            bt = rcb.virtual_kv_cache.block_table
            tables[s, :len(bt)] = bt
            sample_idx[s] = len(token_ids) - 1
            if inst.sample and inst.sample_dst is not None:
                dst_slots[s] = rcb.token_slot
            cu[s + 1] = len(token_ids)
        cu[len(self.seq_insts) + 1:] = cu[len(self.seq_insts)]

        def pad_i32(vals, size, fill=0):
            a = np.full(size, fill, np.int32)
            a[:len(vals)] = vals
            return a

        return pack_fill_batch(
            token_ids=pad_i32(token_ids, T),
            positions=pad_i32(positions, T),
            q_seq_ids=pad_i32(q_seq_ids, T, fill=-1),
            q_local_ids=pad_i32(q_local_ids, T),
            new_kv_slot_ids=pad_i32(new_slots, T, fill=-1),
            token_src_slots=pad_i32(token_src, T, fill=-1),
            kv_lens=pad_i32(kv_lens, S),
            sample_token_idx=sample_idx,
            sample_dst_slots=dst_slots,
            block_tables=tables,
            cu_q_lens=cu,
            num_seqs=np.asarray([len(self.seq_insts)], np.int32),
            image_slot_ids=pad_i32(self.image_slot_ids, Ti),
            image_dst_idx=pad_i32(self.image_dst_idx, Ti, fill=-1),
            dims=dims)
