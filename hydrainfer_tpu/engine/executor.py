"""Instruction executors (reference: hydrainfer/engine/executor.py:105-299).

FillExecutor: registers finished blocks in the prefix cache, builds the
padded LanguageModelBatch, runs the jitted LM step with the donated KV
cache, then host-side scatters each sampled token into its sample_dst decode
Fill and feeds the output-token processors.

ImageEmbedExecutor: runs the vision tower over the batch's images and
scatters the projected features into the image cache (device-side, jitted).

Async overlap: on TPU, dispatch is asynchronous by construction — the jitted
calls return before the device finishes, so encode and fill programs on the
same chip pipeline naturally; the Future here only defers the host-side
post-processing (which needs the sampled tokens). This replaces the
reference's CUDA side-stream / thread-pool decorators
(reference: executor.py:238-263).
"""
import functools
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..memory import TokenCacheBlockManager
from ..models.factory import (FillDims, ModelFactory, VisionModelParameters,
                              pack_fill_batch)
from ..ops.cache_ops import write_token_cache
from ..utils import hostprof
from ..utils.logger import getLogger
from .isa import Fill, ImageEmbed, ImageEmbedFill
from .params_builder import (FillBatchPlan, LanguageModelBatchBuilder,
                             SEQ_BUCKETS, TOKEN_BUCKETS, _next_pow2,
                             bucket_of)
from .rcb import BatchRequest
from .worker import Worker

logger = getLogger(__name__)


class Future:
    def get(self):
        raise NotImplementedError


class EmptyFuture(Future):
    def get(self):
        pass


class CallbackFuture(Future):
    """Host-side completion: calling get() blocks on device results and runs
    the post-processing exactly once."""

    def __init__(self, fn):
        self.fn = fn
        self._done = False

    def get(self):
        if not self._done:
            self._done = True
            self.fn()


class ComposeFuture(Future):
    def __init__(self, futures):
        self.futures = futures

    def get(self):
        for f in self.futures:
            f.get()


@dataclass
class ExecutorConfig:
    pass


def _tokens_done(rcb) -> bool:
    """Token-based completion (max_tokens reached or eos emitted)."""
    sp = rcb.sampling_params
    if len(rcb.output_token_ids) >= sp.max_tokens:
        return True
    return (bool(rcb.output_token_ids) and not sp.ignore_eos
            and rcb.output_token_ids[-1] in sp.eos_token_ids)


class FillExecutor:
    def __init__(self, kv_cache_manager: TokenCacheBlockManager,
                 image_cache_manager: Optional[TokenCacheBlockManager],
                 worker: Worker, model_factory: ModelFactory,
                 token_table_size: int = 4096):
        self.kv = kv_cache_manager
        self.image = image_cache_manager
        self.worker = worker
        self.tokenizer = model_factory.getTokenizer()
        self.language_config = model_factory.getLanguageModelConfig()
        vision_cfg = model_factory.getVisionModelConfig()
        self.image_token_id = vision_cfg.image_token_id
        # device-resident async-decode feedback buffer: one slot per resident
        # request, holding its latest sampled token
        with jax.default_device(self.kv.device if self.kv else jax.devices()[0]):
            self.token_table = jnp.zeros((token_table_size,), jnp.int32)
            # stand-in image cache for text-only nodes (keeps the jit
            # signature uniform)
            self._dummy_image_cache = jnp.zeros((1, 1, 1, 1, 1, 1),
                                                self.kv.dtype if self.kv
                                                else jnp.bfloat16)
        self._free_slots = list(range(token_table_size - 1, -1, -1))
        # high-water marks for the S / MB jit-key dims (see
        # params_builder.build): once a batch shape has been compiled, no
        # smaller batch or narrower block table triggers a new compile
        self._s_highwater = 1
        self._mb_highwater = 1
        self._ti_highwater = 0
        # speculative-decoding observability: verify steps run / tokens
        # emitted by them / single-step-equivalent steps saved
        self.spec_steps = 0
        self.spec_tokens = 0
        # proposer backoff: a spec attempt whose proposer finds NO n-gram
        # hit still cost the caller a synchronous pipeline drain, so after
        # a miss the next 8..64 (exponential) eligible steps skip the
        # attempt entirely (ramp 2 -> 4 -> ... -> 64) — workloads with no
        # lookup structure quickly converge to ~1/64th of the drain tax
        # while repetitive ones keep the full speedup
        self._spec_skip = 0
        self._spec_backoff = 0
        # jit-key observability: every (dims, n_steps) this executor has
        # dispatched. A key appearing here mid-serving means a fresh XLA
        # compile (~10-25s stall on the tunnel) — the log line below is the
        # first thing to grep when a serving run shows a one-time stall.
        self._seen_fill_keys = set()

    def preratchet(self, s_floor: int, mb_floor: int,
                   ti_floor: int = 0) -> None:
        """Raise the S/MB/Ti jit-key floors to the serving envelope BEFORE
        any program compiles. Without this the floors ratchet upward
        mid-run as the batch fills and contexts grow, and every ratchet
        re-keys BOTH the prefill and decode programs (~10-25s compile each
        on the TPU tunnel) — measured as a 2-program, ~22s stall on the
        first steady-state pass after warmup. Ti (image-feature gather
        width) only applies to image-bearing batches; its natural value
        depends on timing-nondeterministic encode/prefill interleaving, so
        without a floor every mix compiles a fresh program."""
        self._s_highwater = max(self._s_highwater, int(s_floor))
        self._mb_highwater = max(self._mb_highwater, int(mb_floor))
        self._ti_highwater = max(self._ti_highwater, int(ti_floor))

    def acquire_slot(self, rcb) -> None:
        if rcb.token_slot < 0:
            assert self._free_slots, "token table exhausted"
            rcb.token_slot = self._free_slots.pop()

    def release_slot(self, rcb) -> None:
        if rcb.token_slot >= 0:
            self._free_slots.append(rcb.token_slot)
            rcb.token_slot = -1

    def _register_prefix_blocks(self, batch: BatchRequest) -> None:
        """Insert hashes for every block this step completes
        (reference: executor.py:109-127)."""
        bs = self.kv.block_size
        for rcb, inst in batch:
            if not isinstance(inst, Fill) or inst.hashes is None:
                continue
            vbids, hashes = [], []
            for cid in inst.cache_ids:
                if cid % bs != bs - 1:
                    continue
                vbid = cid // bs
                if vbid >= len(inst.hashes):
                    continue  # decode tokens are not prefix-cached
                vbids.append(vbid)
                hashes.append(inst.hashes[vbid])
            if vbids:
                self.kv.set_blocks(rcb.virtual_kv_cache, vbids, hashes)

    def _multi_step_window(self, batch: BatchRequest, n_steps: int):
        """Fused-decode window for this batch: (n_steps, per-request ks).

        Fusion needs a pure single-token-decode batch whose pre-created
        decode Fills advance position==cache id (so the device can advance
        geometry itself). Each request contributes ks[i] real steps — its
        run of consecutive eligible Fills, capped at n_steps; requests with
        fewer steps than the window ride along with their state writes
        masked on device (models/decoder.py:decoder_forward_multi). The
        batch-wide window is NOT the min over requests — that would collapse
        to 1 in steady state (some request is always near its token limit)
        and make n_steps an unbounded compile-key set; instead n_steps stays
        the configured power-of-two, halved only under KV-block pressure.
        """
        if n_steps <= 1 or not self.worker.supports_multi_step():
            return 1, None
        ks = []
        for rcb, inst in batch:
            # ImageEmbedFill is excluded even at one token: the fused scan
            # re-splices its image features into EVERY step's embeddings,
            # corrupting steps 1..K-1
            if (not isinstance(inst, Fill) or isinstance(inst, ImageEmbedFill)
                    or len(inst.position_ids) != 1
                    or not inst.sample or inst.is_chunked):
                return 1, None
            ks.append(self._decode_chain_len(inst, n_steps))
        if max(ks) <= 1:
            return 1, None
        # realloc the look-ahead blocks; shrink the window under pressure
        bs = self.kv.block_size
        while n_steps > 1:
            need = 0
            for (rcb, inst), k in zip(batch, ks):
                target = inst.cache_ids[0] + min(k, n_steps)
                need += max(0, -(-target // bs)
                            - len(rcb.virtual_kv_cache.block_table))
            if need <= self.kv.n_available_blocks():
                break
            # skip 2 when halving: n_steps is a static jit key, and the
            # warmed set is {K, K//2, 1} — a transient pressure-only 2
            # would buy a fresh ~30s compile for one degraded step
            n_steps = n_steps // 2 if n_steps > 4 else 1
        if n_steps <= 1:
            return 1, None
        ks = [min(k, n_steps) for k in ks]
        for (rcb, inst), k in zip(batch, ks):
            self.kv.realloc(rcb.virtual_kv_cache, inst.cache_ids[0] + k)
        return n_steps, ks

    # ---------------- n-gram speculative decoding ----------------

    @staticmethod
    def propose_ngram(ctx, k: int, n: int = 3):
        """Prompt-lookup draft: continuation of the latest earlier
        occurrence of the context's trailing n-gram (n, then 2).
        Vectorized — this runs on the synchronous verify path's critical
        section, so a pure-Python O(context) scan would erode the latency
        win on long contexts."""
        a = np.asarray(ctx, np.int32)
        L = a.shape[0]
        for nn in (n, 2):
            if L < nn + 1:
                continue
            pat = a[-nn:]
            hits = a[: L - 1 - (nn - 1)] == pat[0]
            for j in range(1, nn):
                hits &= a[j: L - 1 - (nn - 1) + j] == pat[j]
            idx = np.flatnonzero(hits)
            if idx.size:
                i = int(idx[-1])
                cont = a[i + nn: i + nn + k]
                if cont.size:
                    return [int(t) for t in cont]
        return []

    @staticmethod
    def _decode_chain_len(inst, limit: int) -> int:
        """Length of the consecutive single-token-decode Fill run starting
        at inst: rope position AND cache slot advance by exactly 1 per node
        (an absolute pos/cache offset is fine — M-RoPE compresses rope
        positions below cache ids). Shared by the fused window and the
        speculative verify eligibility walks."""
        k, node = 0, inst
        prev_p, prev_c = inst.position_ids[0] - 1, inst.cache_ids[0] - 1
        while (k < limit and isinstance(node, Fill)
               and not isinstance(node, ImageEmbedFill)
               and len(node.position_ids) == 1 and node.sample
               and not node.is_chunked
               and node.position_ids[0] == prev_p + 1
               and node.cache_ids[0] == prev_c + 1):
            prev_p, prev_c = node.position_ids[0], node.cache_ids[0]
            k += 1
            node = node.next
        return k

    def spec_should_try(self) -> bool:
        """Backoff gate — call LAST in the eligibility chain (it consumes
        one skip credit per call)."""
        if self._spec_skip > 0:
            self._spec_skip -= 1
            return False
        return True

    def _spec_miss(self) -> None:
        self._spec_backoff = min(max(2, self._spec_backoff * 2), 64)
        self._spec_skip = self._spec_backoff

    def _spec_hit(self) -> None:
        self._spec_backoff = 0

    def spec_precheck(self, batch: BatchRequest, k_draft: int) -> bool:
        """Cheap eligibility test (no proposer, no token state): lets the
        node avoid draining the async pipeline for batches that can never
        speculate (prefill/chunked fills, short chains)."""
        if not self.worker.supports_multi_step():
            return False
        for rcb, inst in batch:
            if (not isinstance(inst, Fill) or isinstance(inst, ImageEmbedFill)
                    or len(inst.position_ids) != 1
                    or not inst.sample or inst.is_chunked):
                return False
            if self._decode_chain_len(inst, k_draft + 1) < k_draft + 1:
                return False
        return True

    def _spec_context(self, rcb) -> list:
        """Token history for the proposer: prompt fills' literals (cached —
        the prompt is immutable) + generated tokens."""
        base = getattr(rcb, "_spec_ctx_base", None)
        if base is None:
            base = []
            node = rcb.instructions.head.next
            while node is not None:
                if isinstance(node, Fill) and node.token_ids \
                        and len(node.token_ids) > 1:
                    base.extend(int(t) for t in node.token_ids)
                node = node.next
            rcb._spec_ctx_base = base
        return base + rcb.output_token_ids

    def execute_spec(self, batch: BatchRequest, k_draft: int,
                     ngram_n: int = 3):
        """Speculative verify step (greedy batches only): every request
        contributes 1 real row + up to k_draft proposed rows, verified in
        ONE device program (decode is weight-read-bound, so the extra rows
        are nearly free; each accepted draft is a free token). Returns None
        when the batch is ineligible or no request has a draft — the
        caller falls back to the normal (fused) path. SYNCHRONOUS: the
        accepted count gates the cursor advance, so this path drains the
        async pipeline rather than running ahead of it."""
        if not self.spec_precheck(batch, k_draft):
            return None
        K1 = k_draft + 1
        drafts = [self.propose_ngram(self._spec_context(rcb), k_draft,
                                     ngram_n)
                  for rcb, _ in batch]
        if not any(drafts):
            self._spec_miss()
            return None
        # per-request look-ahead blocks (only to each draft's own depth);
        # bail (don't shrink) under pressure
        bs = self.kv.block_size
        need = 0
        for (rcb, inst), draft in zip(batch, drafts):
            target = inst.cache_ids[0] + 1 + len(draft)
            need += max(0, -(-target // bs)
                        - len(rcb.virtual_kv_cache.block_table))
        if need > self.kv.n_available_blocks():
            self._spec_miss()          # pool pressure: back off too
            return None
        for (rcb, inst), draft in zip(batch, drafts):
            self.kv.realloc(rcb.virtual_kv_cache,
                            inst.cache_ids[0] + 1 + len(draft))
            self.acquire_slot(rcb)

        plan = self._build_spec_plan(batch, drafts, K1)
        image_cache = (self.image.cache_array if self.image is not None
                       else self._dummy_image_cache)
        cache_in = self.kv.cache_ref if self.kv.use_ref else self.kv.cache_array
        out = self.worker.execute_language_model(
            cache_in, self.token_table, jnp.asarray(plan.flat),
            image_cache, plan.dims)
        if out.cache is not None and not isinstance(out.cache, jax.Ref):
            self.kv.cache_array = out.cache
        self.token_table = out.token_table

        # device returns [emitted (S_pad*K1) | acc (S_pad)]: emitted[:acc]
        # are accepted drafts, emitted[acc] the final (possibly resampled)
        # token — acceptance is computed ON DEVICE (rejection sampling for
        # stochastic rows), so the host just reads it
        raw = np.asarray(out.sample_token_ids)
        S_pad = plan.dims.S
        tok = raw[: S_pad * K1].reshape(S_pad, K1)[:len(drafts)]
        accs = raw[S_pad * K1:][:len(drafts)]
        self.spec_steps += 1
        self._spec_hit()
        token_time = time.perf_counter()
        for i, (rcb, _) in enumerate(batch):
            acc = int(accs[i])
            self.spec_tokens += acc + 1
            for j in range(acc + 1):
                inst = rcb.current_instruction()
                if inst.sample_dst is not None:
                    inst.sample_dst.token_ids = [int(tok[i, j])]
                rcb.step()
                if _tokens_done(rcb):
                    continue
                rcb.metric.token_times.append(token_time)
                rcb.output_token_ids.append(int(tok[i, j]))
                is_last = _tokens_done(rcb)
                for proc in rcb.output_token_processors:
                    proc.append_token_id(int(tok[i, j]), is_last)
        return EmptyFuture()

    def _build_spec_plan(self, batch: BatchRequest, drafts, K1: int):
        """Uniform S x K1 verify segments (python-packed; the spec batch
        shape differs too much from the native packer's fill layout)."""
        S_used = len(drafts)
        n_tokens = S_used * K1
        dims_T = bucket_of(n_tokens, TOKEN_BUCKETS)
        S = max(bucket_of(S_used, SEQ_BUCKETS), _next_pow2(self._s_highwater))
        MB = max(_next_pow2(max(len(r.virtual_kv_cache.block_table)
                                for r, _ in batch)),
                 _next_pow2(self._mb_highwater))
        self._s_highwater = max(self._s_highwater, S)
        self._mb_highwater = max(self._mb_highwater, MB)
        T = max(dims_T, bucket_of(S * K1, TOKEN_BUCKETS))

        token_ids = np.zeros(T, np.int32)
        token_src = np.full(T, -1, np.int32)
        positions = np.zeros(T, np.int32)
        new_slots = np.full(T, -1, np.int32)
        q_seq_ids = np.full(T, -1, np.int32)
        q_local_ids = np.zeros(T, np.int32)
        kv_lens = np.zeros(S, np.int32)
        tables = np.full((S, MB), -1, np.int32)
        sample_idx = np.full(S, -1, np.int32)
        dst_slots = np.full(S, -1, np.int32)
        cu = np.zeros(S + 1, np.int32)
        draft_lens = np.zeros(S, np.int32)

        for s, ((rcb, inst), draft) in enumerate(zip(batch, drafts)):
            r0 = s * K1
            c0, p0 = inst.cache_ids[0], inst.position_ids[0]
            dl = len(draft)
            if inst.token_ids[0] >= 0:       # host-resolved literal
                token_ids[r0] = inst.token_ids[0]
            else:                            # device token-table feedback
                token_src[r0] = rcb.token_slot
            for j, d in enumerate(draft):
                token_ids[r0 + 1 + j] = d
            slots = self.kv.v2p(rcb.virtual_kv_cache,
                                list(range(c0, c0 + 1 + dl)))
            for j in range(K1):
                q_seq_ids[r0 + j] = s
                q_local_ids[r0 + j] = j
                positions[r0 + j] = p0 + j
                if j <= dl:
                    new_slots[r0 + j] = slots[j]
            kv_lens[s] = c0 + K1
            bt = rcb.virtual_kv_cache.block_table
            tables[s, :len(bt)] = bt
            sample_idx[s] = r0 + K1 - 1
            dst_slots[s] = rcb.token_slot
            draft_lens[s] = dl
            cu[s + 1] = r0 + K1
        cu[S_used + 1:] = cu[S_used]

        sampling = any(
            (rcb.sampling_params is not None
             and rcb.sampling_params.temperature > 0) for rcb, _ in batch)
        dims = FillDims(T=T, S=S, MB=MB, Ti=0, max_q=_next_pow2(K1),
                        sampling=sampling, spec=K1)
        flat = pack_fill_batch(
            token_ids=token_ids, positions=positions, q_seq_ids=q_seq_ids,
            q_local_ids=q_local_ids, new_kv_slot_ids=new_slots,
            token_src_slots=token_src, kv_lens=kv_lens,
            sample_token_idx=sample_idx, sample_dst_slots=dst_slots,
            block_tables=tables, cu_q_lens=cu,
            num_seqs=np.asarray([S_used], np.int32),
            image_slot_ids=np.zeros(0, np.int32),
            image_dst_idx=np.zeros(0, np.int32), dims=dims)
        flat = np.concatenate([flat, draft_lens])
        if sampling:
            from .params_builder import sampling_tail
            flat = np.concatenate(
                [flat, sampling_tail([r for r, _ in batch], S)])
        return FillBatchPlan(flat=flat, dims=dims,
                             seq_rcbs=[r for r, _ in batch],
                             seq_insts=[i for _, i in batch],
                             n_tokens=n_tokens, n_seqs=S_used)

    def execute(self, batch: BatchRequest, n_steps: int = 1) -> Future:
        if len(batch) == 0:
            return EmptyFuture()

        with hostprof.span("fill.window_walk"):
            n_steps, ks = self._multi_step_window(batch, n_steps)
        with hostprof.span("fill.prefix_reg"):
            self._register_prefix_blocks(batch)
            for rcb, _ in batch:
                self.acquire_slot(rcb)

        with hostprof.span("fill.build"):
            builder = LanguageModelBatchBuilder(
                self.kv, self.image, self.language_config, self.image_token_id)
            builder.add_batch(batch)
            plan = builder.build(s_floor=self._s_highwater,
                                 mb_floor=self._mb_highwater,
                                 ti_floor=self._ti_highwater)
        self._s_highwater = max(self._s_highwater, plan.dims.S)
        self._mb_highwater = max(self._mb_highwater, plan.dims.MB)
        self._ti_highwater = max(self._ti_highwater, plan.dims.Ti)
        key = (plan.dims, n_steps)
        if key not in self._seen_fill_keys:
            self._seen_fill_keys.add(key)
            logger.info(f"new fill jit key #{len(self._seen_fill_keys)}: "
                        f"{plan.dims} n_steps={n_steps}")

        fused_k = None
        if n_steps > 1:
            fused_k = np.zeros(plan.dims.S, np.int32)
            fused_k[:len(ks)] = ks
        image_cache = (self.image.cache_array if self.image is not None
                       else self._dummy_image_cache)
        cache_in = self.kv.cache_ref if self.kv.use_ref else self.kv.cache_array
        with hostprof.span("fill.h2d"):
            flat_dev = jnp.asarray(plan.flat)
        with hostprof.span("fill.dispatch"):
            out = self.worker.execute_language_model(
                cache_in, self.token_table, flat_dev,
                image_cache, plan.dims, n_steps=n_steps, fused_k=fused_k)
        # ref mode updates in place (out.cache is None); value mode donated
        if out.cache is not None and not isinstance(out.cache, jax.Ref):
            self.kv.cache_array = out.cache
        self.token_table = out.token_table
        sampled_dev = out.sample_token_ids
        # advance each request through ITS window (ks[i] steps), collecting
        # per-step instruction rows for host-side token resolution; rows a
        # request doesn't reach hold None (its device lanes were masked)
        plan.n_steps = n_steps
        with hostprof.span("fill.cursor"):
            if n_steps == 1:
                batch.step()
            else:
                rows = [[None] * len(plan.seq_rcbs) for _ in range(n_steps)]
                for i, rcb in enumerate(plan.seq_rcbs):
                    for s in range(ks[i]):
                        rows[s][i] = rcb.current_instruction()
                        rcb.step()
                plan.step_insts = rows

        def postprocess():
            # the only host↔device sync in the fill path — the node batches
            # these reads every few steps (see AsyncEPDNode.flush_fills), so
            # the device never waits on the host between decode steps
            hostprof.event("read_start", getattr(plan, "win_id", None))
            with hostprof.span("fill.d2h_read"):
                sampled = np.asarray(sampled_dev)
            hostprof.event("read_done", getattr(plan, "win_id", None))
            with hostprof.span("fill.postprocess"):
                postprocess_plan(plan, sampled)

        fut = CallbackFuture(postprocess)
        fut.plan = plan
        fut.sampled_dev = sampled_dev
        fut.n_steps = n_steps  # device steps this read covers (node backlog)
        FillExecutor._win_counter += 1
        fut.win_id = plan.win_id = FillExecutor._win_counter
        hostprof.event("dispatched", fut.win_id)
        return fut

    _win_counter = 0


def postprocess_plan(plan, sampled: np.ndarray) -> None:
    """Host-side consumption of one fill step's sampled tokens (or of a
    fused multi-step window's — the device returns n_steps*S tokens)."""
    token_time = time.perf_counter()
    n_steps = getattr(plan, "n_steps", 1)
    step_insts = (plan.step_insts if n_steps > 1 else [plan.seq_insts])
    sampled = sampled.reshape(n_steps, -1)
    for s in range(n_steps):
        for i, (rcb, inst) in enumerate(zip(plan.seq_rcbs, step_insts[s])):
            if inst is None or not inst.sample:
                continue
            next_token = int(sampled[s, i])
            if inst.sample_dst is not None:
                # resolve on host too (migration and debugging read this)
                inst.sample_dst.token_ids = [next_token]
            if inst.is_chunked:
                continue
            # Termination is decided from TOKEN state only: under the async
            # pipeline the instruction cursor runs ahead of token
            # postprocessing, so rcb.is_finished() (which also looks at the
            # cursor) would fire early here — and a request may have surplus
            # in-flight steps after its terminating token, which must be
            # dropped.
            if _tokens_done(rcb):
                continue
            rcb.metric.token_times.append(token_time)
            rcb.output_token_ids.append(next_token)
            is_last = _tokens_done(rcb)
            for proc in rcb.output_token_processors:
                proc.append_token_id(next_token, is_last)


class ImageEmbedExecutor:
    def __init__(self, image_cache_manager: TokenCacheBlockManager,
                 worker: Worker, model_factory: ModelFactory,
                 chunk_layers: int = 0):
        self.image = image_cache_manager
        self.worker = worker
        lcfg = model_factory.getLanguageModelConfig()
        self.n_heads = image_cache_manager.config.n_heads
        self.head_dim = image_cache_manager.config.head_dim
        # layer-chunked encode: split one encode batch's ViT tower into
        # segments of this many layers, dispatched ONE PER ENGINE STEP so
        # decode windows enter the device queue between segments (0 = off,
        # whole tower in one program). Requires a fixed-resolution vision
        # model exposing the segment API (models/llava.py).
        self.chunk_layers = chunk_layers
        self._inflight = None

    def chunking_enabled(self) -> bool:
        vm = self.worker.vision_model
        return (self.chunk_layers > 0 and vm is not None
                and hasattr(vm, "forward_segment")
                and getattr(vm, "fixed_resolution", False))

    @property
    def busy(self) -> bool:
        return self._inflight is not None

    def _prep(self, batch: BatchRequest):
        """Shared batch prep: stacked pixels (pow2-padded), cache slots."""
        pixel_values, slot_ids, images_size = [], [], []
        for rcb, inst in batch:
            pixel_values.append(np.asarray(inst.pixel_values))
            inst.pixel_values = None
            slot_ids.extend(self.image.v2p(rcb.virtual_image_cache,
                                           inst.cache_ids))
            images_size.extend(inst.images_size)
        stacked = np.concatenate(pixel_values, axis=0)
        if getattr(self.worker.vision_model, "fixed_resolution", False):
            n_imgs = stacked.shape[0]
            assert len(images_size) == n_imgs, (len(images_size), n_imgs)
            Np = _next_pow2(n_imgs)
            if Np > n_imgs:
                stacked = np.concatenate(
                    [stacked, np.zeros((Np - n_imgs,) + stacked.shape[1:],
                                       stacked.dtype)], axis=0)
                images_size.extend(images_size[-1:] * (Np - n_imgs))
        return stacked, slot_ids, images_size

    def _scatter(self, feats, slot_ids) -> None:
        flat = feats.reshape(-1, feats.shape[-1])
        n = flat.shape[0]
        Tp = bucket_of(n, TOKEN_BUCKETS)
        slots = np.full(Tp, -1, np.int32)
        slots[:len(slot_ids)] = slot_ids
        flat = jnp.pad(flat, ((0, Tp - n), (0, 0)))
        self.image.cache_array = self._scatter_features(
            self.image.cache_array, flat, jnp.asarray(slots))

    def start_chunked(self, batch: BatchRequest) -> None:
        """Dispatch the patch embedding + first tower segment; the engine
        calls advance() once per step until the encode completes."""
        assert self._inflight is None and self.chunking_enabled()
        stacked, slot_ids, _ = self._prep(batch)
        vm = self.worker.vision_model
        hidden = vm.forward_embed(jnp.asarray(stacked))
        hidden = vm.forward_segment(hidden, 0, self.chunk_layers)
        self._inflight = {"batch": batch, "hidden": hidden, "seg": 1,
                          "n_segs": vm.encode_segments(self.chunk_layers),
                          "slot_ids": slot_ids}

    def advance(self) -> Optional[BatchRequest]:
        """Dispatch the next tower segment (async); on the last one,
        project + scatter and return the finished batch."""
        st = self._inflight
        assert st is not None
        vm = self.worker.vision_model
        if st["seg"] < st["n_segs"]:
            st["hidden"] = vm.forward_segment(st["hidden"], st["seg"],
                                              self.chunk_layers)
            st["seg"] += 1
            return None
        feats = vm.forward_project(st["hidden"])
        self._scatter(feats, st["slot_ids"])
        st["batch"].step()
        self._inflight = None
        return st["batch"]

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _scatter_features(self, cache, features, slots):
        feats = features.reshape(-1, self.n_heads, self.head_dim)
        return write_token_cache(cache, 0, slots, (feats,),
                                 cache.shape[3])

    def execute(self, batch: BatchRequest) -> Future:
        if len(batch) == 0:
            return EmptyFuture()

        # _prep pads the image axis to a pow2 bucket so the encode
        # program's jit key converges instead of compiling per image count
        # (pad rows' features land on slot -1 and are dropped by the
        # scatter). Pure pow2 — no high-water floor: a floor would make one
        # large burst tax every later encode with pad-row ViT FLOPs
        # forever, to save at most log2(budget) compiles. The budget
        # profiler probes these same pow2 sizes (its latency samples
        # include the pad cost), so scheduled batches stay inside the
        # profiled SLO envelope.
        stacked, slot_ids, images_size = self._prep(batch)
        pixels = jnp.asarray(stacked)
        vision_out = self.worker.execute_vision_model(
            pixels, VisionModelParameters(original_image_sizes=images_size))
        feats = vision_out.image_features  # (n_images, n_tok, hidden)
        self._scatter(feats, slot_ids)

        batch.step()
        return EmptyFuture()


class InstructionExecutor:
    """Facade dispatching per-instruction-type batches
    (reference: executor.py:267-299)."""

    def __init__(self, kv_cache_manager, image_cache_manager, worker,
                 model_factory, token_table_size: int = 4096,
                 encode_chunk_layers: int = 0):
        self.fill_executor = FillExecutor(kv_cache_manager, image_cache_manager,
                                          worker, model_factory,
                                          token_table_size=token_table_size)
        self.image_embed_executor = (
            ImageEmbedExecutor(image_cache_manager, worker, model_factory,
                               chunk_layers=encode_chunk_layers)
            if image_cache_manager is not None else None)

    def execute_fill(self, batch: BatchRequest, n_steps: int = 1) -> Future:
        return self.fill_executor.execute(batch, n_steps=n_steps)

    def execute_image_embed(self, batch: BatchRequest) -> Future:
        return self.image_embed_executor.execute(batch)

    def execute_empty(self, batch: BatchRequest) -> Future:
        if len(batch) == 0:
            return EmptyFuture()
        batch.step()
        return EmptyFuture()
