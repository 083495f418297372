"""SLO-driven batch-budget profiler (reference: hydrainfer/engine/profiler.py:33-240).

At node startup, binary-search the largest image batch and token batch whose
measured step latency stays under `tpot_slo - margin`, by pushing synthetic
batches through the REAL executor (so jit compilation for those buckets is
also warmed). The budgets bound what the scheduler packs per step.
"""
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..memory import TokenCacheBlockManager
from ..request import SamplingParameters
from ..utils.logger import getLogger
from .isa import InstructionListBuilder, TextFill
from .rcb import BatchRequest, RequestControlBlock

logger = getLogger(__name__)


@dataclass
class BatchSchedulerProfilerConfig:
    enabled: bool = True
    tpot_slo: float = 0.4
    slo_margin: float = 0.01
    max_image_budget: int = 8
    max_token_budget: int = 2048
    # used when profiling is disabled (tests, CPU)
    default_image_budget: int = 8
    default_token_budget: int = 2048


class BatchSchedulerProfiler:
    def __init__(self, config: BatchSchedulerProfilerConfig, executor=None,
                 kv_cache_manager: Optional[TokenCacheBlockManager] = None,
                 image_cache_manager: Optional[TokenCacheBlockManager] = None,
                 n_image_tokens: int = 576,
                 pixel_shape: tuple = (1, 3, 336, 336)):
        self.config = config
        self.executor = executor
        self.kv = kv_cache_manager
        self.image = image_cache_manager
        self.n_image_tokens = n_image_tokens
        self.pixel_shape = pixel_shape

    # ---------------- synthetic batches ----------------

    def _make_fill_rcb(self, n_tokens: int) -> RequestControlBlock:
        rcb = RequestControlBlock()
        rcb.sampling_params = SamplingParameters(max_tokens=1)
        builder = InstructionListBuilder()
        builder.append(TextFill(
            token_ids=list(np.random.randint(10, 100, size=n_tokens)),
            position_ids=list(range(n_tokens)),
            cache_ids=list(range(n_tokens)),
            sample=True, sample_dst=None, hashes=None))
        rcb.instructions = builder.build()
        rcb.virtual_kv_cache = self.kv.allocate_virtual_cache()
        self.kv.realloc(rcb.virtual_kv_cache, n_tokens)
        return rcb

    def _time_fill(self, n_tokens: int, n_seqs: int = 1) -> float:
        per_seq = max(1, n_tokens // max(1, n_seqs))
        rcbs = [self._make_fill_rcb(per_seq) for _ in range(n_seqs)]
        batch = BatchRequest(rcbs)
        # warm (compile) + measure
        self.executor.execute_fill(batch).get()
        for rcb in rcbs:
            rcb.instructions.curr = rcb.instructions.head.next
        t0 = time.perf_counter()
        self.executor.execute_fill(BatchRequest(rcbs)).get()
        dt = time.perf_counter() - t0
        for rcb in rcbs:
            self.kv.free(rcb.virtual_kv_cache)
        return dt

    def _time_encode(self, n_images: int) -> float:
        from .isa import ImageEmbed
        from PIL import Image
        img = Image.fromarray(np.zeros((336, 336, 3), np.uint8))
        rcbs = []
        for _ in range(n_images):
            rcb = RequestControlBlock()
            rcb.sampling_params = SamplingParameters(max_tokens=1)
            builder = InstructionListBuilder()
            rcb.virtual_image_cache = self.image.allocate_virtual_cache()
            self.image.realloc(rcb.virtual_image_cache, self.n_image_tokens)
            builder.append(ImageEmbed(
                pixel_values=np.zeros(self._pixel_shape(), np.float32),
                cache_ids=list(range(self.n_image_tokens)),
                images_size=[(336, 336)], hashes=None))
            rcb.instructions = builder.build()
            rcbs.append(rcb)
        self.executor.execute_image_embed(BatchRequest(rcbs)).get()
        for rcb in rcbs:
            rcb.instructions.curr = rcb.instructions.head.next
        t0 = time.perf_counter()
        self.executor.execute_image_embed(BatchRequest(rcbs)).get()
        dt = time.perf_counter() - t0
        for rcb in rcbs:
            self.image.free(rcb.virtual_image_cache)
        return dt

    def _pixel_shape(self):
        return self.pixel_shape

    # ---------------- binary searches ----------------

    def _binary_search_budget(self, lo: int, hi: int, timer) -> int:
        """Largest n in [lo, hi] with timer(n) under the SLO."""
        budget = lo
        target = self.config.tpot_slo - self.config.slo_margin
        while lo <= hi:
            mid = (lo + hi) // 2
            if timer(mid) < target:
                budget = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return budget

    def profile_image_budgets(self) -> int:
        if not self.config.enabled or self.executor is None or self.image is None:
            return self.config.default_image_budget
        try:
            budget = self._binary_search_budget(
                1, self.config.max_image_budget, self._time_encode)
        except Exception:
            logger.exception("image budget profiling failed; using default")
            return self.config.default_image_budget
        logger.info(f"profiled image budget: {budget}")
        return budget

    def warm_decode(self, n_seqs: int, k_fused: int) -> None:
        """Pre-compile the decode-step programs serving will hit: a prefill
        at n_seqs, the fused K-window and K/2-window, and the single-step
        program — all at the serving batch size, so the S/MB high-water
        floors (engine/executor.py) start at their steady-state values and
        the first real requests pay zero compiles. Called at node startup
        alongside the budget searches (which already warm the prefill
        T-buckets)."""
        if self.executor is None or self.kv is None:
            return
        # window sizes to warm, largest first; the decode chain must hold
        # enough pre-created fills for ALL of them in sequence
        windows = sorted({k_fused, max(k_fused // 2, 1), 1}, reverse=True)
        n_decode = sum(windows) + 1
        n_prompt = 8
        rcbs = []
        try:
            for _ in range(n_seqs):
                rcb = RequestControlBlock()
                rcb.sampling_params = SamplingParameters(
                    max_tokens=n_decode, ignore_eos=True)
                b = InstructionListBuilder()
                prompt = TextFill(
                    token_ids=list(np.random.randint(10, 100, size=n_prompt)),
                    position_ids=list(range(n_prompt)),
                    cache_ids=list(range(n_prompt)),
                    sample=True, sample_dst=None, hashes=None)
                b.append(prompt)
                last = prompt
                for i in range(n_prompt, n_prompt + n_decode):
                    d = TextFill(token_ids=[-1], position_ids=[i],
                                 cache_ids=[i], sample=True, sample_dst=None,
                                 hashes=None)
                    b.append(d)
                    last.sample_dst = d
                    last = d
                rcb.instructions = b.build()
                rcb.virtual_kv_cache = self.kv.allocate_virtual_cache()
                self.kv.realloc(rcb.virtual_kv_cache, n_prompt)
                rcbs.append(rcb)
            self.executor.execute_fill(BatchRequest(rcbs)).get()
            for k in windows:
                # the scheduler's per-step contract (which this synthetic
                # path bypasses): cover the current instruction's slot; the
                # fused window grows its own look-ahead. The executor's
                # realloc may SHRINK past-step look-ahead, so this must run
                # before every call, like the real step loop does.
                for rcb in rcbs:
                    inst = rcb.current_instruction()
                    self.kv.realloc(rcb.virtual_kv_cache,
                                    inst.cache_ids[0] + 1)
                self.executor.execute_fill(BatchRequest(rcbs),
                                           n_steps=k).get()
        finally:
            fx = getattr(self.executor, "fill_executor", None)
            for rcb in rcbs:
                if fx is not None:
                    fx.release_slot(rcb)
                self.kv.free(rcb.virtual_kv_cache)
        logger.info(f"decode warmup done (S={n_seqs}, K={k_fused})")

    def warm_prefill_ladder(self, token_budget: int) -> None:
        """Pre-compile every prefill-batch program serving can hit.

        With max_q collapsed to T (params_builder.build), a mixed
        prefill+decode batch keys only on its T bucket once the S/MB floors
        are pre-ratcheted — so ONE synthetic prefill per token bucket up to
        the budget covers the whole greedy-sampling key space. Without this,
        Poisson arrival mixes keep minting fresh T buckets mid-serving
        (measured: 10-19s TTFT/TBT tail spikes 20 minutes into an SLO sweep,
        each a trace+compile). Stochastic-sampling programs (temperature>0)
        are a second family and still compile on first use."""
        if self.executor is None or self.kv is None:
            return
        from .params_builder import TOKEN_BUCKETS, bucket_of
        top = bucket_of(max(2, token_budget), TOKEN_BUCKETS)
        # Split each T across sequences no longer than the PRE-RATCHETED
        # per-request context envelope: a single T=2048 sequence would
        # ratchet the MB (block-table width) floor to T/block_size, and at
        # 7B-class head counts the upstream ragged kernel's prefill q-tile
        # then exceeds the 16MB scoped vmem — the COMPILE itself fails.
        # Real serving batches pack multiple prompts per T bucket anyway,
        # so the multi-sequence form matches the keys traffic actually
        # produces.
        fx0 = getattr(self.executor, "fill_executor", None)
        bs = self.kv.block_size
        ctx_cap = max(bs, (fx0._mb_highwater if fx0 is not None else 1) * bs)
        for T in [b for b in TOKEN_BUCKETS if b <= top]:
            rcbs = []
            for lo in range(0, T, ctx_cap):
                n = min(ctx_cap, T - lo)
                rcb = RequestControlBlock()
                rcb.sampling_params = SamplingParameters(max_tokens=1,
                                                         ignore_eos=True)
                b = InstructionListBuilder()
                b.append(TextFill(
                    token_ids=list(np.random.randint(10, 100, size=n)),
                    position_ids=list(range(n)), cache_ids=list(range(n)),
                    sample=True, sample_dst=None, hashes=None))
                rcb.instructions = b.build()
                rcb.virtual_kv_cache = self.kv.allocate_virtual_cache()
                self.kv.realloc(rcb.virtual_kv_cache, n)
                rcbs.append(rcb)
            try:
                self.executor.execute_fill(BatchRequest(rcbs)).get()
            finally:
                fx = getattr(self.executor, "fill_executor", None)
                for rcb in rcbs:
                    if fx is not None:
                        fx.release_slot(rcb)
                    self.kv.free(rcb.virtual_kv_cache)
        logger.info(f"prefill ladder warmup done (T<= {top}, "
                    f"ctx_cap={ctx_cap})")

    def profile_token_budgets(self) -> int:
        if not self.config.enabled or self.executor is None or self.kv is None:
            return self.config.default_token_budget
        try:
            budget = self._binary_search_budget(
                16, self.config.max_token_budget, self._time_fill)
        except Exception:
            logger.exception("token budget profiling failed; using default")
            return self.config.default_token_budget
        logger.info(f"profiled token budget: {budget}")
        return budget
