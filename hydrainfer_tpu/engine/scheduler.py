"""Continuous-batching scheduler (reference: hydrainfer/engine/scheduler.py:36-200).

Behavioral contract preserved:
  - waiting deque with PullCache queue-jumping (appendleft);
  - admission up to max_running_requests minus in-flight migrations, plus an
    overload window admitting only PullCache requests to break cross-node
    pull deadlocks;
  - lazy virtual-KV allocation with prefix-cache match → the matched prefix
    is skipped by chunking the prefill at the match point and stepping past
    the head chunk;
  - batch packing under profiled image/token budgets with 'prefill' or
    'decode' priority and chunked prefill of the marginal request;
  - queueing-latency stamps on entry/exit of the waiting queue.
"""
import time
from collections import deque
from dataclasses import dataclass
from typing import List, Literal

from ..memory import TokenCacheBlockManager
from ..utils.counter import IncreasingAllocator
from ..utils.logger import getLogger
from .isa import Fill, ImageEmbed, PullCache
from .rcb import BatchRequest, RequestControlBlock

logger = getLogger(__name__)


@dataclass
class BatchSchedulerConfig:
    priority: Literal["prefill", "decode"] = "prefill"
    max_running_requests: int = 16
    chunked_prefill: bool = True
    debug: bool = False


@dataclass
class BatchSchedulerMetrics:
    n_running_requests: int
    n_requests_waiting_migrate: int


class BatchSchedulerObserver:
    def update(self, rcb: RequestControlBlock) -> None:
        raise NotImplementedError


class BatchScheduler:
    def __init__(self, config: BatchSchedulerConfig,
                 kv_cache_manager: TokenCacheBlockManager,
                 image_cache_manager: TokenCacheBlockManager,
                 image_budget: int = 8, token_budget: int = 2048):
        self.config = config
        self.kv_cache_manager = kv_cache_manager
        self.image_cache_manager = image_cache_manager
        self.image_budget = image_budget
        self.token_budget = token_budget

        self.waiting: deque = deque()
        self.running: List[RequestControlBlock] = []
        self.step_cnt = 0
        self._sid_allocator = IncreasingAllocator(start=1)
        self.max_overload_requests = config.max_running_requests
        self._running_cnt = 0
        self._migrating_cnt = 0

    # -------- migration OOM guard (reference: scheduler.py:54-58) --------

    def migrating_acquire(self) -> None:
        assert self._migrating_cnt < self.config.max_running_requests + self.max_overload_requests
        self._migrating_cnt += 1

    def migrating_release(self) -> None:
        assert self._migrating_cnt > 0
        self._migrating_cnt -= 1

    # -------- queueing-latency stamps --------

    def _stamp_queue_begin(self, rcb: RequestControlBlock) -> None:
        m = rcb.metric
        if isinstance(rcb.current_instruction(), ImageEmbed):
            m.encode_queueing.append(time.perf_counter())
        elif not m.prefill_queueing:
            m.prefill_queueing.append(time.perf_counter())
        elif not m.decode_queueing:
            m.decode_queueing.append(time.perf_counter())

    def _stamp_queue_end(self, rcb: RequestControlBlock) -> None:
        m = rcb.metric
        for span in (m.encode_queueing, m.prefill_queueing, m.decode_queueing):
            if len(span) == 1:
                span.append(time.perf_counter())
                return

    # -------- entry points --------

    def schedule_new(self, rcb: RequestControlBlock) -> None:
        rcb.sid = self._sid_allocator.allocate()
        if isinstance(rcb.current_instruction(), PullCache):
            self.waiting.appendleft(rcb)
        else:
            self.waiting.append(rcb)
        self._stamp_queue_begin(rcb)

    def schedule_running(self, rcb: RequestControlBlock) -> None:
        self.running.append(rcb)
        self._stamp_queue_end(rcb)

    # -------- the step --------

    def step(self) -> BatchRequest:
        self.step_cnt += 1
        cap = self.config.max_running_requests - self._migrating_cnt
        while len(self.running) < cap and self.waiting:
            self.schedule_running(self.waiting.popleft())
        # overload window: PullCache requests bypass the cap so the peer
        # node's sender blocks can drain (cross-node deadlock avoidance)
        while (len(self.running) < cap + self.max_overload_requests
               and self.waiting
               and isinstance(self.waiting[0].current_instruction(), PullCache)):
            self.schedule_running(self.waiting.popleft())

        self._running_cnt = len(self.running)
        if not self.running:
            return BatchRequest()

        # 1. allocate caches; skip prefix-cache-matched prefill spans
        for rcb in self.running:
            inst = rcb.current_instruction()
            if isinstance(inst, Fill):
                if rcb.virtual_kv_cache is None:
                    rcb.virtual_kv_cache = \
                        self.kv_cache_manager.allocate_virtual_cache(inst.hashes)
                    assert rcb.virtual_kv_cache.n_cache_tokens <= len(inst.token_ids)
                    # always recompute at least the last prompt token so the
                    # sample chain stays intact on a full prefix hit
                    n_matched = min(rcb.virtual_kv_cache.n_cache_tokens,
                                    len(inst.token_ids) - 1)
                    if n_matched > 0:
                        inst.chunk_prefill(n_matched)
                        rcb.step()  # the matched span needs no compute
                inst = rcb.current_instruction()
                if isinstance(inst, Fill):
                    self.kv_cache_manager.realloc(
                        rcb.virtual_kv_cache,
                        max(rcb.virtual_kv_cache.n_cache_tokens,
                            max(inst.cache_ids) + 1))
            elif isinstance(inst, ImageEmbed):
                if rcb.virtual_image_cache is None:
                    rcb.virtual_image_cache = \
                        self.image_cache_manager.allocate_virtual_cache()
                self.image_cache_manager.realloc(
                    rcb.virtual_image_cache,
                    max(rcb.virtual_image_cache.n_cache_tokens,
                        max(inst.cache_ids) + 1))

        # 2. classify
        embed_seqs, prefill_seqs, decode_seqs, this_step, next_step = [], [], [], [], []
        for rcb in self.running:
            inst = rcb.current_instruction()
            if isinstance(inst, Fill):
                (decode_seqs if len(inst.token_ids) == 1 else prefill_seqs).append(rcb)
            elif isinstance(inst, ImageEmbed):
                embed_seqs.append(rcb)
            else:
                this_step.append(rcb)  # migrations / pulls always run

        # 3. pack under budgets
        n_images = 0
        for rcb in embed_seqs:
            if n_images < self.image_budget:
                this_step.append(rcb)
                n_images += len(rcb.current_instruction().images_size)
            else:
                next_step.append(rcb)

        fill_seqs = (prefill_seqs + decode_seqs if self.config.priority == "prefill"
                     else decode_seqs + prefill_seqs)
        n_tokens = 0
        for rcb in fill_seqs:
            inst = rcb.current_instruction()
            t = len(inst.token_ids)
            if n_tokens + t <= self.token_budget:
                this_step.append(rcb)
                n_tokens += t
            elif (n_tokens < self.token_budget and t > 1
                  and self.config.chunked_prefill):
                chunk = self.token_budget - n_tokens
                inst.chunk_prefill(chunk)
                this_step.append(rcb)
                n_tokens += chunk
            elif n_tokens == 0:
                # a single oversized prefill must not starve
                this_step.append(rcb)
                n_tokens += t
            else:
                next_step.append(rcb)

        if self.config.debug:
            logger.debug(
                f"step {self.step_cnt}: batch="
                + " ".join(f"{rcb.sid}:{rcb.current_instruction()!r}" for rcb in this_step)
                + f" images={n_images} tokens={n_tokens}")

        self.running = next_step
        return BatchRequest(this_step)

    def metrics(self) -> BatchSchedulerMetrics:
        return BatchSchedulerMetrics(self._running_cnt, self._migrating_cnt)
