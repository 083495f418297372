"""Per-chip-group engine node (reference: hydrainfer/cluster/epdnode.py).

Single-controller re-design: instead of one Ray actor per GPU in its own
process, every node is an asyncio actor inside the controller process, bound
to a device subset (its mesh) of the pod slice. Consequences, all deliberate:

  - migration control plane = plain (async) method calls between nodes;
  - migration data plane   = gather blocks on the source device →
    jax.device_put onto the destination device (ICI same host, DCN across
    hosts) → scatter into destination blocks. This replaces both the
    CUDA-IPC path (reference: memory/communication.py:23-47) and the NCCL
    isend/irecv path (:50-75) behind one mechanism; transfers are issued
    asynchronously and overlap compute exactly like the reference's
    dedicated migrate stream;
  - no NCCL world/rendezvous: the controller already sees every device.

Behavioral contract preserved: cache sizing from free HBM with utilization
splits (reference: epdnode.py:102-127), SLO budget profiling at startup,
1ms step cadence, 5s perf monitor, the 4-step migration protocol with
migrating-count OOM guards and self-migration short-circuit, per-request
latency stamps.
"""
import asyncio
import copy
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

from ..engine.executor import InstructionExecutor
from ..engine.isa import (EmptyInstruction, EPMigrate, Fill, ImageEmbed,
                          MigrateRequest, PullCache)
from ..engine.metric import log_latency_breakdown
from ..engine.profiler import BatchSchedulerProfiler, BatchSchedulerProfilerConfig
from ..engine.rcb import BatchRequest, RequestControlBlock
from ..engine.request_processor import (RequestProcessParameters,
                                        RequestProcessor,
                                        RequestProcessorConfig,
                                        RequestProcessorObserver)
from ..engine.scheduler import BatchScheduler, BatchSchedulerConfig
from ..engine.scenario import ScenarioType
from ..engine.worker import VanillaWorker, WorkerConfig
from ..memory import TokenCacheBlockManager, TokenCacheBlockManagerConfig
from ..models.factory import ModelFactory, ModelFactoryConfig, getModelFactory
from ..utils import hostprof
from ..utils.logger import getLogger
from .loadbalancer import CompositeLoadBalancer, LoadBalancer, LoadBalancerConfig
from .migrate import MigrateGraph, NodeType

logger = getLogger(__name__)


@dataclass
class NodeConfig:
    model: ModelFactoryConfig = field(default_factory=ModelFactoryConfig)
    batch_scheduler: BatchSchedulerConfig = field(default_factory=BatchSchedulerConfig)
    request_processor: RequestProcessorConfig = field(default_factory=RequestProcessorConfig)
    profiler: BatchSchedulerProfilerConfig = field(
        default_factory=lambda: BatchSchedulerProfilerConfig(enabled=False))
    kv_block_size: int = 16
    image_block_size: int = -1        # -1 = one image's worth of tokens
    n_kv_blocks: int = -1             # -1 = size from free HBM
    n_image_blocks: int = -1
    hbm_utilization: float = 0.9
    # jax.Ref in-place KV cache (single-device nodes); False = the
    # value/donation path. Round-5 forensics (PERF_NOTES): on the tunneled
    # TPU a Ref-mutating program chain SERIALIZES D2H reads against all
    # enqueued compute, while donated value buffers stream reads at the
    # producer's completion — the strict-streaming preset (small fused
    # windows, deep pipeline) therefore requires False. Throughput at the
    # default K=16 schedule measures equal either way (2129 ref / 2138
    # value at the 7B headline).
    kv_cache_ref: bool = True
    log_latency_breakdown: bool = False
    tpot_slo: float = 0.4
    step_interval_s: float = 0.001
    perf_monitor_interval_s: float = 5.0
    # async decode pipeline depth: how many fill steps may be in flight
    # before the host reads their sampled tokens. >=2 keeps the device busy
    # across the host's build/dispatch gap; tokens stream out ~depth steps
    # late. 0 restores fully synchronous stepping.
    async_pipeline_depth: int = 2
    # batch the device→host token reads: postprocess every K fill steps with
    # ONE concatenated transfer. On the tunneled TPU a same-thread read
    # costs ~1 full device step regardless of pipeline lag (transfers queue
    # behind enqueued compute), so amortizing it K× is the big lever.
    # Streaming latency grows to ~K device steps. 1 = read every step.
    postprocess_batch_steps: int = 4
    # adapt K to load: read every step when lightly loaded (streaming
    # latency dominates, the read overhead is paid on a small batch), the
    # full K when saturated (throughput-bound; reference SLO metric is
    # per-token TBT, benchmark/benchmark.py:39-40). postprocess_batch_steps
    # becomes the CAP.
    adaptive_postprocess: bool = True
    # fused multi-step decode: when a scheduled batch is pure decode, run
    # up to this many chained decode steps in ONE device program (geometry
    # advances on device, tokens flow through the token table) — the TPU
    # analogue of replaying the reference's all-decode CUDA graph K times.
    # Engine A/B on chip: 2.24x at K=4, 2.39x at K=8 (paired, b32) — the
    # per-dispatch tunnel/host cost dominated the decode step. 1 = off.
    # With the incremental pipeline K=16 is another 1.34x over K=8 (the
    # batched flush used to idle the device through a 2-window read, which
    # is what capped K at 8 — round-3 chip A/B, PERF_NOTES). 1 = off.
    # The executor shrinks the window when requests run out of pre-created
    # decode Fills or KV blocks; under adaptive_postprocess the window also
    # shrinks at light load (streaming latency over throughput).
    multi_step_decode: int = 16
    # n-gram speculative decoding (prompt-lookup; greedy batches only):
    # propose up to this many draft tokens per request from the request's
    # own context and verify them in ONE device step — each accepted draft
    # is a ~free token (decode is weight-read-bound). 0 = off. The verify
    # step is synchronous (acceptance gates the cursor), so it suits
    # latency-bound/low-batch serving (spec_max_batch); the fused window
    # remains the throughput path. DEEP drafts amortize the fixed verify
    # round-trip: measured chip A/B at batch 2 on lookup-friendly prompts
    # is 1.46x at k=3 but 1.85x at k=12 — extra verify rows are nearly
    # free, so the default is deep. Workloads with no n-gram hits are
    # protected by the proposer backoff (executor.spec_backoff).
    spec_ngram_k: int = 12
    spec_ngram_n: int = 3
    # boot-time decode warmup + jit-key floor pre-ratchet. None = follow
    # profiler.enabled. When on, the S/MB high-water floors are raised to
    # the serving envelope (S = max_running_requests; MB = the pool's
    # fair-share context per request, capped at boot_warmup_max_context)
    # BEFORE anything compiles, so the compile set converges at boot
    # instead of re-keying mid-serving (each mid-run ratchet re-compiles
    # both the prefill and fused-decode programs, ~10-25s apiece on the
    # tunneled TPU).
    boot_warmup: Optional[bool] = None
    boot_warmup_max_context: int = 8192
    # also pre-compile one prefill program per token bucket up to the token
    # budget (see profiler.warm_prefill_ladder) — with max_q collapsed to T
    # this closes the whole greedy prefill key space at boot, so online
    # serving under arbitrary arrival mixes never compiles mid-run. Costs
    # ~log2(budget) extra boot compiles; off by default (offline/bench runs
    # warm their own exact shapes).
    boot_warmup_prefill_ladder: bool = False
    # speculate only when the resident batch is at most this large: the
    # verify step is synchronous (drains the async pipeline), so it trades
    # throughput for latency — a trade that only wins when latency-bound
    spec_max_batch: int = 4
    # how the deferred token reads leave the async pipeline:
    #   "batched"     — ONE concatenated device→host read for every pending
    #                   window once the backlog cap is hit (fewest tunnel
    #                   round-trips, but the flush blocks the step loop with
    #                   nothing newly dispatched: the device idles through
    #                   the whole read+postprocess, and tokens arrive in
    #                   multi-window bursts — BENCH_r02's p99 token gap IS
    #                   the window-pair period)
    #   "incremental" — drain completed windows eagerly and at most ONE
    #                   in-flight window when over the cap, so >=1 window
    #                   stays enqueued on the device during every host
    #                   read/postprocess: device idle time ~0, token bursts
    #                   = one window
    #   "threaded"    — hand read+postprocess to a single reader thread; the
    #                   step loop never blocks on tokens at all (the read
    #                   releases the GIL during the tunnel transfer). On
    #                   small hosts the reader thread can starve the
    #                   runtime's I/O — A/B before defaulting.
    #   "sync"        — read window N's tokens BEFORE dispatching window
    #                   N+1. On a runtime whose D2H transfers queue behind
    #                   ALL enqueued compute (the tunneled TPU — hostprof
    #                   event traces show a "ready" window's 4KB read
    #                   blocking a further 278ms behind the freshly
    #                   dispatched next window), lookahead POISONS every
    #                   read; the naive synchronous order pays one
    #                   read-round-trip of device idle per window and
    #                   nothing else.
    pipeline_mode: str = "incremental"
    # legacy alias for pipeline_mode="threaded"
    threaded_postprocess: bool = False
    # threaded mode: max windows in flight before the loop blocks (bounds
    # token-delivery/termination staleness to ~this many windows)
    max_threaded_backlog: int = 4
    # layer-chunked ViT encode: split one encode batch's tower into
    # segments of this many layers, one segment dispatched per engine step,
    # so resident decode windows enter the device queue BETWEEN segments
    # instead of waiting out the whole ViT forward (the head-of-line
    # interference the EPD split exists for — reference motivation:
    # hydrainfer/engine/profiler.py:195-240). 0 = off (whole tower in one
    # program). Requires a fixed-resolution vision model with the segment
    # API (models/llava.py); others silently run unchunked.
    encode_chunk_layers: int = 0
    # while a chunked encode is in flight, cap the fused decode window at
    # this many steps: segments advance once per engine step, so a full
    # K=16 window between segments couples the encode's duration to the
    # decode cadence (measured: 4-segment CLIP-L stretched over 5 windows
    # ~650 ms vs ~120 ms monolithic — encode throughput collapses). A
    # short window keeps segments flowing at ~window/4 cadence while
    # decodes still interleave. 0 = no cap.
    encode_chunk_window: int = 4
    token_table_size: int = 4096
    # reference parity: a failed migrate RPC is retried against the next
    # balancer target this many times before the request is terminated
    # (reference retries twice, epdnode.py:428-442)
    migrate_retries: int = 2


@dataclass
class NodeContext:
    name: str = "node0"
    node_type: NodeType = field(default_factory=NodeType)
    # one jax.Device, or a LIST of devices → the node forms a parallel mesh
    # over them: "tp" (weights + kv-head axis sharded, GSPMD collectives)
    # or "pp" (layer stages, ppermute relay — parallel/pipeline.py)
    device: Optional[object] = None
    parallel: str = "tp"
    migrate_graph: Optional[MigrateGraph] = None


class BatchSchedulerObserver(RequestProcessorObserver):
    def __init__(self, scheduler: BatchScheduler):
        self.scheduler = scheduler

    def update(self, rcb: RequestControlBlock) -> None:
        self.scheduler.schedule_new(rcb)


def adaptive_postprocess_k(n_running: int, n_waiting: int,
                           max_running: int, k_max: int) -> int:
    """Token-read batching factor under the current load.

    Saturated (requests queued, or the running set near the batch cap) →
    throughput-bound: amortize the ~1-step read cost over the full k_max.
    Nearly idle → per-token streaming (the read is paid on a small, fast
    batch and TBT burstiness hurts the per-token SLO). In between, half.
    """
    if n_waiting > 0 or n_running >= max(1, int(0.75 * max_running)):
        return k_max
    if n_running <= 2:
        return 1
    return max(1, k_max // 2)


class AsyncEPDNode:
    def __init__(self, config: NodeConfig, context: NodeContext):
        self.config = config
        self.context = context
        self.name = f"{context.node_type}Node:{context.name}"
        dev = context.device or jax.devices()[0]
        self.mesh = None
        if isinstance(dev, (list, tuple)):
            if len(dev) > 1:
                from ..parallel.mesh import make_mesh
                axis = context.parallel
                assert axis in ("tp", "pp"), axis
                self.mesh = make_mesh(axis_names=("dp", axis),
                                      shape=(1, len(dev)), devices=list(dev))
            dev = dev[0]
        self.device = dev
        self._stop = False
        self._tasks = []

    # ---------------- init ----------------

    def init(self, model_factory: Optional[ModelFactory] = None) -> None:
        nt = self.context.node_type
        if (model_factory is None and nt.has_language_model
                and self.config.model.layer_loop == "auto"
                and self.config.model.attention_impl != "layered"):
            # engine-owned LMs run the unrolled layer loop over a per-layer
            # cache: the attention kernel operand is a per-layer buffer
            # (static offset-0 slice) so the step cost no longer scales with
            # total pool size (PERF_NOTES.md: dynamic cache[layer] slices
            # cost ~3.2ms/GB/step under lax.scan)
            self.config.model.layer_loop = "unroll"
        self.model_factory = model_factory or getModelFactory(self.config.model)
        self.language_config = self.model_factory.getLanguageModelConfig()
        self.vision_config = self.model_factory.getVisionModelConfig()
        # prefix-hash granularity must equal the KV block size (executor
        # indexes inst.hashes by cache_id // kv_block_size)
        if self.config.request_processor.block_size != self.config.kv_block_size:
            self.config.request_processor.block_size = self.config.kv_block_size

        self.worker = VanillaWorker(
            WorkerConfig(enable_vision=nt.has_vision_model,
                         enable_language=nt.has_language_model),
            self.model_factory)
        self._init_caches()
        self.executor = InstructionExecutor(
            self.kv_cache_manager, self.image_cache_manager, self.worker,
            self.model_factory, token_table_size=self.config.token_table_size,
            encode_chunk_layers=self.config.encode_chunk_layers)
        self._pending_fills = []
        # in-flight background cache pulls (see _execute_pull_cache):
        # decode steps keep running while a migrated request's blocks are
        # in transit (overlap the transfer with compute — the reference
        # overlaps NCCL isend/irecv on a dedicated migrate stream,
        # memory/communication.py:50-75)
        self._pull_tasks: set = set()
        self._pull_stats = {"n": 0, "seconds": 0.0, "bytes": 0}
        self._post_pool = None
        if (self.config.threaded_postprocess
                or self.config.pipeline_mode == "threaded"):
            from concurrent.futures import ThreadPoolExecutor
            # single worker: postprocess stays strictly FIFO
            self._post_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix=f"{self.name}-post")

        n_img_tokens = self.vision_config.image_token_calculator \
            .get_num_image_tokens((336, 336)) or 576
        profiler = BatchSchedulerProfiler(
            self.config.profiler, self.executor,
            self.kv_cache_manager, self.image_cache_manager,
            n_image_tokens=n_img_tokens)
        boot_warm = (self.config.boot_warmup
                     if self.config.boot_warmup is not None
                     else self.config.profiler.enabled)
        if (boot_warm and nt.has_kv_cache
                and self.worker.supports_multi_step()):
            # pre-ratchet the jit-key floors to the serving envelope first,
            # so every compile (budget probes, warm_decode, live traffic)
            # lands on the converged key set
            max_running = self.config.batch_scheduler.max_running_requests
            kv = self.kv_cache_manager
            fair_ctx = kv.n_blocks * kv.block_size // max(1, max_running)
            fair_ctx = min(fair_ctx, self.config.boot_warmup_max_context)
            mb_floor = -(-fair_ctx // kv.block_size)
            self.executor.fill_executor.preratchet(max_running, mb_floor)
        image_budget = profiler.profile_image_budgets()
        token_budget = profiler.profile_token_budgets()
        if (boot_warm and nt.has_kv_cache and nt.has_image_cache
                and self.worker.supports_multi_step()):
            # Ti (image-feature gather width) floor: image-bearing fill
            # batches otherwise compile per encode/prefill interleaving
            # (timing-nondeterministic). The widest gather one batch can
            # carry is bounded by both the image budget's tokens and the
            # fill token budget.
            ti_floor = min(image_budget * n_img_tokens, token_budget)
            self.executor.fill_executor.preratchet(1, 1, ti_floor)
        if (boot_warm and nt.has_kv_cache
                and self.worker.supports_multi_step()):
            try:
                profiler.warm_decode(
                    self.config.batch_scheduler.max_running_requests,
                    max(self.config.multi_step_decode, 1))
                if self.config.boot_warmup_prefill_ladder:
                    profiler.warm_prefill_ladder(token_budget)
            except Exception:
                logger.exception("decode warmup failed; serving will "
                                 "compile on first requests instead")

        self.batch_scheduler = BatchScheduler(
            self.config.batch_scheduler,
            self.kv_cache_manager, self.image_cache_manager,
            image_budget=image_budget, token_budget=token_budget)

        self.request_processor = RequestProcessor(
            self.config.request_processor, self.model_factory)
        self.request_processor.register_observer(
            BatchSchedulerObserver(self.batch_scheduler))

        self.ep_loadbalancer = CompositeLoadBalancer()
        self.pd_loadbalancer = CompositeLoadBalancer()
        if self.context.migrate_graph is not None:
            self.update_migrate_graph(self.context.migrate_graph)
        logger.info(f"{self.name} initialized on {self.device} "
                    f"(budgets: {image_budget} images, {token_budget} tokens)")

    def _free_hbm_bytes(self) -> Optional[int]:
        stats = self.device.memory_stats() if hasattr(self.device, "memory_stats") else None
        if not stats or "bytes_limit" not in stats:
            return None
        free = stats["bytes_limit"] - stats.get("bytes_in_use", 0)
        return int(free * self.config.hbm_utilization)

    def _init_caches(self) -> None:
        nt = self.context.node_type
        lc = self.language_config
        image_block_size = self.config.image_block_size
        if image_block_size == -1:
            image_block_size = self.vision_config.image_token_calculator \
                .get_num_image_tokens((336, 336)) or 576

        # combined-head layout (K even / V odd on one head axis) — the
        # native layout of the TPU ragged paged attention kernel
        kv_dtype = ("int8" if self.config.model.kv_cache_dtype == "int8"
                    else self.config.model.dtype)
        # per-layer cache buffers iff the LM actually runs the unrolled
        # layer loop (the two must agree; detect from the built model so
        # externally-supplied factories are honored)
        lm_cfg = getattr(getattr(self.worker, "language_model", None), "cfg", None)
        # pp shards the STACKED layer axis of one cache array, so it
        # overrides the unroll layout's per-layer buffer list
        unrolled = (getattr(lm_cfg, "layer_loop", "scan")
                    in ("unroll", "unroll_stacked")
                    and not (self.mesh is not None
                             and self.context.parallel == "pp"))
        # MLA latent caches hold ONE plane per token (kv_single_plane);
        # everything else interleaves K/V on the head axis (2x). The latent
        # dim pads up to a 128 lane multiple (DeepSeek: 576 → 640, ~11% of
        # the latent plane) so the Pallas latent kernel can DMA pages —
        # Mosaic cannot slice a lane axis that is not 128-aligned; the
        # model pads q and [c_kv|k_pe] with zeros to the cache dim, which
        # leaves attention scores bit-identical (models/decoder.py).
        single_plane = getattr(lc, "kv_single_plane", False)
        kv_heads = lc.n_kv_heads if single_plane else 2 * lc.n_kv_heads
        cache_head_dim = (-(-lc.head_dim // 128) * 128 if single_plane
                          else lc.head_dim)
        kv_cfg = TokenCacheBlockManagerConfig(
            n_layers=lc.n_layers, n_tensors=1,
            n_blocks=max(self.config.n_kv_blocks, 1),
            block_size=self.config.kv_block_size,
            n_heads=kv_heads, head_dim=cache_head_dim,
            dtype=kv_dtype,
            per_layer=unrolled,
            # jax.Ref in-place cache: avoids scan-carry copies (~3ms/GB per
            # step); sharded (TP) caches stay on the value/donation path, and
            # the layered kernel reads the cache VALUE (pallas can't take a
            # Ref operand on this jax), so it forces the value path too.
            # Single-plane (MLA) caches also default to the value path: the
            # latent kernel only engages on value arrays, it is a paired
            # 1.75x over the oracle at engine level (PERF_NOTES round 3),
            # and the latent pool is ~9x smaller so the Ref's copy savings
            # are proportionally small
            use_ref=(self.config.kv_cache_ref and self.mesh is None
                     and self.config.model.attention_impl != "layered"
                     and not single_plane))
        img_cfg = TokenCacheBlockManagerConfig(
            n_layers=1, n_tensors=1,
            n_blocks=max(self.config.n_image_blocks, 1),
            block_size=image_block_size,
            n_heads=lc.n_qo_heads, head_dim=lc.head_dim,
            dtype=self.config.model.dtype)

        if self.config.n_kv_blocks == -1 or self.config.n_image_blocks == -1:
            free = self._free_hbm_bytes()
            if free is not None:
                # activation headroom per resident model, then cache split
                # (reference: epdnode.py:105-123)
                act = 0.1 * nt.has_vision_model + 0.1 * nt.has_language_model
                cache_frac = 1.0 - act
                if nt.has_image_cache and nt.has_kv_cache:
                    img_frac, kv_frac = cache_frac * 0.1, cache_frac * 0.8
                elif nt.has_image_cache:
                    img_frac, kv_frac = cache_frac, 0.0
                else:
                    img_frac, kv_frac = 0.0, cache_frac
                if self.config.n_kv_blocks == -1 and nt.has_kv_cache:
                    kv_cfg.n_blocks = max(1, TokenCacheBlockManager.compute_n_blocks(
                        kv_cfg, int(free * kv_frac)))
                if self.config.n_image_blocks == -1 and nt.has_image_cache:
                    img_cfg.n_blocks = max(1, TokenCacheBlockManager.compute_n_blocks(
                        img_cfg, int(free * img_frac)))
                logger.info(f"{self.name} auto cache sizing: free={free} "
                            f"kv_blocks={kv_cfg.n_blocks} image_blocks={img_cfg.n_blocks}")
            else:
                if self.config.n_kv_blocks == -1:
                    kv_cfg.n_blocks = 1024
                if self.config.n_image_blocks == -1:
                    img_cfg.n_blocks = 64
                logger.info(f"{self.name} no memory stats; default cache sizing")

        self.kv_cache_manager = (TokenCacheBlockManager(kv_cfg, self.device, self.name)
                                 if nt.has_kv_cache else None)
        self.image_cache_manager = (TokenCacheBlockManager(img_cfg, self.device, self.name)
                                    if nt.has_image_cache else None)
        if self.mesh is not None:
            lm = getattr(self.worker, "language_model", None)
            if self.context.parallel == "pp":
                from ..parallel.pipeline import pp_shard_cache
                if self.kv_cache_manager is not None:
                    self.kv_cache_manager.cache_array = pp_shard_cache(
                        self.kv_cache_manager.cache_array, self.mesh)
                if lm is not None and hasattr(lm, "shard_to_pp"):
                    lm.shard_to_pp(self.mesh)
                    logger.info(f"{self.name} pipeline-parallel over "
                                f"{self.mesh.devices.size} stages")
            else:
                from ..parallel.mesh import shard_kv_cache
                if self.kv_cache_manager is not None:
                    self.kv_cache_manager.cache_array = shard_kv_cache(
                        self.kv_cache_manager.cache_array, self.mesh)
                if lm is not None and hasattr(lm, "shard_to"):
                    lm.shard_to(self.mesh)
                    logger.info(f"{self.name} tensor-parallel over "
                                f"{self.mesh.devices.size} devices")

    def update_migrate_graph(self, graph: MigrateGraph) -> None:
        self.context.migrate_graph = graph
        self.ep_loadbalancer = CompositeLoadBalancer()
        self.pd_loadbalancer = CompositeLoadBalancer()
        for lb in (self.ep_loadbalancer, self.pd_loadbalancer):
            for scenario in ScenarioType:
                lb.register_loadbalancer(scenario, LoadBalancer(LoadBalancerConfig("round")))
        for table, lb in ((graph.ep_table.get(self.name, []), self.ep_loadbalancer),
                          (graph.pd_table.get(self.name, []), self.pd_loadbalancer)):
            for mnode in table:
                # tight-SLO nodes serve both scenarios; others only Relaxed
                if mnode.tpot_slo < 0.05:
                    lb.register_worker(ScenarioType.Strict, mnode)
                lb.register_worker(ScenarioType.Relaxed, mnode)

    # ---------------- request intake ----------------

    async def add_request(self, request, params: RequestProcessParameters) -> None:
        request.sampling_params.eos_token_ids = list(request.sampling_params.eos_token_ids)
        self.request_processor.process(request, params)

    # ---------------- the hot loop ----------------

    async def step(self) -> None:
        with hostprof.span("node.schedule"):
            batch = self.batch_scheduler.step()
        if len(batch) == 0:
            # a chunked encode must keep advancing even with nothing else
            # scheduled (its own requests are parked inside the executor —
            # and on finish they MUST rejoin the scheduler, or they're lost)
            self._finish_or_requeue(self._encode_tick())
            # idle: drain the async pipeline so trailing tokens reach their
            # output processors
            self.flush_fills()
            return

        fills, embeds, empties, migrates, pulls = (BatchRequest() for _ in range(5))
        for rcb, inst in batch:
            if isinstance(inst, Fill):
                fills.append(rcb)
            elif isinstance(inst, ImageEmbed):
                embeds.append(rcb)
            elif isinstance(inst, MigrateRequest):
                migrates.append(rcb)
            elif isinstance(inst, PullCache):
                pulls.append(rcb)
            elif isinstance(inst, EmptyInstruction):
                empties.append(rcb)
            else:
                raise RuntimeError(f"unsupported instruction {type(inst)}")

        if self.config.log_latency_breakdown:
            self._stamp_execute_begin(fills, embeds)

        migrate_tasks = [asyncio.create_task(self._execute_batch_migrate(migrates)),
                         asyncio.create_task(self._execute_pull_cache(pulls))]
        # device programs dispatch asynchronously; encode and fill overlap.
        # Fill postprocessing (the host read of sampled tokens) is deferred
        # through a bounded pipeline so back-to-back decode steps never wait
        # on the host — the device feeds itself through the token table.
        # FILLS DISPATCH FIRST: the decode window enters the device queue
        # ahead of this step's ViT encode, so resident decodes never wait
        # behind an encode they don't depend on (an embed's own prefill
        # only runs in a LATER step, so ordering encode after fills is
        # always dependency-safe).
        if len(fills):
            if self.config.pipeline_mode == "sync":
                # resolve the previous window before dispatching this one:
                # its read then never queues behind fresh compute
                self.flush_fills()
            spec_done = False
            fx = self.executor.fill_executor
            if (self.config.spec_ngram_k > 0
                    and len(fills) <= self.config.spec_max_batch
                    and fx.spec_precheck(fills, self.config.spec_ngram_k)
                    and fx.spec_should_try()):
                # the cheap precheck gates the (synchronous) verify path so
                # never-speculating workloads don't pay the pipeline drain;
                # the drain itself must precede the proposer (token order +
                # context completeness)
                self.flush_fills()
                spec_done = fx.execute_spec(
                    fills, self.config.spec_ngram_k,
                    self.config.spec_ngram_n) is not None
            if not spec_done:
                n_steps = self.config.multi_step_decode
                iee_busy = (self.executor.image_embed_executor is not None
                            and self.executor.image_embed_executor.busy)
                if iee_busy and self.config.encode_chunk_window > 0:
                    n_steps = min(n_steps, self.config.encode_chunk_window)
                if self.config.adaptive_postprocess and n_steps > 1:
                    # same load policy as the read batching: full fused
                    # window when throughput-bound, single steps when
                    # streaming-bound
                    n_steps = min(n_steps, adaptive_postprocess_k(
                        self.batch_scheduler.n_resident,
                        len(self.batch_scheduler.waiting),
                        self.batch_scheduler.config.max_running_requests,
                        n_steps))
                fut = self.executor.execute_fill(fills, n_steps=n_steps)
                if self._post_pool is not None:
                    # hand the device→host read to the reader thread; the
                    # step loop keeps dispatching
                    self._pending_fills.append(self._post_pool.submit(fut.get))
                else:
                    self._pending_fills.append(fut)
        else:
            self.flush_fills()
        # chunked encode: dispatch the in-flight tower's next segment AFTER
        # this step's fills (decode windows stay ahead of it in the device
        # queue), and route new embeds into the chunked state machine
        finished_encode = self._encode_tick()
        iee = self.executor.image_embed_executor
        if len(embeds) and iee is not None and iee.chunking_enabled():
            if iee.busy:
                # encoder occupied: embeds return to the scheduler
                for rcb, _ in embeds:
                    self.batch_scheduler.schedule_running(rcb)
            else:
                iee.start_chunked(embeds)
            embeds = BatchRequest()   # parked in the executor (or requeued)
        else:
            embed_future = self.executor.execute_image_embed(embeds) \
                if len(embeds) else self.executor.execute_empty(embeds)
            embed_future.get()
        self.executor.execute_empty(empties)
        self._drain_pipeline()
        await asyncio.gather(*migrate_tasks)

        if self.config.log_latency_breakdown:
            self._stamp_execute_end(fills, embeds)

        # pulls are NOT rejoined here — their background task re-enqueues
        # them when the transfer lands (_pull_one)
        for b in (embeds, fills, empties, finished_encode):
            self._finish_or_requeue(b)

    def _finish_or_requeue(self, b: BatchRequest) -> None:
        now = time.perf_counter()
        for rcb, _ in b:
            if rcb.is_finished():
                rcb.metric.finished_time = now
                self._free_cache(rcb)
                if self.config.log_latency_breakdown:
                    log_latency_breakdown(rcb.metric)
            else:
                self.batch_scheduler.schedule_running(rcb)

    def _encode_tick(self):
        """Advance an in-flight chunked encode by one segment; returns the
        finished batch (to rejoin the scheduler) or an empty one."""
        iee = self.executor.image_embed_executor
        if iee is None or not iee.busy:
            return BatchRequest()
        done = iee.advance()
        if done is None:
            return BatchRequest()
        if self.config.log_latency_breakdown:
            now = time.perf_counter()
            for rcb, _ in done:
                rcb.metric.encode_execute.append(now)
        return done

    def _stamp_execute_begin(self, fills: BatchRequest, embeds: BatchRequest) -> None:
        now = time.perf_counter()
        self._stamped = []
        for rcb, inst in fills:
            self._stamped.append((rcb, inst))
            span = (rcb.metric.prefill_execute if len(inst.token_ids) > 1
                    else rcb.metric.decode_execute)
            if not span:
                span.append(now)
        for rcb, _ in embeds:
            # open a span only if none is open (a chunked-encode bounce may
            # hand the same ImageEmbed out more than once)
            if len(rcb.metric.encode_execute) % 2 == 0:
                rcb.metric.encode_execute.append(now)

    def _stamp_execute_end(self, fills: BatchRequest, embeds: BatchRequest) -> None:
        now = time.perf_counter()
        for rcb, inst in self._stamped:
            span = (rcb.metric.prefill_execute if len(inst.token_ids) > 1
                    else rcb.metric.decode_execute)
            if len(span) == 1:
                span.append(now)
            elif len(span) > 1:
                span[1] = now
        for rcb, _ in embeds:
            rcb.metric.encode_execute.append(now)

    async def start(self) -> None:
        if self._tasks and not self._stop:
            return          # idempotent: re-wired by a recovering cluster
        self._stop = False
        self._tasks = [asyncio.create_task(self.step_loop()),
                       asyncio.create_task(self.perf_monitor_loop())]

    async def stop(self) -> None:
        self._stop = True
        for t in self._tasks:
            t.cancel()
        for t in list(self._pull_tasks):
            t.cancel()

    async def step_loop(self) -> None:
        while not self._stop:
            try:
                await self.step()
            except Exception:
                logger.exception(f"{self.name} step failed")
                raise
            await asyncio.sleep(self.config.step_interval_s)

    async def perf_monitor_loop(self) -> None:
        while not self._stop:
            parts = [f"{self.name} perf:"]
            if self.kv_cache_manager:
                parts.append(f"kv={self.kv_cache_manager.metrics()}")
            if self.image_cache_manager:
                parts.append(f"image={self.image_cache_manager.metrics()}")
            parts.append(f"sched={self.batch_scheduler.metrics()}")
            fx = getattr(self.executor, "fill_executor", None)
            if fx is not None and getattr(fx, "spec_steps", 0):
                parts.append(
                    f"spec={fx.spec_tokens}tok/{fx.spec_steps}steps "
                    f"({fx.spec_tokens / max(fx.spec_steps, 1):.2f} tok/step)")
            logger.info(" ".join(parts))
            await asyncio.sleep(self.config.perf_monitor_interval_s)

    # ---------------- 4-step migration protocol ----------------
    # 1. sender picks a target and hands over the RCB (with its virtual
    #    caches still pointing at the sender's blocks)
    def _drain_pipeline(self) -> None:
        """Post-dispatch pipeline maintenance (once per step). Keeps the
        async fill pipeline bounded per config.pipeline_mode — see the
        NodeConfig docs for the three modes' trade-offs."""
        if not self._pending_fills:
            return
        cfg = self.config
        if self._post_pool is not None:
            # reader thread owns read+postprocess; reap finished entries and
            # bound the backlog so token/termination staleness stays finite
            while self._pending_fills and self._pending_fills[0].done():
                self._pending_fills.pop(0).result()
            while len(self._pending_fills) > cfg.max_threaded_backlog:
                self._wait_one()
            return
        # Backlog is counted in DEVICE STEPS, not pipeline entries: a fused
        # window already covers n_steps decode steps, so one read per ~k
        # steps (the amortization target) means draining as soon as ≥k
        # steps are pending — while keeping ≥2 entries in flight so the
        # device always has a dispatched program to run during the host's
        # read+postprocess.
        k = cfg.postprocess_batch_steps
        if cfg.adaptive_postprocess:
            k = adaptive_postprocess_k(
                self.batch_scheduler.n_resident,
                len(self.batch_scheduler.waiting),
                self.batch_scheduler.config.max_running_requests, k)
        backlog_steps = max(cfg.async_pipeline_depth, k)
        if cfg.pipeline_mode == "incremental":
            if hostprof.events_enabled:
                # window-completion probe: first is_ready=True per window
                for f in self._pending_fills:
                    dev = getattr(f, "sampled_dev", None)
                    if (dev is not None and not getattr(f, "_seen_ready", False)
                            and dev.is_ready()):
                        f._seen_ready = True
                        hostprof.event("ready", getattr(f, "win_id", None))
            # completed windows first (their read is a bare transfer)...
            with hostprof.span("node.drain_ready"):
                while self._pending_fills:
                    dev = getattr(self._pending_fills[0], "sampled_dev", None)
                    if dev is None or not dev.is_ready():
                        break
                    self._wait_one()
            # ...then force at most the backlog overflow, oldest first, so
            # at least one later window stays enqueued on the device
            # through each blocking read
            pending = sum(getattr(f, "n_steps", 1)
                          for f in self._pending_fills)
            with hostprof.span("node.drain_forced"):
                while pending > backlog_steps and len(self._pending_fills) >= 2:
                    pending -= getattr(self._pending_fills[0], "n_steps", 1)
                    self._wait_one()
            return
        pending_steps = sum(getattr(f, "n_steps", 1)
                            for f in self._pending_fills)
        if pending_steps > backlog_steps and len(self._pending_fills) >= 2:
            self.flush_fills()

    def _wait_one(self) -> None:
        item = self._pending_fills.pop(0)
        if hasattr(item, "result"):  # concurrent.futures.Future (reader thread)
            item.result()
        else:
            item.get()

    def flush_fills(self) -> None:
        """Drain the async fill pipeline: ONE batched device→host read for
        all pending steps' sampled tokens, then their host postprocessing
        in dispatch order."""
        if not self._pending_fills:
            return
        import numpy as np

        from ..engine.executor import postprocess_plan
        batched = [f for f in self._pending_fills
                   if getattr(f, "plan", None) is not None]
        if len(batched) == len(self._pending_fills) and len(batched) > 1:
            import jax.numpy as jnp
            arrs = [f.sampled_dev for f in batched]
            flat = np.asarray(jnp.concatenate(arrs))
            off = 0
            for f in batched:
                n = f.sampled_dev.shape[0]
                postprocess_plan(f.plan, flat[off:off + n])
                f._done = True
                off += n
            self._pending_fills.clear()
            return
        while self._pending_fills:
            self._wait_one()

    async def _execute_batch_migrate(self, batch: BatchRequest) -> None:
        if len(batch):
            # migrating RCBs leave this device: resolve their pending tokens
            # on host first (the token table does not travel)
            self.flush_fills()
        for rcb, inst in batch:
            rcb.step()
            assert isinstance(rcb.current_instruction(), PullCache)
            lb = self.ep_loadbalancer if isinstance(inst, EPMigrate) else self.pd_loadbalancer
            target = lb.choice(key=rcb.scenario_type)
            if target.name == self.name:
                rcb.step()  # skip PullCache: nothing to move
                self.batch_scheduler.schedule_running(rcb)
                continue
            self.batch_scheduler.migrating_acquire()
            # a failed handoff is retried against the NEXT balancer target
            # (reference retries twice before terminating, epdnode.py:428-442);
            # landing back on self is a valid outcome — keep it local
            for attempt in range(1 + max(0, self.config.migrate_retries)):
                try:
                    await target.node.migrate(self, rcb)
                    break
                except Exception:
                    logger.exception(
                        f"{rcb.request_id} migrate to {target.name} failed "
                        f"(attempt {attempt + 1})")
                    target = lb.choice(key=rcb.scenario_type)
                    if target.name == self.name:
                        rcb.step()  # skip PullCache: serve locally instead
                        self.batch_scheduler.schedule_running(rcb)
                        self.batch_scheduler.migrating_release()
                        break
            else:
                await self.free_migrate_request(rcb)
                for proc in rcb.output_token_processors:
                    proc.terminate()

    # 2. receiver enqueues the RCB; PullCache jumps the waiting queue
    async def migrate(self, src_node: "AsyncEPDNode", rcb: RequestControlBlock) -> None:
        inst = rcb.current_instruction()
        assert isinstance(inst, PullCache)
        inst.src_node = src_node
        self.batch_scheduler.schedule_new(rcb)

    # 3. receiver pulls the blocks (device-to-device transfer). The pull is
    # a BACKGROUND task: the step loop keeps dispatching decode windows
    # while the blocks are in transit (transfer overlapped with compute;
    # the rcb rejoins the scheduler only when its cache has landed).
    async def _execute_pull_cache(self, batch: BatchRequest) -> None:
        for rcb, inst in batch:
            task = asyncio.create_task(self._pull_one(rcb, inst))
            self._pull_tasks.add(task)
            task.add_done_callback(self._pull_tasks.discard)

    async def _pull_one(self, rcb: RequestControlBlock, inst) -> None:
        t0 = time.perf_counter()
        m = rcb.metric
        (m.ep_transfer if not m.ep_transfer else m.pd_transfer).append(t0)

        src_node: AsyncEPDNode = inst.src_node
        old = copy.copy(rcb)
        # The token-table slot belongs to the SOURCE node's executor;
        # keeping it would make the destination's acquire_slot no-op and
        # later inject a foreign slot id into its free list (two requests
        # could then share one slot). Reset so the destination allocates
        # its own; the source slot is freed via free_migrate_request(old),
        # and the first post-migration decode token is host-resolved by
        # flush_fills so no device-side feedback is lost.
        rcb.token_slot = -1
        nt = self.context.node_type
        # hand the SOURCE's virtual caches off the rcb before pulling: on a
        # failed pull, _free_cache(rcb) must only ever see DESTINATION
        # caches (freeing a source block table against this node's
        # allocator would corrupt it); `old` still carries the source vcs
        # for the source-side free
        src_kv, src_img = rcb.virtual_kv_cache, rcb.virtual_image_cache
        rcb.virtual_kv_cache = rcb.virtual_image_cache = None
        try:
            if src_kv is not None and nt.has_kv_cache:
                rcb.virtual_kv_cache = await self._pull_virtual_cache(
                    src_node, src_kv, is_kv=True)
            if src_img is not None and nt.has_image_cache:
                rcb.virtual_image_cache = await self._pull_virtual_cache(
                    src_node, src_img, is_kv=False)
            await src_node.free_migrate_request(old)
        except Exception:
            logger.exception(f"{rcb.request_id} cache pull from "
                             f"{src_node} failed")
            # best-effort source-side free: without it the source's blocks
            # and its scheduler's migrating reservation leak forever on a
            # transient pull failure — only a truly unreachable source may
            # leak (ADVICE r3)
            try:
                await src_node.free_migrate_request(old)
            except Exception:
                logger.warning(f"{rcb.request_id}: source-side free on "
                               f"{src_node} also failed; its blocks leak")
            self._free_cache(rcb)
            for proc in rcb.output_token_processors:
                proc.terminate()
            return
        rcb.step()

        now = time.perf_counter()
        (m.ep_transfer if len(m.ep_transfer) == 1 else m.pd_transfer).append(now)
        self._pull_stats["n"] += 1
        self._pull_stats["seconds"] += now - t0
        if rcb.is_finished():
            m.finished_time = now
            self._free_cache(rcb)
            if self.config.log_latency_breakdown:
                log_latency_breakdown(m)
        else:
            self.batch_scheduler.schedule_running(rcb)

    async def _pull_virtual_cache(self, src_node, src_vc, is_kv: bool):
        dst_mgr = self.kv_cache_manager if is_kv else self.image_cache_manager
        dst_vc = dst_mgr.allocate_virtual_cache()
        dst_mgr.realloc(dst_vc, src_vc.n_cache_tokens)
        if src_vc.block_table:
            if getattr(src_node, "is_remote", False):
                # cross-process/cross-host data plane: the source gathers its
                # blocks and ships them as one numpy payload over the RPC
                # socket (cluster/process_node.py); scatter lands them on
                # this node's device
                blocks = await src_node.gather_blocks(is_kv, src_vc.block_table)
            else:
                src_mgr = (src_node.kv_cache_manager if is_kv
                           else src_node.image_cache_manager)
                blocks = src_mgr.gather_blocks(src_vc.block_table)
                blocks = jax.device_put(blocks, dst_mgr.device)  # ICI/DCN hop
            self._pull_stats["bytes"] += int(getattr(blocks, "nbytes", 0))
            dst_mgr.scatter_blocks(dst_vc.block_table, blocks)
        return dst_vc

    # 4. sender frees the migrated request's blocks
    async def free_migrate_request(self, rcb: RequestControlBlock) -> None:
        self._free_cache(rcb)
        self.batch_scheduler.migrating_release()

    def _free_cache(self, rcb: RequestControlBlock) -> None:
        if rcb.virtual_kv_cache is not None and self.kv_cache_manager is not None:
            self.kv_cache_manager.realloc(rcb.virtual_kv_cache, 0)
        if rcb.virtual_image_cache is not None and self.image_cache_manager is not None:
            self.image_cache_manager.realloc(rcb.virtual_image_cache, 0)
        self.executor.fill_executor.release_slot(rcb)
        self.batch_scheduler.release_reservation(rcb)

    def __repr__(self):
        return self.name
