"""Token-read pipeline modes (NodeConfig.pipeline_mode): "batched",
"incremental" (default) and "threaded" must all emit EXACTLY the same
tokens — the mode only changes WHEN deferred device→host reads happen,
never what was computed. Also pins the incremental invariants that kill
BENCH_r02's token-gap tail: completed windows drain eagerly, and a
forced (blocking) drain always leaves >=1 window enqueued on the device.
"""
import sys

sys.path.insert(0, "/root/repo")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def run_engine(pipeline_mode: str, multi_step: int = 4, node=None):
    factory = RandomWeightFactory("tiny-lm")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=5,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
    cfg.model.dtype = "bf16"
    cfg.multi_step_decode = multi_step
    cfg.pipeline_mode = pipeline_mode
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    if node is not None:
        node.append(engine.node)
    prompts = ["the quick brown fox", "a", "jumps over the lazy dog and runs",
               "hello world this is a long prompt to chunk", "mid size one"]
    reqs = [Request(request_id=f"r{i}", prompt=p,
                    sampling_params=SamplingParameters(max_tokens=12,
                                                       ignore_eos=True))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs, timeout_s=600)
    return [o.output_token_ids for o in outs]


def test_modes_emit_identical_tokens():
    ref = run_engine("batched")
    assert run_engine("incremental") == ref
    assert run_engine("threaded") == ref
    assert all(len(t) == 12 for t in ref)


def test_modes_identical_single_step_too():
    ref = run_engine("batched", multi_step=1)
    assert run_engine("incremental", multi_step=1) == ref
    assert run_engine("threaded", multi_step=1) == ref


def test_incremental_forced_drain_keeps_one_in_flight():
    """Whenever _drain_pipeline BLOCKS on a not-yet-ready window (the
    backlog-overflow branch), at least one later window must remain in
    the pipeline — i.e. the device still has a dispatched program to
    chew on during the host's read+postprocess. (The old batched flush
    emptied the whole pipeline at once: device idle for the entire
    read, tokens in multi-window bursts — the 274 ms p99 gap.)"""
    from hydrainfer_tpu.cluster import node as node_mod
    violations = []
    orig_drain = node_mod.AsyncEPDNode._drain_pipeline
    orig_wait = node_mod.AsyncEPDNode._wait_one

    def wait_spy(self):
        item = self._pending_fills[0]
        dev = getattr(item, "sampled_dev", None)
        ready = (item.done() if hasattr(item, "done")
                 else (dev is not None and dev.is_ready()))
        if not ready and len(self._pending_fills) < 2:
            violations.append(len(self._pending_fills))
        return orig_wait(self)

    def drain_spy(self):
        # only _drain_pipeline is under test; flush_fills (idle / fill-less
        # steps / spec barrier) legitimately drains the pipeline to empty
        node_mod.AsyncEPDNode._wait_one = wait_spy
        try:
            orig_drain(self)
        finally:
            node_mod.AsyncEPDNode._wait_one = orig_wait

    node_mod.AsyncEPDNode._drain_pipeline = drain_spy
    try:
        toks = run_engine("incremental")
        assert all(len(t) == 12 for t in toks)
    finally:
        node_mod.AsyncEPDNode._drain_pipeline = orig_drain
        node_mod.AsyncEPDNode._wait_one = orig_wait
    assert not violations, (
        f"blocking drain left the device empty: {violations}")


def test_threaded_backlog_bounded():
    """Threaded mode must never let more than max_threaded_backlog
    windows pile up (token/termination staleness bound)."""
    from hydrainfer_tpu.cluster import node as node_mod
    high = [0]
    orig = node_mod.AsyncEPDNode._drain_pipeline

    def spy(self):
        orig(self)
        high[0] = max(high[0], len(self._pending_fills))

    node_mod.AsyncEPDNode._drain_pipeline = spy
    try:
        nodes = []
        toks = run_engine("threaded", node=nodes)
        assert all(len(t) == 12 for t in toks)
        assert high[0] <= nodes[0].config.max_threaded_backlog, high[0]
    finally:
        node_mod.AsyncEPDNode._drain_pipeline = orig
