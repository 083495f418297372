"""Fused multi-step decode: the engine with multi_step_decode=K must emit
EXACTLY the tokens of the single-step engine — across chunked prefill,
mixed request lengths (the window shrinks when a request nears max_tokens),
eos termination mid-window, scan and unroll layer loops, ref and value
caches."""
import sys

sys.path.insert(0, "/root/repo")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def run_engine(multi_step: int, layer_loop: str = "unroll",
               kv_ref: bool = True, ignore_eos: bool = True,
               max_tokens=(12, 3, 12, 7, 12)):
    factory = RandomWeightFactory("tiny-lm", layer_loop=layer_loop)
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=5,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
    cfg.model.dtype = "bf16"
    cfg.kv_cache_ref = kv_ref
    cfg.multi_step_decode = multi_step
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    engine.node.batch_scheduler.token_budget = 24
    prompts = ["the quick brown fox", "a", "jumps over the lazy dog and runs",
               "hello world this is a long prompt to chunk", "mid size one"]
    reqs = [Request(request_id=f"r{i}", prompt=p,
                    sampling_params=SamplingParameters(
                        max_tokens=max_tokens[i], ignore_eos=ignore_eos,
                        eos_token_ids=[] if ignore_eos else [7]))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs, timeout_s=600)
    return [o.output_token_ids for o in outs]


def test_multi_step_matches_single():
    ref = run_engine(1)
    got = run_engine(4)
    assert got == ref
    assert [len(t) for t in got] == [12, 3, 12, 7, 12]


def test_multi_step_scan_layer_loop():
    ref = run_engine(1, layer_loop="scan")
    got = run_engine(4, layer_loop="scan")
    assert got == ref


def test_multi_step_value_cache():
    ref = run_engine(1, kv_ref=False)
    got = run_engine(4, kv_ref=False)
    assert got == ref


def test_window_does_not_collapse_to_batch_min():
    """A request near its token limit must NOT shrink the whole batch's
    fused window (that would collapse it to 1 in steady state and make
    n_steps an unbounded compile-key set); it rides along with its device
    lanes masked, contributing only its own ks[i] real steps."""
    captured = []
    from hydrainfer_tpu.engine import executor as ex
    orig = ex.FillExecutor._multi_step_window

    def spy(self, batch, n_steps):
        n, ks = orig(self, batch, n_steps)
        captured.append((n, list(ks) if ks else None))
        return n, ks

    ex.FillExecutor._multi_step_window = spy
    try:
        run_engine(4, max_tokens=(12, 3, 12, 7, 12))
    finally:
        ex.FillExecutor._multi_step_window = orig
    fused = [(n, ks) for n, ks in captured if n > 1]
    assert fused, "no fused windows ran"
    # at least one window must mix a full-K request with a shorter one
    assert any(n == 4 and ks and max(ks) == 4 and min(ks) < 4
               for n, ks in fused), fused


def test_multi_step_eos_mid_window():
    """A request hitting eos inside the fused window must stop exactly
    there; the surplus window tokens are dropped."""
    ref = run_engine(1, ignore_eos=False)
    got = run_engine(4, ignore_eos=False)
    assert got == ref


def test_dims_highwater_no_recompile_churn():
    """After the engine has seen its largest batch, smaller/narrower
    batches must reuse the SAME FillDims (jit key) — batch drain and
    context growth must not walk new compile buckets."""
    from hydrainfer_tpu.engine import executor as ex
    dims_seen = []
    orig = ex.FillExecutor.execute

    def spy(self, batch, n_steps=1):
        fut = orig(self, batch, n_steps=n_steps)
        if getattr(fut, "plan", None) is not None:
            dims_seen.append(fut.plan.dims)
        return fut

    ex.FillExecutor.execute = spy
    try:
        run_engine(4)
    finally:
        ex.FillExecutor.execute = orig
    decode_dims = [d for d in dims_seen if d.max_q == 1]
    assert decode_dims, "no decode steps observed"
    # S and MB are monotone non-decreasing (high-water), so the tail of the
    # run (drain: fewer live requests, longer contexts) adds no new keys
    for a, b in zip(decode_dims, decode_dims[1:]):
        assert b.S >= a.S and b.MB >= a.MB
    assert len({(d.T, d.S, d.MB, d.max_q, d.sampling)
                for d in decode_dims[len(decode_dims) // 2:]}) <= 2


def test_decode_warmup_precompiles_buckets():
    """profiler.warm_decode must run the prefill + fused + single decode
    programs at the serving batch size and leave the executor's high-water
    dims at steady state — with no slot/block leaks."""
    factory = RandomWeightFactory("tiny-lm")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
    cfg.model.dtype = "bf16"
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    fx = engine.node.executor.fill_executor
    kv = engine.node.kv_cache_manager
    free_before = kv.n_available_blocks()
    slots_before = len(fx._free_slots)

    from hydrainfer_tpu.engine.profiler import (BatchSchedulerProfiler,
                                                BatchSchedulerProfilerConfig)
    prof = BatchSchedulerProfiler(
        BatchSchedulerProfilerConfig(enabled=True), engine.node.executor,
        kv, engine.node.image_cache_manager)
    prof.warm_decode(4, 4)
    assert fx._s_highwater >= 4
    assert kv.n_available_blocks() == free_before
    assert len(fx._free_slots) == slots_before
    # engine still serves correctly afterwards
    outs = engine.generate(
        [Request(request_id="w0", prompt="hello there",
                 sampling_params=SamplingParameters(max_tokens=6,
                                                    ignore_eos=True))],
        timeout_s=300)
    assert len(outs[0].output_token_ids) == 6


def test_multi_step_unroll_stacked_layer_loop():
    ref = run_engine(1, layer_loop="unroll_stacked")
    got = run_engine(4, layer_loop="unroll_stacked")
    assert got == ref


def test_boot_warmup_converges_jit_keys():
    """With boot_warmup=True the S/MB floors are pre-ratcheted to the
    serving envelope at node init, so a full serving pass must not move
    them — every mid-run floor ratchet re-keys the prefill AND decode
    programs (a 10-25s compile apiece on the real TPU tunnel)."""
    factory = RandomWeightFactory("tiny-lm")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=5,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
    cfg.model.dtype = "bf16"
    cfg.multi_step_decode = 4
    cfg.boot_warmup = True
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    fx = engine.node.executor.fill_executor
    # envelope: S >= max_running, MB >= fair-share context / block_size
    # (warm_decode's own builds round the floors up to their jit buckets)
    assert fx._s_highwater >= 5
    assert fx._mb_highwater >= (256 * 4 // 5) // 4
    s0, mb0 = fx._s_highwater, fx._mb_highwater
    reqs = [Request(request_id=f"b{i}", prompt="some words here to prefill",
                    sampling_params=SamplingParameters(max_tokens=20,
                                                       ignore_eos=True))
            for i in range(5)]
    outs = engine.generate(reqs, timeout_s=600)
    assert [len(o.output_token_ids) for o in outs] == [20] * 5
    assert (fx._s_highwater, fx._mb_highwater) == (s0, mb0), \
        "serving ratcheted the jit-key floors past the boot envelope"
