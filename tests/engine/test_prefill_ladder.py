"""boot_warmup_prefill_ladder contract: after boot, a prefill of ANY size up
to the token budget reuses an already-seen fill jit key (with max_q collapsed
to T, prefill-carrying batches key only on the T bucket once S/MB are
floored) — so online serving under arbitrary arrival mixes never compiles a
greedy prefill program mid-run. This is what turned 10-19s TTFT tail spikes
into 100% SLO attainment on the chip sweep."""
import sys

sys.path.insert(0, "/root/repo")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.profiler import BatchSchedulerProfilerConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def test_ladder_closes_greedy_prefill_key_space():
    factory = RandomWeightFactory("tiny-lm")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1,
        profiler=BatchSchedulerProfilerConfig(
            enabled=False, default_token_budget=64))
    cfg.model.dtype = "bf16"
    cfg.boot_warmup = True
    cfg.boot_warmup_prefill_ladder = True
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    fx = engine.node.executor.fill_executor
    keys_at_boot = set(fx._seen_fill_keys)
    prefill_keys_at_boot = {k for k in keys_at_boot if k[0].max_q > 1}
    # the ladder really warmed multiple T buckets
    assert len(prefill_keys_at_boot) >= 4, sorted(
        (k[0].T for k in prefill_keys_at_boot))

    # serve prompts spanning every bucket up to the budget: no prefill key
    # may be minted mid-serving. Prompts stay inside the boot fair-share
    # context (pool/max_running = 256 tokens; tiny-lm tokenizes per char,
    # ~5 tokens per word) — a request exceeding its fair share legitimately
    # walks MB one more bucket (bounded by pool size), which is outside the
    # ladder's contract.
    for i, n_words in enumerate((1, 3, 7, 13, 29, 45)):
        outs = engine.generate(
            [Request(request_id=f"p{i}", prompt="word " * n_words,
                     sampling_params=SamplingParameters(max_tokens=3,
                                                        ignore_eos=True))],
            timeout_s=300)
        assert len(outs[0].output_token_ids) == 3
    new_prefill = {k for k in fx._seen_fill_keys
                   if k[0].max_q > 1} - prefill_keys_at_boot
    assert not new_prefill, (
        f"prefill keys minted mid-serving: {sorted(k[0].T for k in new_prefill)}")
