"""Engine-level A/B: attention_impl='layered' (builder Pallas kernel, value
cache) must produce the exact greedy tokens of the 'jnp' oracle path over a
continuous-batching workload with chunked prefill and decode mixed."""
import sys

import pytest

sys.path.insert(0, "/root/repo")
from bench import RandomWeightFactory  # noqa: E402

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.request import Request, SamplingParameters


def run_engine(attn_impl: str, kv_int8: bool = False):
    factory = RandomWeightFactory("tiny-lm", kv_scale=0.05 if kv_int8 else None)
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4,
        n_kv_blocks=256,
        n_image_blocks=1,
    )
    cfg.model.dtype = "bf16"
    cfg.model.attention_impl = attn_impl
    if kv_int8:
        cfg.model.kv_cache_dtype = "int8"
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    engine.node.batch_scheduler.token_budget = 24  # force chunked prefill
    prompts = ["the quick brown fox", "a", "jumps over the lazy dog and runs",
               "hello world this is a long prompt to chunk", "mid size one"]
    reqs = [Request(request_id=f"r{i}", prompt=p,
                    sampling_params=SamplingParameters(max_tokens=12,
                                                       ignore_eos=True))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs, timeout_s=600)
    return {o.request_id if hasattr(o, "request_id") else i: o.output_token_ids
            for i, o in enumerate(outs)}


def test_layered_engine_matches_jnp():
    ref = run_engine("jnp")
    got = run_engine("layered")
    assert got == ref


def test_layered_engine_matches_jnp_int8_kv():
    ref = run_engine("jnp", kv_int8=True)
    got = run_engine("layered", kv_int8=True)
    assert got == ref
