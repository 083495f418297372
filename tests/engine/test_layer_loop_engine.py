"""Engine-level A/B: layer_loop='unroll' (per-layer cache buffers, unrolled
layer loop — the serving default picked by the node engine) must produce the
exact greedy tokens of the stacked-scan path over a continuous-batching
workload with chunked prefill and decode mixed, with and without the jax.Ref
in-place cache and with INT8 KV."""
import sys

sys.path.insert(0, "/root/repo")
from bench import RandomWeightFactory  # noqa: E402

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.request import Request, SamplingParameters


def run_engine(layer_loop: str, kv_int8: bool = False, kv_ref: bool = True,
               dtype=None):
    import jax.numpy as jnp
    factory = RandomWeightFactory("tiny-lm", kv_scale=0.05 if kv_int8 else None,
                                  layer_loop=layer_loop,
                                  dtype=dtype or jnp.bfloat16)
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
    cfg.kv_cache_ref = kv_ref
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


def test_unroll_engine_matches_scan():
    ref = run_engine("scan")
    got = run_engine("unroll")
    assert got == ref


def test_unroll_engine_matches_scan_value_cache():
    ref = run_engine("scan", kv_ref=False)
    got = run_engine("unroll", kv_ref=False)
    assert got == ref


def test_unroll_engine_matches_scan_int8_kv():
    # float32 compute: in bf16, scan-vs-unroll fusion differences put values
    # at the int8 round() knife-edge and greedy decode amplifies one flipped
    # quantized KV entry into a divergent tail (observed, CPU backend)
    import jax.numpy as jnp
    ref = run_engine("scan", kv_int8=True, dtype=jnp.float32)
    got = run_engine("unroll", kv_int8=True, dtype=jnp.float32)
    assert got == ref


def test_unroll_stacked_engine_matches_scan():
    """unroll_stacked: per-layer cache buffers with STATIC slices of the
    stacked weights — same tokens, ~1/8 the dispatch args."""
    ref = run_engine("scan")
    got = run_engine("unroll_stacked")
    assert got == ref
