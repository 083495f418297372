"""Engine-level check of the causal varlen-prefill attention path (the
13B / rejected-head-shape kernel): forcing impl="varlen_prefill" through
the full engine must produce the same greedy tokens as the jnp oracle."""
import jax.numpy as jnp
import numpy as np

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def _run(attn_impl: str):
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
    cfg.model.dtype = "float32"
    factory = RandomWeightFactory("tiny-lm", dtype=jnp.float32,
                                  layer_loop="scan",
                                  attention_impl=attn_impl)
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    reqs = [Request(request_id=f"v{i}",
                    prompt=f"varlen prefill engine check {i} " * (i + 1),
                    sampling_params=SamplingParameters(max_tokens=8,
                                                       ignore_eos=True))
            for i in range(3)]
    outs = engine.generate(reqs, timeout_s=240)
    return [o.output_token_ids for o in outs]


def test_varlen_prefill_engine_matches_oracle():
    base = _run("jnp")
    kernel = _run("varlen_prefill")
    assert all(len(t) == 8 for t in base), base
    assert base == kernel, (base, kernel)
