"""Cache exhaustion must serialize requests (back-pressure), not crash the
node (the reference asserts and kills the actor)."""
from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def test_kv_exhaustion_backpressure():
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=16),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4,
        n_kv_blocks=24,          # 96 kv tokens total
        n_image_blocks=4)
    cfg.model.dtype = "float32"
    engine = OfflineEngine(cfg, model_factory=FakeModelFactory(fake_config=FakeConfig()))
    # 6 requests × (30 prompt + 10 out) = 240 kv tokens demand ≫ 96 pool
    reqs = [Request(request_id=i, prompt="x" * 30,
                    sampling_params=SamplingParameters(max_tokens=10, ignore_eos=True))
            for i in range(6)]
    outs = engine.generate(reqs, timeout_s=60)
    assert all(len(o.output_token_ids) == 10 for o in outs)
    # pool drained back after completion (ref-mode caches reserve block 0
    # as the padding scratch target, so it never enters the pool)
    kv = engine.node.kv_cache_manager
    assert kv.n_available_blocks() == 24 - kv.block_allocator.reserved
