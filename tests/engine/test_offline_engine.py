"""End-to-end engine tests with the fake model factory (no weights)."""
import asyncio
import numpy as np
import pytest
from PIL import Image

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def make_engine(**kwargs):
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4,
        n_kv_blocks=256,
        n_image_blocks=16,
        **kwargs)
    cfg.model.dtype = "float32"
    factory = FakeModelFactory(fake_config=FakeConfig())
    return OfflineEngine(cfg, model_factory=factory)


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def test_text_only_generation(engine):
    reqs = [Request(request_id=i, prompt=f"hello world {i}",
                    sampling_params=SamplingParameters(max_tokens=8, ignore_eos=True))
            for i in range(3)]
    outs = engine.generate(reqs, timeout_s=60)
    for out in outs:
        assert len(out.output_token_ids) == 8
        assert out.finished_time > 0
        assert out.ttft > 0


def test_image_request_generation(engine):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    req = Request(request_id="img1", prompt="<image> describe",
                  image=img,
                  sampling_params=SamplingParameters(max_tokens=5, ignore_eos=True))
    out = engine.generate([req], timeout_s=60)[0]
    assert len(out.output_token_ids) == 5


def test_mixed_batch_and_queueing(engine):
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    reqs = [Request(request_id=f"t{i}", prompt="x" * (10 + i),
                    sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True))
            for i in range(12)]  # more than max_running_requests
    reqs.append(Request(request_id="img2", prompt="look <image> now", image=img,
                        sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True)))
    outs = engine.generate(reqs, timeout_s=120)
    assert all(len(o.output_token_ids) == 4 for o in outs)


def test_eos_stops_generation():
    engine = make_engine()
    # fake model emits deterministic tokens; pick one as eos after warming
    req = Request(request_id="warm", prompt="abc",
                  sampling_params=SamplingParameters(max_tokens=6, ignore_eos=True))
    out = engine.generate([req], timeout_s=60)[0]
    second_token = out.output_token_ids[1]

    req2 = Request(request_id="eos", prompt="abc",
                   sampling_params=SamplingParameters(
                       max_tokens=6, eos_token_ids=[second_token]))
    out2 = engine.generate([req2], timeout_s=60)[0]
    assert len(out2.output_token_ids) == 2
    assert out2.output_token_ids[-1] == second_token


def test_prefix_cache_reuse_across_generate_calls():
    engine = make_engine()
    prompt = "the quick brown fox jumps over the lazy dog"
    r1 = engine.generate([Request(request_id="a", prompt=prompt,
                                  sampling_params=SamplingParameters(max_tokens=3, ignore_eos=True))])[0]
    hit0 = engine.node.kv_cache_manager.metrics().prefix_cache_hit_rate
    r2 = engine.generate([Request(request_id="b", prompt=prompt,
                                  sampling_params=SamplingParameters(max_tokens=3, ignore_eos=True))])[0]
    hit1 = engine.node.kv_cache_manager.metrics().prefix_cache_hit_rate
    assert hit1 > hit0


def test_malformed_request_terminates_stream():
    """Regression: a request that fails in build_rcb (more <image> tokens than
    images) must still terminate its output stream instead of hanging callers."""
    import time as _time
    from hydrainfer_tpu.cluster.migrate import NodeType
    from hydrainfer_tpu.cluster.node import AsyncEPDNode, NodeConfig, NodeContext
    from hydrainfer_tpu.engine.output_token_processor import (
        OfflineOutputTokenProcessor, OutputTokenParams)
    from hydrainfer_tpu.engine.request_processor import (
        RequestProcessParameters, RequestProcessorConfig)
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory
    from hydrainfer_tpu.request import (OfflineInferenceOutput, Request,
                                        SamplingParameters)

    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=64, n_image_blocks=8)
    cfg.model.dtype = "float32"
    node = AsyncEPDNode(cfg, NodeContext(name="epd_bad", node_type=NodeType("EPD")))
    node.init(FakeModelFactory(fake_config=FakeConfig()))

    out = OfflineInferenceOutput(arrival_time=_time.perf_counter())
    finished = []
    proc = OfflineOutputTokenProcessor(
        out, node.model_factory.getTokenizer(), on_finish=lambda o: finished.append(o))
    req = Request(request_id="bad", prompt="<image> but no image attached",
                  sampling_params=SamplingParameters(max_tokens=4))

    async def drive():
        await node.add_request(req, RequestProcessParameters(
            output_token_processors=[proc],
            output_token_params=OutputTokenParams(stream_output=False)))
        for _ in range(20):
            await node.step()

    asyncio.run(drive())
    assert finished, "stream never terminated for the malformed request"
