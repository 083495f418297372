"""Layer-chunked ViT encode: the tower split across engine steps must be
token-identical to the single-program encode (the chunking only reorders
device-queue entries, never math). Reference motivation: encode head-of-line
blocking, hydrainfer/engine/profiler.py:195-240."""
import numpy as np
import jax.numpy as jnp
from PIL import Image

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import CLIP_TINY, RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def _run(chunk_layers: int):
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=8)
    cfg.model.dtype = "float32"
    cfg.encode_chunk_layers = chunk_layers
    cfg.image_block_size = CLIP_TINY.n_patches
    factory = RandomWeightFactory("tiny-lm", dtype=jnp.float32,
                                  multimodal=True, clip_cfg=CLIP_TINY,
                                  layer_loop="scan")
    engine = OfflineEngine(cfg, model_factory=factory, node_type="EPD")
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))
    reqs = []
    for i in range(3):
        has_img = i % 2 == 0
        reqs.append(Request(
            request_id=f"r{i}",
            prompt=("<image> describe " if has_img else "plain ") + f"req {i}",
            image=img if has_img else None,
            sampling_params=SamplingParameters(max_tokens=6,
                                               ignore_eos=True)))
    outs = engine.generate(reqs, timeout_s=120)
    return [o.output_token_ids for o in outs]


def test_chunked_encode_token_identical():
    base = _run(0)
    chunked = _run(1)   # CLIP_TINY has 2 layers → 2 segments
    assert all(len(t) == 6 for t in base), base
    assert base == chunked, (base, chunked)


def test_chunked_encode_all_image_batch():
    """All-embed phases (no fills resident) must keep the chunked encode
    advancing AND rejoin its finished requests — the early-return step
    path used to drop the finished batch (deadlock)."""
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=16)
    cfg.model.dtype = "float32"
    cfg.encode_chunk_layers = 1
    cfg.image_block_size = CLIP_TINY.n_patches
    factory = RandomWeightFactory("tiny-lm", dtype=jnp.float32,
                                  multimodal=True, clip_cfg=CLIP_TINY,
                                  layer_loop="scan")
    engine = OfflineEngine(cfg, model_factory=factory, node_type="EPD")
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))
    reqs = [Request(request_id=f"e{i}", prompt="<image> x", image=img,
                    sampling_params=SamplingParameters(max_tokens=2,
                                                       ignore_eos=True))
            for i in range(6)]
    outs = engine.generate(reqs, timeout_s=120)
    assert all(len(o.output_token_ids) == 2 for o in outs)
