"""Engine-level A/B for the MLA latent kernel: a DeepSeek-V3 MLA model
served with attention_impl='layered' (the builder Pallas kernel reading the
single-plane latent cache, interpret mode on CPU) must emit the exact
greedy tokens of the 'jnp' oracle path — across chunked prefill, decode
batches, and the zero-padded latent cache dim (the node pads the latent
dim to a 128 lane multiple for the kernel's DMA alignment; chip A/B:
kernel 1005us vs oracle 3557us per decode step at b32/ctx300)."""
import sys

import pytest

sys.path.insert(0, "/root/repo")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
from hydrainfer_tpu.request import Request, SamplingParameters


@pytest.fixture(scope="module")
def mla_path(tmp_path_factory):
    from tests.models.test_deepseek_mla_vs_hf import make_ckpt
    path, _ = make_ckpt(tmp_path_factory, q_lora_rank=24)
    return path


def run_engine(mla_path, attn_impl):
    factory = getModelFactory(ModelFactoryConfig(
        path=mla_path, dtype="float32", attention_impl=attn_impl,
        layer_loop="scan"))
    factory.getTokenizer = lambda: SimpleTokenizer(
        image_token="<image>", image_token_id=60, eos_token_id=2)
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
    cfg.model.dtype = "float32"
    cfg.model.attention_impl = attn_impl
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    engine.node.batch_scheduler.token_budget = 16   # force chunked prefill
    prompts = ["ab cd ef", "x", "hello world and some more words to chunk",
               "mid size"]
    reqs = [Request(request_id=f"r{i}", prompt=p,
                    sampling_params=SamplingParameters(max_tokens=8,
                                                       ignore_eos=True))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs, timeout_s=600)
    # the engine must really have padded the latent cache dim to 128
    kv_dim = engine.node.kv_cache_manager.config.head_dim
    assert kv_dim % 128 == 0, kv_dim
    return [o.output_token_ids for o in outs]


def test_mla_layered_engine_matches_jnp(mla_path):
    ref = run_engine(mla_path, "jnp")
    got = run_engine(mla_path, "layered")
    assert got == ref
    assert all(len(t) == 8 for t in ref)


def test_mla_random_arch_layered_matches_jnp():
    """Same A/B over the random-init MLA arch (torch-free; also pins the
    MLA branch of init_decoder_weights and the bench path)."""
    from hydrainfer_tpu.models.random_init import RandomWeightFactory

    def run(impl):
        factory = RandomWeightFactory("mla-tiny-lm", layer_loop="scan",
                                      attention_impl=impl)
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4,
                                                 priority="prefill"),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
        cfg.model.dtype = "float32"
        cfg.model.attention_impl = impl
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
        engine.node.batch_scheduler.token_budget = 16
        reqs = [Request(request_id=f"{impl}{i}", prompt=p,
                        sampling_params=SamplingParameters(max_tokens=8,
                                                           ignore_eos=True))
                for i, p in enumerate(["ab cd ef", "x",
                                       "a longer prompt to chunk twice"])]
        return [o.output_token_ids for o in engine.generate(reqs,
                                                            timeout_s=600)]

    ref = run("jnp")
    assert run("layered") == ref
    assert all(len(t) == 8 for t in ref)
