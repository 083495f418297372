"""Stochastic sampling through the full engine (temperature/top-k/top-p
reach the jitted step; greedy stays the hot path when temperature=0)."""
import numpy as np
import pytest

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
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("sampling_llama")
    cfg_hf = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg_hf).eval().float().save_pretrained(
        path, safe_serialization=True)
    factory = getModelFactory(ModelFactoryConfig(
        path=str(path), dtype="float32", attention_impl="jnp"))
    factory.getTokenizer = lambda: SimpleTokenizer()
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=2)
    cfg.model.dtype = "float32"
    return OfflineEngine(cfg, model_factory=factory, node_type="PD")


def gen(engine, temperature, n=12, top_k=-1, top_p=1.0, prompt="sample me"):
    out = engine.generate([Request(
        request_id="s", prompt=prompt,
        sampling_params=SamplingParameters(
            max_tokens=n, ignore_eos=True, temperature=temperature,
            top_k=top_k, top_p=top_p))], timeout_s=120)[0]
    return out.output_token_ids


def test_greedy_is_deterministic(engine):
    a = gen(engine, temperature=0.0)
    b = gen(engine, temperature=0.0)
    assert a == b


def test_temperature_varies_output(engine):
    a = gen(engine, temperature=1.5)
    b = gen(engine, temperature=1.5)
    c = gen(engine, temperature=0.0)
    # stochastic runs differ from each other and from greedy
    assert a != b or a != c


def test_top_k_1_equals_greedy(engine):
    greedy = gen(engine, temperature=0.0)
    topk1 = gen(engine, temperature=0.8, top_k=1)
    assert topk1 == greedy


def test_mixed_batch_greedy_and_sampled(engine):
    reqs = [
        Request(request_id="g", prompt="mixed",
                sampling_params=SamplingParameters(max_tokens=8, ignore_eos=True,
                                                   temperature=0.0)),
        Request(request_id="s", prompt="mixed",
                sampling_params=SamplingParameters(max_tokens=8, ignore_eos=True,
                                                   temperature=1.5)),
    ]
    outs = engine.generate(reqs, timeout_s=120)
    greedy_ref = gen(engine, temperature=0.0, n=8, prompt="mixed")
    assert outs[0].output_token_ids == greedy_ref  # greedy row unaffected


def test_incremental_decoder_multibyte():
    """Multi-byte UTF-8 characters split across BPE tokens stream intact."""
    from hydrainfer_tpu.models.tokenizer import IncrementalDecoder

    class ByteTok:
        """One token per BYTE — the worst case for per-token decode."""
        def decode_ids(self, ids):
            return bytes(i for i in ids if i >= 0).decode("utf-8", errors="replace")

    text = "héllo 世界 🚀"
    data = text.encode("utf-8")
    dec = IncrementalDecoder(ByteTok())
    streamed = "".join(dec.push(b) for b in data)
    assert streamed == text
    assert "�" not in streamed


def test_incremental_decoder_ignores_negative_sentinel():
    from hydrainfer_tpu.models.tokenizer import IncrementalDecoder, SimpleTokenizer
    dec = IncrementalDecoder(SimpleTokenizer())
    assert dec.push(-1) == ""
    assert dec.push(ord("a") + SimpleTokenizer.OFFSET) == "a"
