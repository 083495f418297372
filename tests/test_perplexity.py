"""Perplexity evaluator vs HF loss, and quantization deltas."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from evaluation.perplexity import evaluate, sequence_nll


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    path = tmp_path_factory.mktemp("ppl_llama")
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval().float()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def test_nll_matches_hf(tiny_llama):
    path, hf = tiny_llama
    import jax.numpy as jnp
    from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()

    seq = np.random.default_rng(0).integers(0, 128, size=40).tolist()
    ours = sequence_nll(lm, lcfg, seq, block_size=8, cache_dtype=jnp.float32)
    with torch.no_grad():
        ids = torch.tensor([seq])
        hf_loss = hf(input_ids=ids, labels=ids).loss.item()
    assert abs(ours - hf_loss) < 2e-3, (ours, hf_loss)


def test_quantization_deltas_small(tiny_llama):
    path, _ = tiny_llama
    base = evaluate(path, dtype="float32", num_seqs=2, seq_len=48)
    q8 = evaluate(path, dtype="float32", quant="int8", num_seqs=2, seq_len=48)
    f8 = evaluate(path, dtype="float32", quant="fp8", num_seqs=2, seq_len=48)
    kv8 = evaluate(path, dtype="float32", kv_int8=True, num_seqs=2, seq_len=48)
    assert abs(q8["nll"] - base["nll"]) < 0.05 * max(base["nll"], 1.0)
    assert abs(kv8["nll"] - base["nll"]) < 0.05 * max(base["nll"], 1.0)
    assert abs(f8["nll"] - base["nll"]) < 0.05 * max(base["nll"], 1.0)
