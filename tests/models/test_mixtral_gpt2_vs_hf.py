"""HF parity for Mixtral (sparse MoE) and GPT-2 on tiny random checkpoints."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))
from test_llama_vs_hf import make_single_seq_batch  # noqa: E402


def greedy_generate(lm, lcfg, prompt, n_new, block_size=4, n_blocks=32):
    cache = jnp.zeros((lcfg.n_layers, 1, n_blocks, block_size,
                       2 * lcfg.n_kv_heads, lcfg.head_dim), jnp.float32)
    batch, T = make_single_seq_batch(prompt, n_past=0, block_size=block_size)
    cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=T)
    out = [int(tokens[0])]
    generated = list(prompt) + out
    for _ in range(n_new - 1):
        batch, _ = make_single_seq_batch([generated[-1]],
                                         n_past=len(generated) - 1,
                                         block_size=block_size)
        cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=1)
        out.append(int(tokens[0]))
        generated.append(out[-1])
    return out


def test_mixtral_token_exact(tmp_path):
    cfg = transformers.MixtralConfig(
        vocab_size=64, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128)
    torch.manual_seed(0)
    hf = transformers.MixtralForCausalLM(cfg).eval().float()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    hf.generation_config.eos_token_id = None

    factory = getModelFactory(ModelFactoryConfig(
        path=str(tmp_path), dtype="float32", attention_impl="jnp"))
    assert factory.decoder_cfg.moe_top_k == 2
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()

    prompt = list(np.random.default_rng(0).integers(0, 64, size=8))
    ours = greedy_generate(lm, lcfg, prompt, 6)
    with torch.no_grad():
        expected = hf.generate(input_ids=torch.tensor([prompt]),
                               max_new_tokens=6, do_sample=False)
    assert ours == expected[0, len(prompt):].tolist()


def test_gpt2_token_exact(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=128, n_embd=48, n_layer=2, n_head=4)
    torch.manual_seed(0)
    hf = transformers.GPT2LMHeadModel(cfg).eval().float()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    hf.generation_config.eos_token_id = None

    factory = getModelFactory(ModelFactoryConfig(
        path=str(tmp_path), dtype="float32", attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    assert lcfg.n_kv_heads == 4

    prompt = list(np.random.default_rng(1).integers(0, 96, size=9))
    ours = greedy_generate(lm, lcfg, prompt, 6)
    with torch.no_grad():
        expected = hf.generate(input_ids=torch.tensor([prompt]),
                               max_new_tokens=6, do_sample=False)
    assert ours == expected[0, len(prompt):].tolist()
