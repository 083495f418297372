"""Logit parity: our paged-cache Llama vs HF transformers on a tiny
random-weight checkpoint (the reference only checks this manually via
evaluation scripts; we make it a unit test)."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import (LanguageModelBatch, ModelFactoryConfig,
                                   getModelFactory)
from hydrainfer_tpu.ops import PagedAttentionParams

VOCAB = 128


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llama")
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def make_single_seq_batch(chunk_tokens, n_past, block_size=4):
    """Geometry for one sequence: chunk appended after n_past tokens."""
    T = len(chunk_tokens)
    kv_len = n_past + T
    n_blocks = -(-kv_len // block_size)
    return LanguageModelBatch(
        token_ids=jnp.asarray(chunk_tokens, jnp.int32),
        positions=jnp.arange(n_past, kv_len, dtype=jnp.int32),
        image_features=jnp.zeros((0, 64), jnp.float32),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.zeros(T, jnp.int32),
            q_local_ids=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.arange(n_past, kv_len, dtype=jnp.int32),
            kv_lens=jnp.asarray([kv_len], jnp.int32),
            block_tables=jnp.arange(n_blocks, dtype=jnp.int32)[None, :],
            new_kv_slot_ids=jnp.arange(n_past, kv_len, dtype=jnp.int32),
            cu_q_lens=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
        ),
        sample_token_idx=jnp.asarray([T - 1], jnp.int32),
        token_src_slots=jnp.full((T,), -1, jnp.int32),
        sample_dst_slots=jnp.full((1,), -1, jnp.int32),
    ), T


def test_prefill_and_decode_logits_match_hf(tiny_llama):
    path, hf_model = tiny_llama
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp"))
    lm = factory.getLanguageModel()
    cfg = factory.getLanguageModelConfig()
    assert cfg.n_layers == 2 and cfg.n_kv_heads == 2

    block_size = 4
    cache = jnp.zeros((cfg.n_layers, 1, 16, block_size, 2 * cfg.n_kv_heads,
                       cfg.head_dim), jnp.float32)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, VOCAB, size=9).tolist()

    # ---- prefill ----
    batch, T = make_single_seq_batch(prompt, n_past=0, block_size=block_size)
    cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=T)

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits[-1],
                               rtol=2e-3, atol=2e-3)

    # ---- greedy decode, 5 steps, validated against HF each step ----
    generated = list(prompt)
    next_tok = int(tokens[0])
    for step in range(5):
        assert next_tok == int(hf_logits[-1].argmax()), f"divergence at step {step}"
        generated.append(next_tok)
        batch, T = make_single_seq_batch([next_tok], n_past=len(generated) - 1,
                                         block_size=block_size)
        cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=1)
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor([generated])).logits[0].numpy()
        np.testing.assert_allclose(np.asarray(logits[0]), hf_logits[-1],
                                   rtol=2e-3, atol=2e-3)
        next_tok = int(tokens[0])


def test_chunked_prefill_matches_full_prefill(tiny_llama):
    path, hf_model = tiny_llama
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp"))
    lm = factory.getLanguageModel()
    cfg = factory.getLanguageModelConfig()
    block_size = 4
    cache = jnp.zeros((cfg.n_layers, 1, 16, block_size, 2 * cfg.n_kv_heads,
                       cfg.head_dim), jnp.float32)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, VOCAB, size=10).tolist()

    # two chunks: 6 + 4 tokens
    batch, _ = make_single_seq_batch(prompt[:6], n_past=0, block_size=block_size)
    cache, _, _ = lm.forward_with_logits(cache, batch, max_q=6)
    batch, _ = make_single_seq_batch(prompt[6:], n_past=6, block_size=block_size)
    cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=4)

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits[-1],
                               rtol=2e-3, atol=2e-3)
