"""LLaVA parity vs HF transformers on a tiny random-weight checkpoint:
vision tower + projector features and full multimodal prefill logits."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import (LanguageModelBatch, ModelFactoryConfig,
                                   VisionModelParameters, getModelFactory)
from hydrainfer_tpu.ops import PagedAttentionParams

VOCAB = 64
IMG_TOK = 60
N_IMG_TOKENS = 4  # (28/14)^2


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llava")
    cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=28, patch_size=14, num_channels=3,
                           hidden_act="quick_gelu"),
        text_config=dict(model_type="llama", vocab_size=VOCAB, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128),
        image_token_index=IMG_TOK, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def test_vision_features_match_hf(tiny_llava):
    path, hf = tiny_llava
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)

    out = vm.forward(jnp.asarray(pixels), VisionModelParameters())
    assert out.image_features.shape == (2, N_IMG_TOKENS, 48)

    with torch.no_grad():
        hf_feats = hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        if isinstance(hf_feats, (list, tuple)):
            hf_feats = torch.stack(list(hf_feats)) if hf_feats[0].dim() == 2 else hf_feats[0]
    np.testing.assert_allclose(np.asarray(out.image_features),
                               hf_feats.numpy().reshape(2, N_IMG_TOKENS, 48),
                               rtol=2e-3, atol=2e-3)


def test_multimodal_prefill_logits_match_hf(tiny_llava):
    path, hf = tiny_llava
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    vcfg = factory.getVisionModelConfig()
    assert vcfg.image_token_id == IMG_TOK
    assert vcfg.image_token_calculator.get_num_image_tokens((28, 28)) == N_IMG_TOKENS

    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    prompt = [1, 5, 8] + [IMG_TOK] * N_IMG_TOKENS + [9, 12, 3]
    T = len(prompt)

    feats = vm.forward(jnp.asarray(pixels), VisionModelParameters()).image_features
    feats_flat = feats.reshape(-1, lcfg.hidden_size)

    block_size = 4
    n_blocks_needed = -(-T // block_size)
    cache = jnp.zeros((lcfg.n_layers, 1, 8, block_size, 2 * lcfg.n_kv_heads,
                       lcfg.head_dim), jnp.float32)
    batch = LanguageModelBatch(
        token_ids=jnp.asarray(prompt, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        image_features=feats_flat,
        image_dst_idx=jnp.arange(3, 3 + N_IMG_TOKENS, dtype=jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.zeros(T, jnp.int32),
            q_local_ids=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.arange(T, dtype=jnp.int32),
            kv_lens=jnp.asarray([T], jnp.int32),
            block_tables=jnp.arange(n_blocks_needed, dtype=jnp.int32)[None, :],
            new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32),
            cu_q_lens=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32),
        ),
        sample_token_idx=jnp.asarray([T - 1], jnp.int32),
        token_src_slots=jnp.full((T,), -1, jnp.int32),
        sample_dst_slots=jnp.full((1,), -1, jnp.int32),
    )
    cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=T)

    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor([prompt]),
                       pixel_values=torch.tensor(pixels)).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(logits[0]), hf_logits[-1],
                               rtol=3e-3, atol=3e-3)
    assert int(tokens[0]) == int(hf_logits[-1].argmax())
