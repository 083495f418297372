"""InternVL parity vs HF-native checkpoints: InternViT + pixel shuffle +
projector features, dynamic tiling, and text-only token-exact generation."""
import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import (ModelFactoryConfig, VisionModelParameters,
                                   getModelFactory)

VOCAB = 64


@pytest.fixture(scope="module")
def tiny_internvl(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_internvl")
    cfg = transformers.InternVLConfig(
        vision_config=dict(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=[56, 56], patch_size=[14, 14],
                           use_qkv_bias=True),
        text_config=dict(model_type="qwen2", vocab_size=VOCAB, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256),
        image_token_id=60, downsample_ratio=0.5, vision_feature_layer=-1,
        vision_feature_select_strategy="default")
    torch.manual_seed(0)
    model = transformers.InternVLForConditionalGeneration(cfg).eval().float()
    model.save_pretrained(path, safe_serialization=True)
    model.generation_config.eos_token_id = None
    return str(path), model


def test_vision_features_match_hf(tiny_internvl):
    path, hf = tiny_internvl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()
    rng = np.random.default_rng(0)
    tiles = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)

    out = vm.forward(jnp.asarray(tiles), VisionModelParameters())
    ours = np.asarray(out.image_features)[0]       # (2*4, 48)

    with torch.no_grad():
        hf_feats = hf.model.get_image_features(
            pixel_values=torch.tensor(tiles)).numpy()  # (2, 4, 48)
    assert ours.shape == (8, 48)
    np.testing.assert_allclose(ours, hf_feats.reshape(8, 48),
                               rtol=3e-3, atol=3e-3)


def test_dynamic_tiling_and_calculator(tiny_internvl):
    path, _ = tiny_internvl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32"))
    proc = factory.getProcessor()
    calc = factory.getVisionModelConfig().image_token_calculator

    rng = np.random.default_rng(1)
    # wide image → 2x1 tiles + thumbnail = 3 tiles
    img = Image.fromarray(rng.integers(0, 255, (56, 112, 3), dtype=np.uint8))
    tiles = np.asarray(proc.process(img))
    assert tiles.shape == (3, 3, 56, 56)
    # tokens per tile = (56/14 * 0.5)^2 = 4
    assert calc.get_num_image_tokens((56, 112)) == 3 * 4

    # small square image → single tile, no thumbnail
    img2 = Image.fromarray(rng.integers(0, 255, (50, 50, 3), dtype=np.uint8))
    assert np.asarray(proc.process(img2)).shape == (1, 3, 56, 56)
    assert calc.get_num_image_tokens((50, 50)) == 4


def test_text_only_generation_token_exact(tiny_internvl):
    path, hf = tiny_internvl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()

    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mixtral_gpt2_vs_hf import greedy_generate

    prompt = list(np.random.default_rng(2).integers(0, 50, size=8))
    ours = greedy_generate(lm, lcfg, prompt, 6)
    with torch.no_grad():
        expected = hf.generate(input_ids=torch.tensor([prompt]),
                               max_new_tokens=6, do_sample=False)
    assert ours == expected[0, len(prompt):].tolist()


def test_internlm2_wqkv_conversion(tmp_path):
    """The fused-wqkv unpacking produces the same fused-qkv matmul as
    assembling q/k/v separately."""
    from hydrainfer_tpu.models.internvl import convert_internlm2_weights
    from hydrainfer_tpu.models.decoder import DecoderConfig
    import safetensors.numpy as st

    rng = np.random.default_rng(3)
    hid, kv, r, D = 32, 2, 2, 8   # 4 q heads, 2 kv heads
    cfg = DecoderConfig(n_layers=1, hidden_size=hid, intermediate_size=64,
                        n_qo_heads=kv * r, n_kv_heads=kv, head_dim=D,
                        vocab_size=50, max_position_embeddings=64)
    q = rng.standard_normal((kv, r, D, hid)).astype(np.float32)
    k = rng.standard_normal((kv, 1, D, hid)).astype(np.float32)
    v = rng.standard_normal((kv, 1, D, hid)).astype(np.float32)
    wqkv = np.concatenate([q, k, v], axis=1).reshape((r + 2) * kv * D, hid)
    tensors = {
        "language_model.model.tok_embeddings.weight": rng.standard_normal((50, hid)).astype(np.float32),
        "language_model.model.layers.0.attention.wqkv.weight": wqkv,
        "language_model.model.layers.0.attention.wo.weight": rng.standard_normal((hid, kv * r * D)).astype(np.float32),
        "language_model.model.layers.0.feed_forward.w1.weight": rng.standard_normal((64, hid)).astype(np.float32),
        "language_model.model.layers.0.feed_forward.w3.weight": rng.standard_normal((64, hid)).astype(np.float32),
        "language_model.model.layers.0.feed_forward.w2.weight": rng.standard_normal((hid, 64)).astype(np.float32),
        "language_model.model.layers.0.attention_norm.weight": np.ones(hid, np.float32),
        "language_model.model.layers.0.ffn_norm.weight": np.ones(hid, np.float32),
        "language_model.model.norm.weight": np.ones(hid, np.float32),
        "language_model.output.weight": rng.standard_normal((50, hid)).astype(np.float32),
    }
    st.save_file(tensors, str(tmp_path / "model.safetensors"))
    from hydrainfer_tpu.models.weight_loader import WeightStore
    w = convert_internlm2_weights(WeightStore(str(tmp_path)), cfg,
                                  "language_model.")
    fused = np.asarray(w["layers"][0]["qkv_proj"])   # (hid, (H+2KV)*D)
    expected = np.concatenate([q.reshape(kv * r * D, hid),
                               k.reshape(kv * D, hid),
                               v.reshape(kv * D, hid)], axis=0).T
    np.testing.assert_allclose(fused, expected)
