"""Qwen2-VL parity vs HF: vision tower (2D rope + merger), image processor
patch layout, and text-only token-exact generation. Multimodal logits are
intentionally NOT compared: like the reference (qwen2_vl.py:230-238) the LM
uses standard 1D RoPE instead of HF's M-RoPE."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import (ModelFactoryConfig, VisionModelParameters,
                                   getModelFactory)

VOCAB = 64


@pytest.fixture(scope="module")
def tiny_qwen2vl(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_qwen2vl")
    cfg = transformers.Qwen2VLConfig(
        vision_config=dict(depth=2, embed_dim=64, hidden_size=48, num_heads=4,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2, mlp_ratio=2),
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=VOCAB,
        max_position_embeddings=256, image_token_id=60,
        vision_start_token_id=61, vision_end_token_id=62,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]})
    torch.manual_seed(0)
    model = transformers.Qwen2VLForConditionalGeneration(cfg).eval().float()
    model.save_pretrained(path, safe_serialization=True)
    model.generation_config.eos_token_id = None
    return str(path), model


def test_vision_tower_matches_hf(tiny_qwen2vl):
    path, hf = tiny_qwen2vl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()

    rng = np.random.default_rng(0)
    # image that smart_resizes to itself: 56x84 → grid 4x6 = 24 patches
    grids = [(1, 4, 6)]
    n_patches = 24
    patches = rng.standard_normal((n_patches, vm.cfg.patch_dim)).astype(np.float32)

    out = vm.forward(jnp.asarray(patches),
                     VisionModelParameters(original_image_sizes=[(56, 84)]))
    ours = np.asarray(out.image_features)[0]  # (6, 48)

    with torch.no_grad():
        hf_feats = hf.model.visual(torch.tensor(patches),
                                   grid_thw=torch.tensor([[1, 4, 6]])).numpy()
    assert ours.shape == hf_feats.shape == (6, 48)
    np.testing.assert_allclose(ours, hf_feats, rtol=2e-3, atol=2e-3)


def test_vision_tower_two_images(tiny_qwen2vl):
    path, hf = tiny_qwen2vl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()
    rng = np.random.default_rng(1)
    # 56x56 (grid 4x4=16) + 84x56 (grid 6x4=24) = 40 patches
    patches = rng.standard_normal((40, vm.cfg.patch_dim)).astype(np.float32)
    out = vm.forward(jnp.asarray(patches), VisionModelParameters(
        original_image_sizes=[(56, 56), (84, 56)]))
    ours = np.asarray(out.image_features)[0]
    with torch.no_grad():
        hf_feats = hf.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, 4, 4], [1, 6, 4]])).numpy()
    np.testing.assert_allclose(ours, hf_feats, rtol=2e-3, atol=2e-3)


def test_image_processor_matches_hf_layout(tiny_qwen2vl):
    path, _ = tiny_qwen2vl
    from PIL import Image
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32"))
    proc = factory.getProcessor()
    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, (60, 80, 3), dtype=np.uint8))
    ours = np.asarray(proc.process(img))
    hf_proc = Qwen2VLImageProcessor()
    hf_out = hf_proc(images=[img], return_tensors="np")
    np.testing.assert_array_equal(hf_out["image_grid_thw"][0], [1, 4, 6])
    np.testing.assert_allclose(ours, hf_out["pixel_values"], rtol=2e-2, atol=2e-2)


def test_text_only_generation_token_exact(tiny_qwen2vl):
    path, hf = tiny_qwen2vl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    assert factory.decoder_cfg.qkv_bias

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama_vs_hf import make_single_seq_batch

    prompt = list(np.random.default_rng(3).integers(0, 50, size=7))
    cache = jnp.zeros((lcfg.n_layers, 1, 16, 4, 2 * lcfg.n_kv_heads,
                       lcfg.head_dim), jnp.float32)
    batch, T = make_single_seq_batch(prompt, n_past=0)
    cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=T)
    generated = list(prompt) + [int(tokens[0])]
    for _ in range(5):
        batch, _ = make_single_seq_batch([generated[-1]], n_past=len(generated) - 1)
        cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=1)
        generated.append(int(tokens[0]))

    with torch.no_grad():
        hf_out = hf.generate(input_ids=torch.tensor([prompt]),
                             max_new_tokens=6, do_sample=False)
    assert generated[len(prompt):] == hf_out[0, len(prompt):].tolist()
