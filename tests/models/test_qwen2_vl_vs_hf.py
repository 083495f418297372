"""Qwen2-VL parity vs HF: vision tower (2D rope + merger), image processor
patch layout, text-only token-exact generation, M-RoPE position index vs
HF get_rope_index, multimodal prefill+decode token-exact generation, and
the full engine pipeline (expansion → 3-axis positions → image cache →
fused multi-step decode). The reference stops at 1D rope
(qwen2_vl.py:230-238): its multimodal logits diverge from HF."""
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


def _mrope_batch(tokens, pos_t, pos_h, pos_w, n_past, image_features=None,
                 image_dst=None, hidden=48, block_size=4):
    from hydrainfer_tpu.models.factory import LanguageModelBatch
    from hydrainfer_tpu.ops.attention import PagedAttentionParams
    T = len(tokens)
    kv_len = n_past + T
    n_blocks = -(-kv_len // block_size)
    feats = (jnp.zeros((0, hidden), jnp.float32) if image_features is None
             else jnp.asarray(image_features))
    dst = (jnp.zeros((0,), jnp.int32) if image_dst is None
           else jnp.asarray(image_dst, jnp.int32))
    return LanguageModelBatch(
        token_ids=jnp.asarray(tokens, jnp.int32),
        positions=jnp.asarray(pos_t, jnp.int32),
        image_features=feats,
        image_dst_idx=dst,
        attention=PagedAttentionParams(
            q_seq_ids=jnp.zeros(T, jnp.int32),
            q_local_ids=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.asarray(pos_t, jnp.int32),
            kv_lens=jnp.asarray([kv_len], jnp.int32),
            block_tables=jnp.arange(n_blocks, dtype=jnp.int32)[None, :],
            new_kv_slot_ids=jnp.arange(n_past, kv_len, dtype=jnp.int32),
            cu_q_lens=jnp.asarray([0, T], jnp.int32),
            num_seqs=jnp.asarray([1], jnp.int32)),
        sample_token_idx=jnp.asarray([T - 1], jnp.int32),
        token_src_slots=jnp.full((T,), -1, jnp.int32),
        sample_dst_slots=jnp.full((1,), -1, jnp.int32),
        positions_hw=jnp.asarray(np.stack([pos_h, pos_w]), jnp.int32))


def _our_mrope_positions(token_ids, images_size, image_token_id, calc):
    """Invoke the request processor's position walker without a tokenizer."""
    from hydrainfer_tpu.engine.request_processor import RequestProcessor

    class Shim:
        pass

    shim = Shim()
    shim.image_token_id = image_token_id
    shim.image_token_calculator = calc
    return RequestProcessor._mrope_positions(shim, token_ids, images_size)


def test_mrope_positions_match_hf_get_rope_index(tiny_qwen2vl):
    path, hf = tiny_qwen2vl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32"))
    calc = factory.getVisionModelConfig().image_token_calculator

    # <text*3> <vstart> <image run: 6 merged tokens for 56x84> <vend> <text*2>
    ids = [5, 6, 7, 61] + [60] * 6 + [62, 8, 9]
    pt, ph, pw, st = _our_mrope_positions(ids, [(56, 84)], 60, calc)

    rope_index = (hf.model.get_rope_index if hasattr(hf.model, "get_rope_index")
                  else hf.get_rope_index)
    hf_pos, delta = rope_index(
        input_ids=torch.tensor([ids]),
        image_grid_thw=torch.tensor([[1, 4, 6]]))
    hf_pos = hf_pos[:, 0].numpy()          # (3, T)
    np.testing.assert_array_equal(np.asarray([pt, ph, pw]), hf_pos)
    # first decode position (HF: seq_len + delta)
    assert st == len(ids) + int(delta[0])


def test_multimodal_prefill_and_decode_logits_match_hf(tiny_qwen2vl):
    """Full multimodal parity vs HF — the reference can't do this at all
    (its Qwen2-VL LM uses 1D rope; multimodal logits diverge from HF)."""
    path, hf = tiny_qwen2vl
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    lm = factory.getLanguageModel()
    vm = factory.getVisionModel()
    calc = factory.getVisionModelConfig().image_token_calculator
    assert factory.decoder_cfg.mrope_section == (2, 2, 2)

    rng = np.random.default_rng(5)
    patches = rng.standard_normal((24, vm.cfg.patch_dim)).astype(np.float32)
    feats = np.asarray(vm.forward(
        jnp.asarray(patches),
        VisionModelParameters(original_image_sizes=[(56, 84)]))
        .image_features)[0]                       # (6, 48)

    ids = [5, 6, 7, 61] + [60] * 6 + [62, 8, 9]
    pt, ph, pw, st = _our_mrope_positions(ids, [(56, 84)], 60, calc)
    image_dst = [i for i, t in enumerate(ids) if t == 60]

    lcfg = factory.getLanguageModelConfig()
    cache = jnp.zeros((lcfg.n_layers, 1, 16, 4, 2 * lcfg.n_kv_heads,
                       lcfg.head_dim), jnp.float32)
    batch = _mrope_batch(ids, pt, ph, pw, 0, image_features=feats,
                         image_dst=image_dst)
    cache, tokens, logits = lm.forward_with_logits(cache, batch,
                                                   max_q=len(ids))

    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor([ids]),
                    pixel_values=torch.tensor(patches),
                    image_grid_thw=torch.tensor([[1, 4, 6]]))
    # tolerance is looser than the text-only test: the image features come
    # from OUR vision tower (itself 2e-3-close to HF), so error compounds
    np.testing.assert_allclose(np.asarray(logits)[0],
                               hf_out.logits[0, -1].numpy(),
                               rtol=6e-3, atol=6e-3)

    # greedy decode continuation: ours via mrope decode positions (all axes
    # advance together from st), HF via generate
    generated = [int(tokens[0])]
    n_past = len(ids)
    for k in range(4):
        p = st + k
        batch = _mrope_batch([generated[-1]], [p], [p], [p], n_past)
        cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=1)
        generated.append(int(tokens[0]))
        n_past += 1

    with torch.no_grad():
        hf_gen = hf.generate(input_ids=torch.tensor([ids]),
                             pixel_values=torch.tensor(patches),
                             image_grid_thw=torch.tensor([[1, 4, 6]]),
                             max_new_tokens=5, do_sample=False)
    assert generated == hf_gen[0, len(ids):].tolist()


def test_engine_multimodal_mrope_and_fused_decode(tiny_qwen2vl, monkeypatch):
    """Full engine pipeline over the M-RoPE model: processor → image-token
    expansion with 3-axis positions → vision tower → image cache splice →
    decode. The fused multi-step window must produce exactly the
    single-step tokens (its device-side geometry advance handles the
    rope-vs-cache position offset M-RoPE introduces)."""
    from PIL import Image
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.qwen2_vl import Qwen2VLModelFactory
    from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
    from hydrainfer_tpu.request import Request, SamplingParameters

    path, _ = tiny_qwen2vl
    monkeypatch.setattr(
        Qwen2VLModelFactory, "getTokenizer",
        lambda self: SimpleTokenizer(image_token="<image>",
                                     image_token_id=60, eos_token_id=63))

    def run(multi_step):
        factory = Qwen2VLModelFactory(
            ModelFactoryConfig(path=path, dtype="float32",
                               attention_impl="jnp"), None)
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=4)
        cfg.model.dtype = "fp32"
        cfg.multi_step_decode = multi_step
        engine = OfflineEngine(cfg, model_factory=factory, node_type="EPD")
        rng = np.random.default_rng(9)
        img = Image.fromarray(rng.integers(0, 255, (56, 84, 3),
                                           dtype=np.uint8))
        # prompt chars must stay under the 64-token vocab (ord+10 < 64)
        reqs = [Request(request_id="m0", prompt="<image> !%&!",  image=img,
                        sampling_params=SamplingParameters(
                            max_tokens=10, ignore_eos=True)),
                Request(request_id="t0", prompt="!! % &&",
                        sampling_params=SamplingParameters(
                            max_tokens=10, ignore_eos=True))]
        outs = engine.generate(reqs, timeout_s=600)
        return [o.output_token_ids for o in outs]

    single = run(1)
    fused = run(4)
    assert [len(t) for t in single] == [10, 10]
    assert fused == single
