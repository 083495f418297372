"""DeepSeek V2/V3 MoE LM + DeepSeek-VL2 vision on tiny synthetic checkpoints
in the ORIGINAL naming (no HF-loadable oracle exists for the non-MLA layout
the reference targets, so these tests check conversion mechanics, segment
packing, the tile/token geometry, and end-to-end generation)."""
import json

import numpy as np
import pytest
import jax.numpy as jnp
import safetensors.numpy as st
from PIL import Image

from hydrainfer_tpu.models import ModelFactoryConfig, VisionModelParameters, getModelFactory


def make_deepseek_vl2_checkpoint(path, n_layers=3, first_dense=1, hidden=32,
                                 n_experts=4, top_k=2, n_shared=1, inter=48,
                                 moe_inter=24, vocab=64,
                                 vit_layers=2, vit_hidden=32, image_size=28,
                                 patch=14, n_embed=32):
    rng = np.random.default_rng(0)
    r = lambda *s: (rng.standard_normal(s) * 0.05).astype(np.float32)
    t = {}
    # ---- language (DeepseekV2-style, non-MLA) ----
    p = "language.model."
    t[p + "embed_tokens.weight"] = r(vocab, hidden)
    heads, kv_heads = 4, 2
    hd = hidden // heads
    for l in range(n_layers):
        lp = f"{p}layers.{l}."
        t[lp + "self_attn.q_proj.weight"] = r(heads * hd, hidden)
        t[lp + "self_attn.k_proj.weight"] = r(kv_heads * hd, hidden)
        t[lp + "self_attn.v_proj.weight"] = r(kv_heads * hd, hidden)
        t[lp + "self_attn.o_proj.weight"] = r(hidden, heads * hd)
        t[lp + "input_layernorm.weight"] = np.ones(hidden, np.float32)
        t[lp + "post_attention_layernorm.weight"] = np.ones(hidden, np.float32)
        if l < first_dense:
            t[lp + "mlp.gate_proj.weight"] = r(inter, hidden)
            t[lp + "mlp.up_proj.weight"] = r(inter, hidden)
            t[lp + "mlp.down_proj.weight"] = r(hidden, inter)
        else:
            t[lp + "mlp.gate.weight"] = r(n_experts, hidden)
            for e in range(n_experts):
                t[f"{lp}mlp.experts.{e}.gate_proj.weight"] = r(moe_inter, hidden)
                t[f"{lp}mlp.experts.{e}.up_proj.weight"] = r(moe_inter, hidden)
                t[f"{lp}mlp.experts.{e}.down_proj.weight"] = r(hidden, moe_inter)
            t[lp + "mlp.shared_experts.gate_proj.weight"] = r(moe_inter * n_shared, hidden)
            t[lp + "mlp.shared_experts.up_proj.weight"] = r(moe_inter * n_shared, hidden)
            t[lp + "mlp.shared_experts.down_proj.weight"] = r(hidden, moe_inter * n_shared)
    t[p + "norm.weight"] = np.ones(hidden, np.float32)
    t["language.lm_head.weight"] = r(vocab, hidden)
    # ---- vision (timm SigLIP naming) ----
    side = image_size // patch
    t["vision.patch_embed.proj.weight"] = r(vit_hidden, 3, patch, patch)
    t["vision.patch_embed.proj.bias"] = r(vit_hidden)
    t["vision.pos_embed"] = r(1, side * side, vit_hidden)
    for i in range(vit_layers):
        lp = f"vision.blocks.{i}."
        t[lp + "norm1.weight"] = np.ones(vit_hidden, np.float32)
        t[lp + "norm1.bias"] = np.zeros(vit_hidden, np.float32)
        t[lp + "attn.qkv.weight"] = r(3 * vit_hidden, vit_hidden)
        t[lp + "attn.qkv.bias"] = r(3 * vit_hidden)
        t[lp + "attn.proj.weight"] = r(vit_hidden, vit_hidden)
        t[lp + "attn.proj.bias"] = r(vit_hidden)
        t[lp + "norm2.weight"] = np.ones(vit_hidden, np.float32)
        t[lp + "norm2.bias"] = np.zeros(vit_hidden, np.float32)
        t[lp + "mlp.fc1.weight"] = r(2 * vit_hidden, vit_hidden)
        t[lp + "mlp.fc1.bias"] = r(2 * vit_hidden)
        t[lp + "mlp.fc2.weight"] = r(vit_hidden, 2 * vit_hidden)
        t[lp + "mlp.fc2.bias"] = r(vit_hidden)
    t["vision.norm.weight"] = np.ones(vit_hidden, np.float32)
    t["vision.norm.bias"] = np.zeros(vit_hidden, np.float32)
    # ---- projector (depth 2) + special embeds ----
    t["projector.layers.0.weight"] = r(n_embed, vit_hidden * 4)
    t["projector.layers.0.bias"] = r(n_embed)
    t["projector.layers.2.weight"] = r(hidden, n_embed)
    t["projector.layers.2.bias"] = r(hidden)
    t["image_newline"] = r(hidden)
    t["view_seperator"] = r(hidden)
    st.save_file(t, str(path / "model.safetensors"))

    config = {
        "model_type": "deepseek_vl_v2",
        "global_view_pos": "head",
        "candidate_resolutions": [[28, 28], [28, 56], [56, 28]],
        "image_token_id": 60,
        "vision_config": {"params": {"width": vit_hidden, "layers": vit_layers,
                                     "heads": 2, "intermediate_size": 2 * vit_hidden,
                                     "image_size": image_size, "patch_size": patch}},
        "projector_config": {"depth": 2, "downsample_ratio": 2,
                             "n_embed": n_embed, "mlp_ratio": 1},
        "language_config": {
            "model_type": "deepseek_v2", "vocab_size": vocab,
            "hidden_size": hidden, "intermediate_size": inter,
            "moe_intermediate_size": moe_inter,
            "num_hidden_layers": n_layers, "num_attention_heads": heads,
            "num_key_value_heads": kv_heads, "max_position_embeddings": 128,
            "n_routed_experts": n_experts, "num_experts_per_tok": top_k,
            "n_shared_experts": n_shared, "first_k_dense_replace": first_dense,
            "scoring_func": "softmax", "norm_topk_prob": False,
            "routed_scaling_factor": 1.0, "eos_token_id": 2,
        },
    }
    with open(path / "config.json", "w") as f:
        json.dump(config, f)


@pytest.fixture(scope="module")
def vl2_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_dsvl2")
    make_deepseek_vl2_checkpoint(path)
    return str(path)


def test_lm_segments_and_forward(vl2_path):
    factory = getModelFactory(ModelFactoryConfig(path=vl2_path, dtype="float32",
                                                 attention_impl="jnp"))
    lm = factory.getLanguageModel()
    # layer 0 dense, layers 1-2 moe → body (layers 0,1) splits into 2 segments
    segs = lm.weights["layers_segments"]
    assert len(segs) == 2
    assert "moe_router" not in segs[0] and "moe_router" in segs[1]
    assert "gate_up" in segs[1]  # shared experts present

    import os, sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_mixtral_gpt2_vs_hf import greedy_generate
    lcfg = factory.getLanguageModelConfig()
    out = greedy_generate(lm, lcfg, [1, 5, 9, 3], 5)
    assert len(out) == 5 and all(0 <= t < 64 for t in out)
    # deterministic
    assert out == greedy_generate(lm, lcfg, [1, 5, 9, 3], 5)


def test_vision_merge_token_count(vl2_path):
    factory = getModelFactory(ModelFactoryConfig(path=vl2_path, dtype="float32"))
    vm = factory.getVisionModel()
    calc = factory.getVisionModelConfig().image_token_calculator
    proc = factory.getProcessor()

    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (28, 50, 3), dtype=np.uint8))
    views = np.asarray(proc.process(img))        # global + 2x1 tiles
    assert views.shape == (3, 3, 28, 28)

    out = vm.forward(jnp.asarray(views),
                     VisionModelParameters(original_image_sizes=[(28, 50)]))
    n_tokens = out.image_features.shape[1]
    assert n_tokens == calc.get_num_image_tokens((28, 50))
    # h=w=1 after downsample of 2x2 grid; global h(w+1)=2, local 1*(2*1+1)=3, +1 sep
    assert n_tokens == 6


def test_engine_e2e(vl2_path):
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
    from hydrainfer_tpu.request import Request, SamplingParameters

    factory = getModelFactory(ModelFactoryConfig(path=vl2_path, dtype="float32",
                                                 attention_impl="jnp"))
    factory.getTokenizer = lambda: SimpleTokenizer(
        image_token="<image>", image_token_id=60, eos_token_id=2)
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=8, image_block_size=8)
    cfg.model.dtype = "float32"
    engine = OfflineEngine(cfg, model_factory=factory)
    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, (30, 30, 3), dtype=np.uint8))
    outs = engine.generate([
        Request(request_id="t", prompt="ab cd",
                sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True)),
        Request(request_id="i", prompt="<image> x", image=img,
                sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True)),
    ], timeout_s=120)
    assert all(len(o.output_token_ids) == 4 for o in outs)
