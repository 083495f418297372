"""DeepSeek-V3 MLA parity vs HF: the absorbed latent-cache attention plus
the noaux_tc grouped gate must reproduce HF logits and greedy tokens
token-exactly. The reference cannot run this comparison at all — its
DeepSeek model is plain GQA (hydrainfer/model/deepseek_v3.py:158-183), and
every real DeepSeek-V2/V3 checkpoint is MLA."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory

VOCAB = 64


def make_ckpt(tmp_path_factory, q_lora_rank):
    path = tmp_path_factory.mktemp(f"tiny_dsv3_{q_lora_rank}")
    cfg = transformers.DeepseekV3Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        kv_lora_rank=16, q_lora_rank=q_lora_rank,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=128, rope_interleave=True,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.DeepseekV3ForCausalLM(cfg).eval().float()
    # exercise a non-trivial correction bias (zero-init by default)
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    model.save_pretrained(path, safe_serialization=True)
    model.generation_config.eos_token_id = None
    return str(path), model


@pytest.fixture(scope="module")
def tiny_dsv3(tmp_path_factory):
    return make_ckpt(tmp_path_factory, q_lora_rank=24)


@pytest.fixture(scope="module")
def tiny_dsv3_noqlora(tmp_path_factory):
    return make_ckpt(tmp_path_factory, q_lora_rank=None)


def _generate_ours(path, prompt, n_new):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama_vs_hf import make_single_seq_batch

    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    assert lcfg.n_kv_heads == 1 and lcfg.head_dim == 16 + 8  # latent cache
    cache = jnp.zeros((lcfg.n_layers, 1, 16, 4, 2 * lcfg.n_kv_heads,
                       lcfg.head_dim), jnp.float32)
    batch, T = make_single_seq_batch(prompt, n_past=0)
    cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=T)
    out = [int(tokens[0])]
    for _ in range(n_new - 1):
        batch, _ = make_single_seq_batch([out[-1]],
                                         n_past=len(prompt) + len(out) - 1)
        cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=1)
        out.append(int(tokens[0]))
    return out, logits


def _check(path, hf, seed):
    prompt = list(np.random.default_rng(seed).integers(0, VOCAB, size=9))
    ours, logits = _generate_ours(path, prompt, 6)
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor([prompt])).logits[0, -1]
        hf_out = hf.generate(input_ids=torch.tensor([prompt]),
                             max_new_tokens=6, do_sample=False)
    np.testing.assert_allclose(np.asarray(logits)[0], hf_logits.numpy(),
                               rtol=3e-3, atol=3e-3)
    assert ours == hf_out[0, len(prompt):].tolist()


def test_mla_qlora_token_exact_vs_hf(tiny_dsv3):
    _check(*tiny_dsv3, seed=3)


def test_mla_int8_kv_close_to_fp32(tiny_dsv3):
    """INT8 latent cache (single-plane, one static scale for the whole
    [c_kv|k_pe] vector): logits must stay close to the fp32-cache run and
    greedy decode must still work end-to-end. This is the BASELINE
    INT8-KV config applied where the byte saving compounds (MLA)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_llama_vs_hf import make_single_seq_batch

    path, _ = tiny_dsv3
    prompt = list(np.random.default_rng(7).integers(0, VOCAB, size=9))

    def run(kv_dtype):
        factory = getModelFactory(ModelFactoryConfig(
            path=path, dtype="float32", attention_impl="jnp",
            kv_cache_dtype=kv_dtype))
        lm = factory.getLanguageModel()
        lcfg = factory.getLanguageModelConfig()
        cache_dtype = jnp.int8 if kv_dtype == "int8" else jnp.float32
        cache = jnp.zeros((lcfg.n_layers, 1, 16, 4, 2 * lcfg.n_kv_heads,
                           lcfg.head_dim), cache_dtype)
        batch, T = make_single_seq_batch(prompt, n_past=0)
        cache, tokens, logits = lm.forward_with_logits(cache, batch, max_q=T)
        out = [int(tokens[0])]
        for _ in range(4):
            batch, _ = make_single_seq_batch([out[-1]],
                                             n_past=len(prompt) + len(out) - 1)
            cache, tokens, _ = lm.forward_with_logits(cache, batch, max_q=1)
            out.append(int(tokens[0]))
        return out, np.asarray(logits)[0]

    fp_out, fp_logits = run("auto")
    q_out, q_logits = run("int8")
    # static-scale int8 quantization of the latent vector: small logit
    # perturbation, same scale class as weight-int8 (not token-exact)
    np.testing.assert_allclose(q_logits, fp_logits, atol=0.35, rtol=0.1)
    assert len(q_out) == 5


def test_mla_plain_q_token_exact_vs_hf(tiny_dsv3_noqlora):
    _check(*tiny_dsv3_noqlora, seed=4)


def test_mla_engine_fused_matches_single(tiny_dsv3, monkeypatch):
    """Full engine over the MLA model (latent paged KV cache) with the
    fused decode window vs single-step."""
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.deepseek_v3 import DeepSeekModelFactory
    from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
    from hydrainfer_tpu.request import Request, SamplingParameters

    path, _ = tiny_dsv3
    monkeypatch.setattr(
        DeepSeekModelFactory, "getTokenizer",
        lambda self: SimpleTokenizer(image_token="<image>",
                                     image_token_id=0, eos_token_id=1))

    def run(multi_step):
        factory = DeepSeekModelFactory(
            ModelFactoryConfig(path=path, dtype="float32",
                               attention_impl="jnp"), None)
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        cfg.multi_step_decode = multi_step
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
        reqs = [Request(request_id=f"r{i}", prompt=p,
                        sampling_params=SamplingParameters(max_tokens=8,
                                                           ignore_eos=True))
                for i, p in enumerate(["! %&", "&&! %%"])]
        outs = engine.generate(reqs, timeout_s=600)
        return [o.output_token_ids for o in outs]

    single = run(1)
    fused = run(4)
    assert [len(t) for t in single] == [8, 8]
    assert fused == single


def test_mla_engine_tp_matches_single(tiny_dsv3, monkeypatch):
    """TP over MLA (real-V3 serving shape): q heads / W_UK / W_UV / o_proj
    shard over 'tp', the latent cache replicates — tokens must match the
    single-device engine exactly."""
    import jax
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.deepseek_v3 import DeepSeekModelFactory
    from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
    from hydrainfer_tpu.request import Request, SamplingParameters

    path, _ = tiny_dsv3
    monkeypatch.setattr(
        DeepSeekModelFactory, "getTokenizer",
        lambda self: SimpleTokenizer(image_token="<image>",
                                     image_token_id=0, eos_token_id=1))

    def run(devices=None):
        factory = DeepSeekModelFactory(
            ModelFactoryConfig(path=path, dtype="float32",
                               attention_impl="jnp"), None)
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD",
                               devices=devices)
        reqs = [Request(request_id=f"r{i}", prompt=p,
                        sampling_params=SamplingParameters(max_tokens=8,
                                                           ignore_eos=True))
                for i, p in enumerate(["! %&", "&&! %%"])]
        outs = engine.generate(reqs, timeout_s=600)
        return [o.output_token_ids for o in outs]

    single = run()
    tp = run(devices=jax.devices()[:4])   # 4 q heads over tp=4
    assert [len(t) for t in single] == [8, 8]
    assert tp == single


def test_mla_yarn_token_exact_vs_hf(tmp_path_factory):
    """Real DeepSeek checkpoints all ship YaRN rope scaling: interpolated
    inverse frequencies + attention_factor on cos/sin + mscale^2 on the
    softmax scale must all match HF token-for-token."""
    path = tmp_path_factory.mktemp("tiny_dsv3_yarn")
    cfg = transformers.DeepseekV3Config(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, routed_scaling_factor=1.0,
        norm_topk_prob=True, first_k_dense_replace=1,
        kv_lora_rank=16, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=128, rope_interleave=True,
        rope_scaling={"type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 64,
                      "mscale": 1.0, "mscale_all_dim": 1.0,
                      "beta_fast": 32, "beta_slow": 1})
    torch.manual_seed(7)
    hf = transformers.DeepseekV3ForCausalLM(cfg).eval().float()
    hf.save_pretrained(str(path), safe_serialization=True)
    hf.generation_config.eos_token_id = None
    _check(str(path), hf, seed=11)
