"""DeepSeek V2/V3-family MoE language model.

From-scratch functional equivalent of the reference's DeepSeek LM
(reference: hydrainfer/model/deepseek_v3.py — MoEGate with softmax/sigmoid
greedy top-k + routed scaling (:40-93), dense first_k layers then MoE with
shared experts (:95-156), STANDARD GQA attention: like the reference, MLA is
not implemented (:158-183 uses plain q/k/v projections), so only non-MLA
checkpoints load). Experts run as grouped ragged_dot matmuls via the shared
decoder's MoE path.
"""
import dataclasses
import json
import os

import jax.numpy as jnp

from .factory import (LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModelConfig)
from .llama import LlamaForCausalLM, decoder_config_from_hf
from .text_only import _NoImages
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore


def deepseek_decoder_config(text_cfg: dict, attention_impl: str = "auto",
                            layer_loop: str = "auto"):
    base = decoder_config_from_hf(text_cfg, attention_impl, layer_loop=layer_loop)
    return dataclasses.replace(
        base,
        moe_top_k=text_cfg.get("num_experts_per_tok", 0) or 0,
        n_experts=text_cfg.get("n_routed_experts", 0) or 0,
        moe_scoring=text_cfg.get("scoring_func", "softmax"),
        moe_norm_topk=bool(text_cfg.get("norm_topk_prob", True)),
        moe_routed_scaling=float(text_cfg.get("routed_scaling_factor", 1.0)))


def convert_deepseek_weights(store: WeightStore, cfg, text_cfg: dict,
                             prefix: str = "model.",
                             lm_head_name: str = "lm_head") -> dict:
    first_dense = text_cfg.get("first_k_dense_replace", 0)
    n_experts = cfg.n_experts
    n_shared = text_cfg.get("n_shared_experts", 0) or 0

    w = {"embed": store.get(f"{prefix}embed_tokens.weight"), "layers": []}
    for l in range(cfg.n_layers):
        p = f"{prefix}layers.{l}."
        lw = {
            "qkv_proj": store.fused_linear(
                [p + "self_attn.q_proj", p + "self_attn.k_proj",
                 p + "self_attn.v_proj"]),
            "o_proj": store.linear(p + "self_attn.o_proj"),
            "input_norm": store.get(p + "input_layernorm.weight"),
            "post_norm": store.get(p + "post_attention_layernorm.weight"),
        }
        if cfg.moe_top_k > 0 and l >= first_dense:
            lw["moe_router"] = store.linear(p + "mlp.gate")
            lw["moe_gate_up"] = jnp.stack([
                store.fused_linear([f"{p}mlp.experts.{e}.gate_proj",
                                    f"{p}mlp.experts.{e}.up_proj"])
                for e in range(n_experts)])
            lw["moe_down"] = jnp.stack([
                store.linear(f"{p}mlp.experts.{e}.down_proj")
                for e in range(n_experts)])
            if n_shared:
                lw["gate_up"] = store.fused_linear(
                    [p + "mlp.shared_experts.gate_proj",
                     p + "mlp.shared_experts.up_proj"])
                lw["down"] = store.linear(p + "mlp.shared_experts.down_proj")
        else:
            lw["gate_up"] = store.fused_linear([p + "mlp.gate_proj",
                                                p + "mlp.up_proj"])
            lw["down"] = store.linear(p + "mlp.down_proj")
        w["layers"].append(lw)
    w["norm"] = store.get(f"{prefix}norm.weight")
    w["lm_head"] = (jnp.transpose(w["embed"]) if cfg.tie_word_embeddings
                    or not store.has(lm_head_name + ".weight")
                    else store.linear(lm_head_name))
    return w


class DeepSeekModelFactory(ModelFactory):
    """Text-only DeepSeek V2/V3 (non-MLA) checkpoints."""

    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        self.text_cfg = self.hf_cfg.get("text_config", self.hf_cfg)
        self.decoder_cfg = deepseek_decoder_config(
            self.text_cfg, config.attention_impl, layer_loop=config.layer_loop)
        self._lm = None

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
            weights = convert_deepseek_weights(store, self.decoder_cfg,
                                               self.text_cfg)
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self):
        return None

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig("", -1, _NoImages())

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=self.text_cfg.get("eos_token_id", 1),
            hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self):
        return None

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
