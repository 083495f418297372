"""Mixtral: top-2 sparse-MoE Llama-family decoder.

From-scratch functional equivalent of the reference's Mixtral
(reference: hydrainfer/model/mixtral.py:37-78 — top-2 expert routing with
loop-over-experts inference). Here the experts run as one grouped
`ragged_dot` matmul per projection (ops/moe.py) inside the shared decoder
scan; the reference's 2-stream expert overlap is unnecessary on TPU (the
grouped matmul is a single fused device program).
"""
import json
import os

from .factory import (LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModelConfig)
from .llama import LlamaForCausalLM, decoder_config_from_hf
from .text_only import _NoImages
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore

import jax.numpy as jnp


def convert_mixtral_weights(store: WeightStore, cfg, prefix: str = "model.",
                            lm_head_name: str = "lm_head") -> dict:
    w = {"embed": store.get(f"{prefix}embed_tokens.weight"), "layers": []}
    for l in range(cfg.n_layers):
        p = f"{prefix}layers.{l}."
        qkv = store.fused_linear(
            [p + "self_attn.q_proj", p + "self_attn.k_proj", p + "self_attn.v_proj"])
        gate_up = jnp.stack([
            store.fused_linear([f"{p}block_sparse_moe.experts.{e}.w1",
                                f"{p}block_sparse_moe.experts.{e}.w3"])
            for e in range(cfg.n_experts)])                     # (E, d, 2I)
        down = jnp.stack([
            store.linear(f"{p}block_sparse_moe.experts.{e}.w2")
            for e in range(cfg.n_experts)])                      # (E, I, d)
        w["layers"].append({
            "qkv_proj": qkv,
            "o_proj": store.linear(p + "self_attn.o_proj"),
            "moe_router": store.linear(p + "block_sparse_moe.gate"),
            "moe_gate_up": gate_up,
            "moe_down": down,
            "input_norm": store.get(p + "input_layernorm.weight"),
            "post_norm": store.get(p + "post_attention_layernorm.weight"),
        })
    w["norm"] = store.get(f"{prefix}norm.weight")
    w["lm_head"] = (jnp.transpose(w["embed"]) if cfg.tie_word_embeddings
                    else store.linear(lm_head_name))
    return w


class MixtralModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        base = decoder_config_from_hf(self.hf_cfg, config.attention_impl,
                                      layer_loop=config.layer_loop)
        import dataclasses
        self.decoder_cfg = dataclasses.replace(
            base,
            moe_top_k=self.hf_cfg.get("num_experts_per_tok", 2),
            n_experts=self.hf_cfg.get("num_local_experts", 8))
        self._lm = None

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
            weights = convert_mixtral_weights(store, self.decoder_cfg)
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
            eos_token_id=self.hf_cfg.get("eos_token_id", 2),
            hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self):
        return None

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
