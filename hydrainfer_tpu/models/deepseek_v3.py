"""DeepSeek V2/V3-family MoE language model, WITH Multi-head Latent
Attention.

From-scratch functional equivalent of the reference's DeepSeek LM
(reference: hydrainfer/model/deepseek_v3.py — MoEGate with softmax/sigmoid
greedy top-k + routed scaling (:40-93), dense first_k layers then MoE with
shared experts (:95-156)), going BEYOND it on attention: the reference uses
plain GQA projections (:158-183) so no REAL DeepSeek-V2/V3 checkpoint (all
of which are MLA) can load there. Here MLA checkpoints convert natively
(q-LoRA stack, kv_a/kv_b split into the absorbed W_UK/W_UV) and the paged
KV cache stores the compressed per-token latent (models/decoder.py:
_mla_layer) — the ~order-of-magnitude KV saving MLA exists for. Experts
run as grouped ragged_dot matmuls via the shared decoder's MoE path.
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
    base = dataclasses.replace(
        base,
        moe_top_k=text_cfg.get("num_experts_per_tok", 0) or 0,
        n_experts=text_cfg.get("n_routed_experts", 0) or 0,
        moe_scoring=text_cfg.get("scoring_func", "softmax"),
        moe_norm_topk=bool(text_cfg.get("norm_topk_prob", True)),
        moe_routed_scaling=float(text_cfg.get("routed_scaling_factor", 1.0)),
        # group-limited routing: V3's noaux_tc (sigmoid + learned bias,
        # groups by top-2 sum) and V2's group_limited_greedy (softmax, no
        # bias, groups by max)
        moe_n_groups=(text_cfg.get("n_group", 0) or 0
                      if text_cfg.get("topk_method", "noaux_tc")
                      in ("noaux_tc", "group_limited_greedy") else 0),
        moe_topk_groups=text_cfg.get("topk_group", 0) or 0,
        moe_group_method=text_cfg.get("topk_method", "noaux_tc"))
    rs = text_cfg.get("rope_scaling") or {}
    rs_type = rs.get("type") or rs.get("rope_type")
    if rs and rs_type == "yarn":
        import math
        f = float(rs.get("factor", 1.0))
        mscale, msad = rs.get("mscale"), rs.get("mscale_all_dim")

        def _ms(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        att = rs.get("attention_factor")
        if att is None:
            att = (_ms(f, mscale) / _ms(f, msad)) if (mscale and msad) \
                else _ms(f)
        base = dataclasses.replace(base, yarn=(
            f,
            int(rs.get("original_max_position_embeddings")
                or text_cfg.get("max_position_embeddings", 4096)),
            float(rs.get("beta_fast") or 32),
            float(rs.get("beta_slow") or 1),
            float(att), bool(rs.get("truncate", True))))
    elif rs and rs_type not in (None, "default"):
        raise ValueError(f"unsupported rope_scaling type {rs_type!r} for "
                         "DeepSeek — only yarn is wired")
    r = text_cfg.get("kv_lora_rank") or 0
    if r:
        # MLA: the cache holds one [c_kv | k_pe] vector per token -> kv
        # head 1 of dim r+rope; rope tables sized to the rope dims only
        dr = text_cfg["qk_rope_head_dim"]
        dn = text_cfg["qk_nope_head_dim"]
        scale = (dn + dr) ** -0.5
        if rs.get("mscale_all_dim"):
            import math
            f = float(rs.get("factor", 1.0))
            m = (0.1 * float(rs["mscale_all_dim"]) * math.log(f) + 1.0
                 if f > 1 else 1.0)
            scale = scale * m * m
        base = dataclasses.replace(
            base,
            mla_kv_lora=r, mla_rope_dim=dr, mla_nope_dim=dn,
            mla_v_dim=text_cfg["v_head_dim"],
            mla_rope_interleave=bool(text_cfg.get("rope_interleave", True)),
            mla_softmax_scale=scale,
            n_kv_heads=1, head_dim=r + dr, rope_head_dim=dr)
    return base


def convert_deepseek_weights(store: WeightStore, cfg, text_cfg: dict,
                             prefix: str = "model.",
                             lm_head_name: str = "lm_head") -> dict:
    first_dense = text_cfg.get("first_k_dense_replace", 0)
    n_experts = cfg.n_experts
    n_shared = text_cfg.get("n_shared_experts", 0) or 0

    w = {"embed": store.get(f"{prefix}embed_tokens.weight"), "layers": []}
    for l in range(cfg.n_layers):
        p = f"{prefix}layers.{l}."
        if cfg.mla_kv_lora > 0:
            lw = _mla_attention_weights(store, cfg, p)
        else:
            lw = {
                "qkv_proj": store.fused_linear(
                    [p + "self_attn.q_proj", p + "self_attn.k_proj",
                     p + "self_attn.v_proj"]),
                "o_proj": store.linear(p + "self_attn.o_proj"),
            }
        lw.update({
            "input_norm": store.get(p + "input_layernorm.weight"),
            "post_norm": store.get(p + "post_attention_layernorm.weight"),
        })
        if cfg.moe_top_k > 0 and l >= first_dense:
            lw["moe_router"] = store.linear(p + "mlp.gate")
            if cfg.moe_n_groups > 0:
                bias_name = p + "mlp.gate.e_score_correction_bias"
                lw["moe_router_bias"] = (
                    store.get(bias_name) if store.has(bias_name)
                    else jnp.zeros((cfg.n_experts,), jnp.float32))
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


def _mla_attention_weights(store: WeightStore, cfg, p: str) -> dict:
    """MLA projections; kv_b is split into the absorbed W_UK (r, H, nope)
    and W_UV (r, H, v) (reference for the HF layout:
    transformers modeling_deepseek_v3.py:380-445)."""
    import numpy as np
    H = cfg.n_qo_heads
    r, dn, dv = cfg.mla_kv_lora, cfg.mla_nope_dim, cfg.mla_v_dim
    lw = {
        "kv_a": store.linear(p + "self_attn.kv_a_proj_with_mqa"),
        "kv_a_norm": store.get(p + "self_attn.kv_a_layernorm.weight"),
        "o_proj": store.linear(p + "self_attn.o_proj"),
    }
    if store.has(p + "self_attn.q_a_proj.weight"):
        lw["q_a"] = store.linear(p + "self_attn.q_a_proj")
        lw["q_a_norm"] = store.get(p + "self_attn.q_a_layernorm.weight")
        lw["q_b"] = store.linear(p + "self_attn.q_b_proj")
    else:
        lw["q_proj"] = store.linear(p + "self_attn.q_proj")
    kv_b = store.get(p + "self_attn.kv_b_proj.weight")
    # HF stores (H*(dn+dv), r); we want (r, H, dn) / (r, H, dv)
    kv_b = jnp.transpose(kv_b.reshape(H, dn + dv, r), (2, 0, 1))
    lw["w_uk"] = kv_b[:, :, :dn]
    lw["w_uv"] = kv_b[:, :, dn:]
    return lw


class DeepSeekModelFactory(ModelFactory):
    """Text-only DeepSeek V2/V3 checkpoints, MLA and plain-GQA alike."""

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
            hidden_size=c.hidden_size, vocab_size=c.vocab_size,
            kv_single_plane=c.mla_kv_lora > 0)

    def getProcessor(self):
        return None

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
