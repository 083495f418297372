"""GPT-2 over the paged cache.

From-scratch functional equivalent of the reference's GPT-2
(reference: hydrainfer/model/gpt2.py; its TP variant gpt2_model_parallel.py
is superseded by parallel/mesh.py sharding rules). Pre-LN transformer with
learned position embeddings, fused c_attn, gelu MLP; rides the same paged
attention + token-table machinery as the Llama family.
"""
import functools
import json
import os

import jax
import jax.numpy as jnp

from ..ops.attention import paged_attention
from ..ops.cache_ops import write_kv_cache
from ..ops.norm import layer_norm
from .factory import (LanguageModel, LanguageModelConfig, LanguageModelOutput,
                      ModelFactory, ModelFactoryConfig, ModelFactoryContext,
                      VisionModelConfig, unpack_fill_batch)
from .text_only import _NoImages
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore


def convert_gpt2_weights(store: WeightStore, n_layers: int) -> dict:
    # HF GPT-2 uses Conv1D modules: weights already stored (in, out)
    p = "transformer." if store.has("transformer.wte.weight") else ""
    w = {
        "wte": store.get(p + "wte.weight"),
        "wpe": store.get(p + "wpe.weight"),
        "layers": [],
        "ln_f": (store.get(p + "ln_f.weight"), store.get(p + "ln_f.bias")),
    }
    for l in range(n_layers):
        lp = f"{p}h.{l}."
        w["layers"].append({
            "ln1": (store.get(lp + "ln_1.weight"), store.get(lp + "ln_1.bias")),
            "c_attn": (store.get(lp + "attn.c_attn.weight"),
                       store.get(lp + "attn.c_attn.bias")),
            "c_proj": (store.get(lp + "attn.c_proj.weight"),
                       store.get(lp + "attn.c_proj.bias")),
            "ln2": (store.get(lp + "ln_2.weight"), store.get(lp + "ln_2.bias")),
            "c_fc": (store.get(lp + "mlp.c_fc.weight"),
                     store.get(lp + "mlp.c_fc.bias")),
            "c_proj2": (store.get(lp + "mlp.c_proj.weight"),
                        store.get(lp + "mlp.c_proj.bias")),
        })
    return w


def gpt2_forward(weights, cache, batch, n_heads: int, max_q: int,
                 attention_impl: str = "auto", token_table=None,
                 return_logits: bool = False):
    if token_table is None:
        token_table = jnp.zeros((1,), jnp.int32)
    src = batch.token_src_slots
    token_ids = jnp.where(src >= 0,
                          jnp.take(token_table, jnp.maximum(src, 0)),
                          batch.token_ids)
    is_ref = isinstance(cache, jax.Ref)
    x = jnp.take(weights["wte"], token_ids, axis=0) \
        + jnp.take(weights["wpe"], batch.positions, axis=0)
    T, hidden = x.shape
    D = hidden // n_heads
    for l, lw in enumerate(weights["layers"]):
        h = layer_norm(x, *lw["ln1"])
        cw, cb = lw["c_attn"]
        qkv = h @ cw + cb
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(T, n_heads, D)
        k = k.reshape(T, n_heads, D)
        v = v.reshape(T, n_heads, D)
        cache = write_kv_cache(cache, l, batch.attention.new_kv_slot_ids,
                               k, v, cache.shape[3])
        attn = paged_attention(q, cache, l, batch.attention, 1.0 / (D ** 0.5),
                               max_q, impl=attention_impl)
        pw, pb = lw["c_proj"]
        x = x + (attn.reshape(T, hidden) @ pw + pb)
        h = layer_norm(x, *lw["ln2"])
        fw, fb = lw["c_fc"]
        p2w, p2b = lw["c_proj2"]
        x = x + (jax.nn.gelu(h @ fw + fb, approximate=True) @ p2w + p2b)

    sample_idx = jnp.maximum(batch.sample_token_idx, 0)
    x = jnp.take(x, sample_idx, axis=0)
    h = layer_norm(x, *weights["ln_f"])
    logits = jnp.dot(h, jnp.transpose(weights["wte"]),
                     preferred_element_type=jnp.float32)
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    dst = batch.sample_dst_slots
    dst = jnp.where(dst < 0, token_table.shape[0], dst)
    token_table = token_table.at[dst].set(tokens, mode="drop")
    cache_out = None if is_ref else cache
    if return_logits:
        return cache_out, token_table, tokens, logits
    return cache_out, token_table, tokens


class GPT2ForCausalLM(LanguageModel):
    def __init__(self, weights: dict, n_heads: int, hidden: int,
                 attention_impl: str = "auto"):
        self.weights = weights
        self.n_heads = n_heads
        self.hidden = hidden
        self._step = jax.jit(
            functools.partial(gpt2_forward, n_heads=n_heads,
                              attention_impl=attention_impl),
            static_argnames=("max_q", "return_logits"),
            donate_argnames=("cache", "token_table"))

        def _flat_fn(weights, cache, token_table, flat, image_cache, dims):
            batch = unpack_fill_batch(flat, image_cache, dims, hidden)
            return gpt2_forward(weights, cache, batch, n_heads, dims.max_q,
                                attention_impl, token_table=token_table)

        self._flat_step = jax.jit(_flat_fn, static_argnames=("dims",),
                                  donate_argnames=("token_table",))
        self._flat_step_value = jax.jit(_flat_fn, static_argnames=("dims",),
                                        donate_argnames=("cache", "token_table"))

    def forward(self, cache, token_table, batch, max_q: int) -> LanguageModelOutput:
        cache, token_table, tokens = self._step(
            self.weights, cache, batch, max_q=max_q, token_table=token_table)
        return LanguageModelOutput(tokens, cache, token_table)

    def forward_flat(self, cache, token_table, flat, image_cache, dims,
                     n_steps: int = 1, fused_k=None):
        step = (self._flat_step if isinstance(cache, jax.Ref)
                else self._flat_step_value)
        cache, token_table, tokens = step(
            self.weights, cache, token_table, flat, image_cache, dims=dims)
        return LanguageModelOutput(tokens, cache, token_table)

    def forward_with_logits(self, cache, batch, max_q: int, input_embeds=None):
        cache, _, tokens, logits = self._step(
            self.weights, cache, batch, max_q=max_q, return_logits=True,
            token_table=jnp.zeros((1,), jnp.int32))
        return cache, tokens, logits


class GPT2ModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        self._lm = None

    def getLanguageModel(self) -> GPT2ForCausalLM:
        if self._lm is None:
            store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
            weights = convert_gpt2_weights(store, self.hf_cfg["n_layer"])
            self._lm = GPT2ForCausalLM(weights, self.hf_cfg["n_head"],
                                       self.hf_cfg["n_embd"],
                                       self.config.attention_impl)
        return self._lm

    def getVisionModel(self):
        return None

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig("", -1, _NoImages())

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.hf_cfg
        return LanguageModelConfig(
            n_layers=c["n_layer"], max_position_embeddings=c.get("n_positions", 1024),
            n_qo_heads=c["n_head"], n_kv_heads=c["n_head"],
            head_dim=c["n_embd"] // c["n_head"],
            eos_token_id=c.get("eos_token_id", 50256),
            hidden_size=c["n_embd"], vocab_size=c["vocab_size"])

    def getProcessor(self):
        return None

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
