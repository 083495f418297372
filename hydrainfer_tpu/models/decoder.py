"""Shared paged-attention decoder blocks for Llama-family language models.

TPU-native re-design of the reference's shared forward blocks
(reference: hydrainfer/model/model_forward.py:39-105 — UpDownMLP,
GateUpDownMLP, ROPECausalGroupedQueryPageAttention, DecoderLayer with
last-layer token discard). One pure function `decoder_forward` runs the whole
stack inside a single jit: embed → (overwrite image slots) → N decoder
layers (fused-QKV matmul → rope → paged KV append → paged attention →
fused gate-up MLP) → final norm → lm_head on ONLY the sampled rows →
greedy argmax.

The last-layer token-discard optimization survives in static-shape form:
after the final layer's attention (which must see all T tokens to append
their KV), the residual stream is gathered down to the S sampled rows before
the final MLP and the lm_head matmul (reference: model_forward.py:101-103).
"""
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activation import silu_and_mul
from ..ops.attention import paged_attention
from ..ops.cache_ops import write_kv_cache
from ..ops.norm import rms_norm
from ..ops.rope import apply_rotary_emb
from .factory import LanguageModelBatch


@dataclass(frozen=True)
class DecoderConfig:
    n_layers: int
    hidden_size: int
    intermediate_size: int
    n_qo_heads: int
    n_kv_heads: int
    head_dim: int
    vocab_size: int
    max_position_embeddings: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = False
    rope_interleaved: bool = False
    tie_word_embeddings: bool = False
    attention_impl: str = "auto"


def init_rope_tables(cfg: DecoderConfig) -> Tuple[jax.Array, jax.Array]:
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))
    t = jnp.arange(cfg.max_position_embeddings, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv)
    return jnp.cos(freqs), jnp.sin(freqs)


def attention_block(x: jax.Array, cache: jax.Array, layer_id: int, lw: dict,
                    batch: LanguageModelBatch, cos_tab, sin_tab,
                    cfg: DecoderConfig, max_q: int) -> Tuple[jax.Array, jax.Array]:
    """Fused-QKV projection, rope, KV append, paged attention, output proj."""
    T = x.shape[0]
    Hq, Hkv, D = cfg.n_qo_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms_norm(x, lw["input_norm"], cfg.rms_norm_eps)
    qkv = h @ lw["qkv_proj"]
    if lw.get("qkv_bias") is not None:
        qkv = qkv + lw["qkv_bias"]
    q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
    q = q.reshape(T, Hq, D)
    k = k.reshape(T, Hkv, D)
    v = v.reshape(T, Hkv, D)

    cos = jnp.take(cos_tab, batch.positions, axis=0)
    sin = jnp.take(sin_tab, batch.positions, axis=0)
    q = apply_rotary_emb(q, cos, sin, cfg.rope_interleaved)
    k = apply_rotary_emb(k, cos, sin, cfg.rope_interleaved)

    block_size = cache.shape[3]
    cache = write_kv_cache(cache, layer_id, batch.attention.new_kv_slot_ids,
                           k, v, block_size)
    attn = paged_attention(q, cache, layer_id, batch.attention,
                           1.0 / (D ** 0.5), max_q, impl=cfg.attention_impl)
    out = attn.reshape(T, Hq * D) @ lw["o_proj"]
    return x + out, cache


def mlp_block(x: jax.Array, lw: dict, cfg: DecoderConfig) -> jax.Array:
    h = rms_norm(x, lw["post_norm"], cfg.rms_norm_eps)
    return x + silu_and_mul(h @ lw["gate_up"]) @ lw["down"]


def decoder_forward(weights: dict, cache: jax.Array, batch: LanguageModelBatch,
                    cos_tab: jax.Array, sin_tab: jax.Array, cfg: DecoderConfig,
                    max_q: int, input_embeds: Optional[jax.Array] = None,
                    return_logits: bool = False):
    """Full LM step. Returns (cache, sampled_token_ids[, logits])."""
    if input_embeds is None:
        x = jnp.take(weights["embed"], batch.token_ids, axis=0)
        # splice vision features over <image> positions; padded dst (-1) maps
        # to the out-of-bounds index T so mode='drop' actually drops it
        # (negative indices would wrap numpy-style)
        dst = jnp.where(batch.image_dst_idx < 0, x.shape[0], batch.image_dst_idx)
        x = x.at[dst].set(batch.image_features.astype(x.dtype), mode="drop")
    else:
        x = input_embeds

    sample_idx = jnp.maximum(batch.sample_token_idx, 0)
    for l in range(cfg.n_layers):
        lw = weights["layers"][l]
        x, cache = attention_block(x, cache, l, lw, batch, cos_tab, sin_tab, cfg, max_q)
        if l == cfg.n_layers - 1:
            # token discard: only sampled rows continue to the last MLP/head
            x = jnp.take(x, sample_idx, axis=0)
        x = mlp_block(x, lw, cfg)

    h = rms_norm(x, weights["norm"], cfg.rms_norm_eps)
    logits = jnp.dot(h, weights["lm_head"], preferred_element_type=jnp.float32)
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if return_logits:
        return cache, tokens, logits
    return cache, tokens
