"""Random weight initialization at real architectures.

Used by bench.py and __graft_entry__ (no model weights ship in this
environment) and by sharding tests: the tensors have the exact shapes and
dtypes of the converted checkpoints, so performance and compilation are
representative of the real models.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .clip import CLIPVisionConfig
from .decoder import DecoderConfig


def _init(key, shape, dtype, scale=0.02):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def init_decoder_weights(cfg: DecoderConfig, key: jax.Array,
                         dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(key, cfg.n_layers * 4 + 4))
    H = cfg.hidden_size
    qkv_out = (cfg.n_qo_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    w = {"embed": _init(next(keys), (cfg.vocab_size, H), dtype), "layers": []}
    for _ in range(cfg.n_layers):
        w["layers"].append({
            "qkv_proj": _init(next(keys), (H, qkv_out), dtype),
            "qkv_bias": (jnp.zeros((qkv_out,), dtype) if cfg.qkv_bias else None),
            "o_proj": _init(next(keys), (cfg.n_qo_heads * cfg.head_dim, H), dtype),
            "gate_up": _init(next(keys), (H, 2 * cfg.intermediate_size), dtype),
            "down": _init(next(keys), (cfg.intermediate_size, H), dtype),
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
        })
    w["norm"] = jnp.ones((H,), dtype)
    w["lm_head"] = _init(next(keys), (H, cfg.vocab_size), dtype)
    return w


def init_clip_weights(cfg: CLIPVisionConfig, key: jax.Array,
                      dtype=jnp.bfloat16, lm_hidden: Optional[int] = None) -> dict:
    """CLIP tower weights; if lm_hidden is given, adds the LLaVA projector."""
    keys = iter(jax.random.split(key, cfg.n_layers * 6 + 8))
    H = cfg.hidden_size
    n_pos = cfg.n_patches + 1
    w = {
        "patch_embed": _init(next(keys), (3 * cfg.patch_size ** 2, H), dtype),
        "class_embed": _init(next(keys), (H,), dtype),
        "pos_embed": _init(next(keys), (n_pos, H), dtype),
        "pre_norm": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        w["layers"].append({
            "ln1": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
            "qkv": (_init(next(keys), (H, 3 * H), dtype), jnp.zeros((3 * H,), dtype)),
            "out": (_init(next(keys), (H, H), dtype), jnp.zeros((H,), dtype)),
            "ln2": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
            "fc1": (_init(next(keys), (H, cfg.intermediate_size), dtype),
                    jnp.zeros((cfg.intermediate_size,), dtype)),
            "fc2": (_init(next(keys), (cfg.intermediate_size, H), dtype),
                    jnp.zeros((H,), dtype)),
        })
    if lm_hidden is not None:
        clip_w = w
        w = {"clip": clip_w,
             "proj1": (_init(next(keys), (H, lm_hidden), dtype),
                       jnp.zeros((lm_hidden,), dtype)),
             "proj2": (_init(next(keys), (lm_hidden, lm_hidden), dtype),
                       jnp.zeros((lm_hidden,), dtype))}
    return w


# Real-architecture decoder configs for benches (shapes from the HF configs
# of the models the reference serves; weights random).
ARCH_CONFIGS = {
    # vicuna-7b inside llava-1.5-7b-hf
    "llava-7b-lm": DecoderConfig(
        n_layers=32, hidden_size=4096, intermediate_size=11008,
        n_qo_heads=32, n_kv_heads=32, head_dim=128, vocab_size=32064,
        max_position_embeddings=4096),
    # Qwen2-VL-2B language tower
    "qwen2-vl-2b-lm": DecoderConfig(
        n_layers=28, hidden_size=1536, intermediate_size=8960,
        n_qo_heads=12, n_kv_heads=2, head_dim=128, vocab_size=151936,
        max_position_embeddings=32768, qkv_bias=True, rope_theta=1e6,
        tie_word_embeddings=True),
    # CPU-runnable smoke size
    "tiny-lm": DecoderConfig(
        n_layers=2, hidden_size=128, intermediate_size=256,
        n_qo_heads=4, n_kv_heads=2, head_dim=32, vocab_size=1024,
        max_position_embeddings=2048),
}

CLIP_L_336 = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                              n_layers=23, n_heads=16, image_size=336,
                              patch_size=14)
