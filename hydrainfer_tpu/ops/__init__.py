from .cache_ops import write_token_cache, write_kv_cache, gather_token_cache
from .rope import RotaryEmbedding, compute_default_inv_freq, apply_rotary_emb
from .norm import rms_norm, layer_norm
from .activation import silu_and_mul, gelu_and_mul, quick_gelu, new_gelu
from .attention import (
    PagedAttentionParams,
    paged_attention,
    mha_varlen,
)

__all__ = [
    "write_token_cache",
    "write_kv_cache",
    "gather_token_cache",
    "RotaryEmbedding",
    "compute_default_inv_freq",
    "apply_rotary_emb",
    "rms_norm",
    "layer_norm",
    "silu_and_mul",
    "gelu_and_mul",
    "quick_gelu",
    "new_gelu",
    "PagedAttentionParams",
    "paged_attention",
    "mha_varlen",
]
