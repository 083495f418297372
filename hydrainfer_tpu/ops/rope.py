"""Rotary position embeddings.

Behavioral parity with the reference's RotaryEmbedding
(reference: hydrainfer/layer/rotary_embedding.py:19-146 and the fused CUDA
kernel csrc/kernel/position_embedding/rope.cu:32-118): cos/sin lookup cache,
both `interleaved` (GPT-J pair) and half-rotated (NeoX) modes, applied to the
leading `rotary_dim` of each head. On TPU this is pure jnp — XLA fuses the
gather + elementwise rotate into the surrounding matmuls, so a custom kernel
buys nothing.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def compute_default_inv_freq(rotary_dim: int, theta: float) -> jax.Array:
    exponents = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    return 1.0 / (theta ** exponents)


@functools.partial(jax.jit, static_argnames=("interleaved",))
def apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array,
                     interleaved: bool = False) -> jax.Array:
    """Rotate the leading rotary_dim dims of each head.

    x:        (n_tokens, n_heads, head_dim)
    cos, sin: (n_tokens, rotary_dim // 2)  — already gathered per token
    """
    rotary_dim = cos.shape[-1] * 2
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    cos = cos[:, None, :].astype(jnp.float32)
    sin = sin[:, None, :].astype(jnp.float32)
    xf = x_rot.astype(jnp.float32)
    if interleaved:
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        rotated = jnp.stack([o1, o2], axis=-1).reshape(x_rot.shape)
    else:
        half = rotary_dim // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        rotated = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([rotated.astype(x.dtype), x_pass], axis=-1)


def mrope_gather(cos_tab: jax.Array, sin_tab: jax.Array,
                 pos_t: jax.Array, pos_h: jax.Array, pos_w: jax.Array,
                 section: Tuple[int, ...]):
    """Multimodal RoPE (Qwen2-VL): three position streams share one
    frequency table; frequency dim d takes its angle from stream
    section_id(d), with sections [s_t, s_h, s_w] summing to rotary_dim/2
    (HF Qwen2VLRotaryEmbedding's mrope_section). Text tokens carry equal
    t/h/w positions, so this degenerates to standard 1D RoPE for them.
    Neither the reference nor its vendored model implements M-RoPE
    (reference: hydrainfer/model/qwen2_vl.py:230-238 — plain 1D rope);
    this matches HF exactly, image prompts included.

    Returns per-token (cos, sin) of shape (T, rotary_dim/2) ready for
    apply_rotary_emb."""
    assert len(section) == 3, section
    sec_id = jnp.asarray(
        sum(([i] * s for i, s in enumerate(section)), []), jnp.int32)
    cos3 = jnp.stack([jnp.take(cos_tab, pos_t, axis=0),
                      jnp.take(cos_tab, pos_h, axis=0),
                      jnp.take(cos_tab, pos_w, axis=0)])   # (3, T, rd/2)
    sin3 = jnp.stack([jnp.take(sin_tab, pos_t, axis=0),
                      jnp.take(sin_tab, pos_h, axis=0),
                      jnp.take(sin_tab, pos_w, axis=0)])
    sel = sec_id[None, None, :] == jnp.arange(3)[:, None, None]
    cos = jnp.sum(jnp.where(sel, cos3, 0.0), axis=0)
    sin = jnp.sum(jnp.where(sel, sin3, 0.0), axis=0)
    return cos, sin


class RotaryEmbedding:
    """Precomputed cos/sin table indexed by absolute position."""

    def __init__(self, rotary_dim: int, max_position: int,
                 inv_freq: jax.Array, interleaved: bool = False,
                 scaling_factor: float = 1.0):
        self.rotary_dim = rotary_dim
        self.interleaved = interleaved
        t = jnp.arange(max_position, dtype=jnp.float32) / scaling_factor
        freqs = jnp.einsum("i,j->ij", t, inv_freq.astype(jnp.float32))
        self.cos = jnp.cos(freqs)  # (max_position, rotary_dim // 2)
        self.sin = jnp.sin(freqs)

    def __call__(self, q: jax.Array, k: jax.Array,
                 positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """q, k: (n_tokens, n_heads, head_dim); positions: (n_tokens,)."""
        cos = jnp.take(self.cos, positions, axis=0)
        sin = jnp.take(self.sin, positions, axis=0)
        return (apply_rotary_emb(q, cos, sin, self.interleaved),
                apply_rotary_emb(k, cos, sin, self.interleaved))
