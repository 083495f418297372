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
