"""Activation ops (reference: hydrainfer/layer/activation.py, csrc/kernel/activation/activation.cu:13-57).

The fused gate activations take the concatenated [gate, up] projection output
and return act(gate) * up — matching the reference's SiluAndMul contract.
"""
import jax
import jax.numpy as jnp


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up


def gelu_and_mul(gate_up: jax.Array, approximate: bool = True) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    act = jax.nn.gelu(gate.astype(jnp.float32), approximate=approximate)
    return act.astype(up.dtype) * up


def quick_gelu(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def new_gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)
