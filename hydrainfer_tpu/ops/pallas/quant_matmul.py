"""Fused INT8-weight dequant-matmul Pallas kernel.

Replaces the reference's Triton W8A8 block-quant GEMM
(reference: hydrainfer/triton/w8a8_block_fp8_matmul_kernel.py) with the
TPU-appropriate weight-only scheme: activations stay bf16, int8 weight
tiles stream HBM→VMEM at 1 byte/param and are converted to bf16 INSIDE the
kernel right before the MXU dot — the dequantized weights never exist in
HBM, which is the whole point (XLA's fallback materializes converts at
fusion boundaries and loses much of the bandwidth win).

Grid: (K_tiles, N_tiles); K is the reduction axis, innermost grid dim so
the f32 accumulator scratch carries across K tiles (output written on the
last K tile). The M (token) axis rides whole (decode batches are small).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref, *, n_k_tiles):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(x_ref.dtype)     # int8 tile → activation dtype
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k_tiles - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)
                      ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "out_dtype",
                                             "interpret"))
def quant_matmul_int8(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                      block_k: int = 512, block_n: int = 512,
                      out_dtype=None, interpret: bool = False) -> jax.Array:
    """x: (M, K) bf16/f32 · w_q: (K, N) int8 · scale: (N,) f32 → (M, N).

    K and N must be multiples of the block sizes (weights are padded at
    quantization time if needed); M is padded to the sublane count here.
    """
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and scale.shape == (N,)
    block_k = min(block_k, K)
    block_n = min(block_n, N)
    assert K % block_k == 0 and N % block_n == 0, (K, N, block_k, block_n)
    out_dtype = out_dtype or x.dtype

    m_pad = (8 - M % 8) % 8
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad

    n_k = K // block_k
    grid = (N // block_n, n_k)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k_tiles=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, block_k), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N + Mp * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, N))
    return out[:M] if m_pad else out
