"""Pallas fused dequant-matmul vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.pallas.quant_matmul import quant_matmul_int8
from hydrainfer_tpu.ops.quant import quantize_int8

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("M,K,N,bk,bn", [
    (8, 256, 256, 128, 128),
    (3, 512, 384, 256, 128),    # M padded to sublanes
    (32, 1024, 512, 512, 512),
])
def test_matches_reference(M, K, N, bk, bn):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.1)
    qt = quantize_int8(w)
    out = quant_matmul_int8(x, qt.q, qt.scale, block_k=bk, block_n=bn,
                            interpret=INTERPRET)
    expected = (jnp.dot(x, qt.q.astype(jnp.float32))
                * qt.scale[None, :]).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)


def test_single_k_tile():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    qt = quantize_int8(w)
    out = quant_matmul_int8(x, qt.q, qt.scale, block_k=128, block_n=128,
                            interpret=INTERPRET)
    expected = jnp.dot(x, qt.q.astype(jnp.float32)) * qt.scale[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-3, atol=2e-3)
