"""Builder-owned multi-layer paged-attention kernel vs the numpy oracle.

Runs the Pallas kernel in interpret mode on CPU over the same cases as the
jnp path (tests/ops/test_paged_attention.py), plus kernel-specific stress:
multiple q blocks per sequence, multiple kv blocks per sequence, nonzero
layer index, GQA ratios, and int8 KV with static scales.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.pallas.paged_attention import layered_paged_attention
from tests.ops.test_paged_attention import build_case


def run_kernel(q, cache, params, *, layer=0, dtype=jnp.float32,
               k_scale=None, v_scale=None, nq=None, pp=None):
    D = q.shape[-1]
    out = layered_paged_attention(
        jnp.asarray(q).astype(dtype),
        jnp.asarray(cache).astype(dtype if k_scale is None else jnp.int8),
        jnp.asarray([layer], jnp.int32),
        params.kv_lens,
        jnp.maximum(params.block_tables, 0),
        params.cu_q_lens,
        params.num_seqs,
        sm_scale=1.0 / float(np.sqrt(D)),
        k_scale=k_scale, v_scale=v_scale,
        num_queries_per_block=nq,
        num_kv_pages_per_block=pp,
        interpret=True,
    )
    return np.asarray(out.astype(jnp.float32))


@pytest.mark.parametrize("seq_specs", [
    [(1, 1)],                       # single-token prefill
    [(5, 5)],                       # full prefill
    [(1, 9)],                       # decode with history
    [(1, 4), (1, 7), (1, 12)],      # decode batch
    [(6, 6), (1, 9), (3, 11)],      # mixed prefill + decode + chunked tail
])
def test_vs_oracle(seq_specs):
    rng = np.random.default_rng(0)
    q, cache, params, expected = build_case(rng, seq_specs)
    out = run_kernel(q, cache, params)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_multi_q_block_walk():
    """Prefill longer than the q block: the grid walks q blocks and the
    (seq, buf) state must carry across them."""
    rng = np.random.default_rng(1)
    specs = [(10, 10), (1, 6), (7, 13)]
    q, cache, params, expected = build_case(rng, specs)
    out = run_kernel(q, cache, params, nq=8)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_multi_kv_block_walk():
    """kv length spanning several page blocks: online softmax across blocks."""
    rng = np.random.default_rng(2)
    specs = [(1, 37), (2, 21)]
    q, cache, params, expected = build_case(rng, specs)
    out = run_kernel(q, cache, params, pp=2)  # 2 pages * 4 slots = 8 kv per blk
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_nonzero_layer_index():
    """The layer scalar selects the right layer's pages from the full cache."""
    rng = np.random.default_rng(3)
    q, cache, params, expected = build_case(rng, [(2, 6), (1, 9)], L=3)
    # poison the other layers so a wrong layer read fails loudly
    cache = np.array(cache)
    layer1 = cache[1].copy()
    cache[0] = 1e3
    cache[2] = -1e3
    cache[1] = layer1
    out = run_kernel(q, cache, params, layer=1)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_padded_sequences():
    rng = np.random.default_rng(4)
    q, cache, params, expected = build_case(rng, [(2, 6), (1, 3)],
                                            T_pad=8, S_pad=4)
    out = run_kernel(q, cache, params)
    valid = 3
    np.testing.assert_allclose(out[:valid], expected[:valid],
                               rtol=2e-4, atol=2e-4)
    assert np.all(np.isfinite(out))


def test_gqa_ratio_4():
    rng = np.random.default_rng(5)
    q, cache, params, expected = build_case(rng, [(3, 8), (1, 5)], H=8, KVH=2)
    out = run_kernel(q, cache, params)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_bf16_matches_oracle_loosely():
    rng = np.random.default_rng(6)
    q, cache, params, expected = build_case(rng, [(4, 9), (1, 12)])
    out = run_kernel(q, cache, params, dtype=jnp.bfloat16)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=5e-2, atol=5e-2)


def test_int8_kv_with_scale():
    """Cache stored as int8 with a static dequant scale: matches the oracle
    computed over the dequantized values."""
    rng = np.random.default_rng(7)
    q, cache, params, expected = build_case(rng, [(2, 7), (1, 11)])
    scale = 0.05
    cache_q = np.clip(np.round(cache / scale), -127, 127).astype(np.int8)
    # recompute the oracle on the dequantized cache via the jnp path
    from hydrainfer_tpu.ops.attention import paged_attention_jnp
    ref = paged_attention_jnp(
        jnp.asarray(q), jnp.asarray(cache_q), 0, params,
        1.0 / np.sqrt(q.shape[-1]), max_q=2, kv_scale=scale)
    out = run_kernel(q, cache_q.astype(np.float32), params,
                     k_scale=scale, v_scale=scale)
    # run_kernel casts to int8 when k_scale is set
    np.testing.assert_allclose(out[: expected.shape[0]],
                               np.asarray(ref)[: expected.shape[0]],
                               rtol=2e-3, atol=2e-3)
