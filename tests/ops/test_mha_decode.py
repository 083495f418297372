"""Builder decode-MHA kernel (ops/pallas/mha_decode.py) vs the numpy/jnp
oracles, interpret mode on CPU.

The kernel's contract is the all-decode fused window: every sequence has
exactly ONE query token and row i is sequence i. Covers single/multi kv
blocks, padded sequence/token tails, bf16, int8 with static scales, and the
head permutation round-trip through the adapter."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.attention import (paged_attention_jnp,
                                          paged_attention_mha_decode)
from hydrainfer_tpu.ops.pallas.mha_decode import (decode_head_perm,
                                                  decode_q_perm, supports)
from tests.ops.test_paged_attention import build_case


def run(q, cache, params, *, dtype=jnp.float32, kv_scale=None, pp=None):
    """Through the adapter (cache (L,1,NB,BS,CKV,D), layer 0) so the head
    permutation round-trip is part of every test."""
    cache = jnp.asarray(cache).astype(
        dtype if kv_scale is None else jnp.int8)
    out = paged_attention_mha_decode(
        jnp.asarray(q).astype(dtype), cache, 0, params,
        1.0 / float(np.sqrt(q.shape[-1])), kv_scale=kv_scale,
        pages_per_block=pp, interpret=True)
    return np.asarray(out.astype(jnp.float32))


@pytest.mark.parametrize("seq_specs", [
    [(1, 1)],                        # one seq, one token
    [(1, 9)],                        # decode with history
    [(1, 4), (1, 7), (1, 12)],       # decode batch, ragged kv lens
    [(1, 16), (1, 3), (1, 8), (1, 5)],
])
def test_vs_oracle_mha(seq_specs):
    rng = np.random.default_rng(0)
    q, cache, params, expected = build_case(rng, seq_specs, H=4, KVH=4)
    out = run(q, cache, params)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_multi_kv_block_online_softmax():
    rng = np.random.default_rng(1)
    q, cache, params, expected = build_case(rng, [(1, 37), (1, 21)],
                                            H=4, KVH=4)
    out = run(q, cache, params, pp=2)   # 2 pages * 4 slots = 8 kv per block
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


def test_padded_rows_and_seqs_stay_finite():
    rng = np.random.default_rng(2)
    q, cache, params, expected = build_case(rng, [(1, 6), (1, 3)],
                                            T_pad=8, S_pad=4, H=4, KVH=4)
    out = run(q, cache, params)
    np.testing.assert_allclose(out[:2], expected[:2], rtol=2e-4, atol=2e-4)
    assert np.all(np.isfinite(out))
    assert np.all(out[2:] == 0)      # padding rows are zeroed, not garbage


def test_bf16_loosely():
    rng = np.random.default_rng(3)
    q, cache, params, expected = build_case(rng, [(1, 12), (1, 9)],
                                            H=4, KVH=4)
    out = run(q, cache, params, dtype=jnp.bfloat16)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=5e-2, atol=5e-2)


def test_int8_kv_with_scale_and_perm():
    """int8 cache exercises the even/odd head permutation through the
    adapter; the oracle runs on the same quantized cache via the jnp path."""
    rng = np.random.default_rng(4)
    # 32 heads: the real llava-7b head count, nontrivial permutation
    q, cache, params, _ = build_case(rng, [(1, 7), (1, 11)], H=32, KVH=32)
    scale = 0.05
    cache_q = np.clip(np.round(cache / scale), -127, 127).astype(np.int8)
    ref = paged_attention_jnp(
        jnp.asarray(q), jnp.asarray(cache_q), 0, params,
        1.0 / np.sqrt(q.shape[-1]), max_q=1, kv_scale=scale)
    out = run(q, cache_q.astype(np.float32), params, kv_scale=scale)
    # the kernel computes K·q and p·V in bf16 (f32 accumulate) like every
    # production TPU flash kernel; vs the f32 jnp oracle that costs ~bf16
    # epsilon on a handful of elements
    np.testing.assert_allclose(out[:2], np.asarray(ref)[:2],
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("seq_specs", [
    [(1, 1)],
    [(1, 4), (1, 7), (1, 12)],
    [(1, 37), (1, 21)],              # multi kv block online softmax
])
@pytest.mark.parametrize("H,KVH", [(12, 2), (28, 4), (8, 8)])
def test_vs_oracle_gqa(seq_specs, H, KVH):
    rng = np.random.default_rng(5)
    q, cache, params, expected = build_case(rng, seq_specs, H=H, KVH=KVH)
    out = run(q, cache, params, pp=2)
    np.testing.assert_allclose(out[: expected.shape[0]], expected,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("H,KVH", [(12, 2), (28, 4)])
def test_int8_kv_gqa_with_scale_and_perm(H, KVH):
    """GQA int8 cache: even/odd kv-head groups with q heads moving in
    blocks of R — the qwen2-vl-2b (12/2) and qwen2-7b (28/4) shapes."""
    rng = np.random.default_rng(6)
    q, cache, params, _ = build_case(rng, [(1, 7), (1, 11), (1, 19)],
                                     H=H, KVH=KVH)
    scale = 0.05
    cache_q = np.clip(np.round(cache / scale), -127, 127).astype(np.int8)
    ref = paged_attention_jnp(
        jnp.asarray(q), jnp.asarray(cache_q), 0, params,
        1.0 / np.sqrt(q.shape[-1]), max_q=1, kv_scale=scale)
    out = run(q, cache_q.astype(np.float32), params, kv_scale=scale)
    np.testing.assert_allclose(out[:3], np.asarray(ref)[:3],
                               rtol=1e-2, atol=1e-2)


def test_head_perm_roundtrip():
    perm = decode_head_perm(32, jnp.int8)
    assert perm is not None
    assert sorted(perm.tolist()) == list(range(32))
    assert np.all(perm.argsort()[perm] == np.arange(32))
    assert decode_head_perm(32, jnp.bfloat16) is None
    # GQA q-head perm: q heads move in blocks of R with their kv head
    qperm = decode_q_perm(12, 2, jnp.int8)
    assert qperm is not None and sorted(qperm.tolist()) == list(range(12))
    kvp = decode_head_perm(2, jnp.int8)
    assert np.array_equal(qperm.reshape(2, 6) // 6, kvp[:, None].repeat(6, 1))
    assert decode_q_perm(12, 2, jnp.bfloat16) is None


def test_supports_gate():
    assert supports(32, 32, 128, jnp.int8)
    assert supports(32, 32, 128, jnp.bfloat16)
    assert supports(12, 2, 128, jnp.bfloat16)        # GQA (qwen2-vl-2b)
    assert supports(12, 2, 128, jnp.int8)
    assert supports(28, 4, 128, jnp.int8)            # GQA (qwen2-7b)
    assert not supports(12, 5, 128, jnp.bfloat16)    # non-uniform groups
    assert not supports(12, 3, 128, jnp.int8)        # odd kv heads, packed
    assert not supports(32, 32, 64, jnp.int8)        # head_dim tiling
    # 40 heads (llava-NeXT-13B): supported — the upstream kernel rejects
    # the int8 80-combined-head shape outright and the oracle is 2.4x
    # slower (measured on chip)
    assert supports(40, 40, 128, jnp.int8)
    assert supports(40, 40, 128, jnp.bfloat16)
    assert supports(12, 12, 128, jnp.int8)


def test_dispatcher_forced_mha_decode_and_prefill_fallback():
    """impl="mha_decode" through the paged_attention dispatcher: decode
    batches run the kernel (interpret off-TPU), mixed/prefill batches fall
    through to the ragged→jnp chain — same numbers either way."""
    from hydrainfer_tpu.ops.attention import paged_attention

    rng = np.random.default_rng(7)
    # all-decode window (max_q == 1) → the kernel path
    q, cache, params, expected = build_case(rng, [(1, 6), (1, 9)],
                                            H=4, KVH=4)
    out = paged_attention(jnp.asarray(q), jnp.asarray(cache), 0, params,
                          1.0 / np.sqrt(q.shape[-1]), max_q=1,
                          impl="mha_decode")
    np.testing.assert_allclose(np.asarray(out)[:2], expected,
                               rtol=2e-4, atol=2e-4)

    # prefill batch (max_q > 1) → falls through to the oracle chain
    q2, cache2, params2, expected2 = build_case(rng, [(5, 5), (1, 8)],
                                                H=4, KVH=4)
    out2 = paged_attention(jnp.asarray(q2), jnp.asarray(cache2), 0, params2,
                           1.0 / np.sqrt(q2.shape[-1]), max_q=5,
                           impl="mha_decode")
    np.testing.assert_allclose(np.asarray(out2)[: expected2.shape[0]],
                               expected2, rtol=2e-4, atol=2e-4)
