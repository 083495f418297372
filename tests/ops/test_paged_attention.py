"""Paged attention vs a naive per-sequence numpy oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops import PagedAttentionParams, paged_attention, write_kv_cache
from hydrainfer_tpu.ops.attention import mha_varlen, paged_attention_jnp


def build_case(rng, seq_specs, H=4, KVH=2, D=16, block_size=4, n_blocks=64,
               T_pad=None, S_pad=None, L=2):
    """seq_specs: list of (q_len, kv_len) with q_len <= kv_len."""
    S = len(seq_specs)
    T = sum(q for q, _ in seq_specs)
    T_pad = T_pad or T
    S_pad = S_pad or S

    cache = np.zeros((L, 1, n_blocks, block_size, 2 * KVH, D), np.float32)
    max_blocks = max(-(-kv // block_size) for _, kv in seq_specs)
    block_tables = np.full((S_pad, max_blocks), -1, np.int32)
    next_block = 1  # leave block 0 unused to catch clamping bugs
    kv_lens = np.zeros(S_pad, np.int32)
    full_k = []   # per seq (kv_len, KVH, D)
    full_v = []
    for s, (q_len, kv_len) in enumerate(seq_specs):
        nb = -(-kv_len // block_size)
        blocks = list(range(next_block, next_block + nb))
        next_block += nb
        block_tables[s, :nb] = blocks
        kv_lens[s] = kv_len
        k = rng.standard_normal((kv_len, KVH, D)).astype(np.float32)
        v = rng.standard_normal((kv_len, KVH, D)).astype(np.float32)
        full_k.append(k)
        full_v.append(v)
        for l in range(L):
            for i in range(kv_len):
                b, o = blocks[i // block_size], i % block_size
                cache[l, 0, b, o, 0::2] = k[i]
                cache[l, 0, b, o, 1::2] = v[i]

    q = rng.standard_normal((T_pad, H, D)).astype(np.float32)
    q_seq_ids = np.full(T_pad, -1, np.int32)
    q_local_ids = np.zeros(T_pad, np.int32)
    positions = np.zeros(T_pad, np.int32)
    t = 0
    for s, (q_len, kv_len) in enumerate(seq_specs):
        for i in range(q_len):
            q_seq_ids[t] = s
            q_local_ids[t] = i
            positions[t] = kv_len - q_len + i  # the chunk is the kv tail
            t += 1

    cu = np.zeros(S_pad + 1, np.int32)
    acc = 0
    for s_i, (q_len, _) in enumerate(seq_specs):
        acc += q_len
        cu[s_i + 1] = acc
    cu[len(seq_specs) + 1:] = acc
    params = PagedAttentionParams(
        q_seq_ids=jnp.asarray(q_seq_ids),
        q_local_ids=jnp.asarray(q_local_ids),
        positions=jnp.asarray(positions),
        kv_lens=jnp.asarray(kv_lens),
        block_tables=jnp.asarray(block_tables),
        new_kv_slot_ids=jnp.full((T_pad,), -1, jnp.int32),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([len(seq_specs)], jnp.int32),
    )

    # numpy oracle
    scale = 1.0 / np.sqrt(D)
    expected = np.zeros((T_pad, H, D), np.float32)
    t = 0
    for s, (q_len, kv_len) in enumerate(seq_specs):
        k = np.repeat(full_k[s], H // KVH, axis=1)  # (kv, H, D)
        v = np.repeat(full_v[s], H // KVH, axis=1)
        for i in range(q_len):
            pos = kv_len - q_len + i
            scores = np.einsum("hd,khd->hk", q[t] * scale, k[: pos + 1])
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            expected[t] = np.einsum("hk,khd->hd", p, v[: pos + 1])
            t += 1
    return q, cache, params, expected


@pytest.mark.parametrize("seq_specs", [
    [(1, 1)],                       # single-token prefill
    [(5, 5)],                       # full prefill
    [(1, 9)],                       # decode with history
    [(1, 4), (1, 7), (1, 12)],      # decode batch
    [(6, 6), (1, 9), (3, 11)],      # mixed prefill + decode + chunked tail
])
def test_paged_attention_vs_oracle(seq_specs):
    rng = np.random.default_rng(0)
    q, cache, params, expected = build_case(rng, seq_specs)
    max_q = max(ql for ql, _ in seq_specs)
    out = paged_attention_jnp(jnp.asarray(q), jnp.asarray(cache), 0, params,
                              1.0 / np.sqrt(q.shape[-1]), max_q=max_q)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_padding_rows_do_not_corrupt_valid_rows():
    rng = np.random.default_rng(1)
    q, cache, params, expected = build_case(rng, [(2, 6), (1, 3)], T_pad=8, S_pad=4)
    out = paged_attention_jnp(jnp.asarray(q), jnp.asarray(cache), 0, params,
                              1.0 / 4.0, max_q=2)
    valid = 3
    np.testing.assert_allclose(np.asarray(out)[:valid], expected[:valid],
                               rtol=2e-4, atol=2e-4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_handler_chain_entry():
    rng = np.random.default_rng(2)
    q, cache, params, expected = build_case(rng, [(1, 5)])
    out = paged_attention(jnp.asarray(q), jnp.asarray(cache), 0, params,
                          1.0 / 4.0, max_q=1, impl="auto")
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-4)


def test_write_then_attend_roundtrip():
    """Append K/V via write_kv_cache then attend — the layer-level contract."""
    rng = np.random.default_rng(3)
    block_size, KVH, D, H = 4, 2, 16, 4
    cache = jnp.zeros((1, 1, 8, block_size, 2 * KVH, D), jnp.float32)
    kv_len = 6
    k = rng.standard_normal((kv_len, KVH, D)).astype(np.float32)
    v = rng.standard_normal((kv_len, KVH, D)).astype(np.float32)
    # blocks 2 and 5 hold the sequence
    slots = np.array([2 * block_size + i for i in range(4)] +
                     [5 * block_size + i for i in range(2)], np.int32)
    cache = write_kv_cache(cache, 0, jnp.asarray(slots), jnp.asarray(k),
                           jnp.asarray(v), block_size)

    q = rng.standard_normal((1, H, D)).astype(np.float32)
    params = PagedAttentionParams(
        q_seq_ids=jnp.asarray([0], jnp.int32),
        q_local_ids=jnp.asarray([0], jnp.int32),
        positions=jnp.asarray([kv_len - 1], jnp.int32),
        kv_lens=jnp.asarray([kv_len], jnp.int32),
        block_tables=jnp.asarray([[2, 5]], jnp.int32),
        new_kv_slot_ids=jnp.asarray([-1], jnp.int32),
        cu_q_lens=jnp.asarray([0, 1], jnp.int32),
        num_seqs=jnp.asarray([1], jnp.int32),
    )
    out = paged_attention_jnp(jnp.asarray(q), cache, 0, params, 1.0 / 4.0, max_q=1)

    kr = np.repeat(k, H // KVH, 1)
    vr = np.repeat(v, H // KVH, 1)
    scores = np.einsum("hd,khd->hk", q[0] / 4.0, kr)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expected = np.einsum("hk,khd->hd", p, vr)
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=2e-4, atol=2e-4)


def test_mha_varlen_segments():
    rng = np.random.default_rng(4)
    T, H, D = 10, 2, 8
    q = rng.standard_normal((T, H, D)).astype(np.float32)
    k = rng.standard_normal((T, H, D)).astype(np.float32)
    v = rng.standard_normal((T, H, D)).astype(np.float32)
    seq_ids = np.array([0] * 4 + [1] * 5 + [-1], np.int32)
    out, scores = mha_varlen(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             jnp.asarray(seq_ids), return_scores=True)
    # oracle per segment
    for seg, sl in [(0, slice(0, 4)), (1, slice(4, 9))]:
        qs, ks, vs = q[sl], k[sl], v[sl]
        s = np.einsum("qhd,khd->hqk", qs / np.sqrt(D), ks)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expected = np.einsum("hqk,khd->qhd", p, vs)
        np.testing.assert_allclose(np.asarray(out)[sl], expected, rtol=2e-4, atol=2e-4)
    # cross-segment attention mass is zero
    assert float(jnp.sum(scores[:, :4, 4:])) == 0.0


def test_jnp_oracle_chunked_matches_dense():
    """The per-sequence lax.map oracle form (engaged when the dense score
    workspace would exceed _ORACLE_SCORE_BYTES_LIMIT) must be numerically
    identical to the dense form — it exists so the oracle can prefill
    models whose head counts no Pallas kernel serves (the 13B dense form's
    ~10GB score tensor crashes the TPU compiler)."""
    import hydrainfer_tpu.ops.attention as A
    rng = np.random.default_rng(11)
    q, cache, params, expected = build_case(
        rng, [(6, 6), (1, 9), (3, 11), (1, 4)])
    sm_scale, max_q = 1.0 / np.sqrt(q.shape[-1]), 6
    q, cache = jnp.asarray(q), jnp.asarray(cache)
    dense = A.paged_attention_jnp(q, cache, 0, params, sm_scale, max_q)
    np.testing.assert_allclose(np.asarray(dense), expected,
                               rtol=2e-4, atol=2e-4)
    old = A._ORACLE_SCORE_BYTES_LIMIT
    try:
        A._ORACLE_SCORE_BYTES_LIMIT = 0   # force the chunked form
        chunked = A.paged_attention_jnp(q, cache, 0, params, sm_scale, max_q)
    finally:
        A._ORACLE_SCORE_BYTES_LIMIT = old
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seq_specs", [
    [(5, 5)],                       # fresh prefill
    [(1, 9)],                       # decode with history
    [(6, 6), (1, 9), (3, 11)],      # mixed prefill + decode + chunked tail
    [(4, 12), (2, 6)],              # chunked continuations
])
def test_varlen_prefill_kernel_vs_oracle(seq_specs):
    """The causal varlen-flash-over-gathered-pages prefill path (the 13B /
    rejected-head-shape kernel) must match the numpy oracle exactly
    (interpret mode on CPU)."""
    from hydrainfer_tpu.ops.attention import paged_attention_varlen_prefill
    rng = np.random.default_rng(3)
    q, cache, params, expected = build_case(rng, seq_specs)
    out = paged_attention_varlen_prefill(
        jnp.asarray(q), jnp.asarray(cache), 0, params,
        1.0 / np.sqrt(q.shape[-1]), interpret=True)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-4)


def test_varlen_prefill_kernel_padded_batch():
    """Padded q rows (seq -1) and padded seq slots must come back finite."""
    from hydrainfer_tpu.ops.attention import paged_attention_varlen_prefill
    rng = np.random.default_rng(4)
    q, cache, params, expected = build_case(rng, [(3, 7), (1, 5)],
                                            T_pad=8, S_pad=4)
    out = paged_attention_varlen_prefill(
        jnp.asarray(q), jnp.asarray(cache), 0, params,
        1.0 / np.sqrt(q.shape[-1]), interpret=True)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:4], expected[:4], rtol=2e-4, atol=2e-4)
