"""Sharded paged attention: paged_attention_tp (shard_map over the 'tp'
axis) must match the unsharded jnp oracle exactly, over mixed
prefill/decode batches and with int8 KV. On CPU the inner handler is the
jnp oracle per shard — the test validates the sharding math (head-axis
split, K/V pair preservation, replicated geometry); on TPU the same
wrapper runs the Pallas ragged kernel (see tests/tpu/test_tp_kernel_tpu.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hydrainfer_tpu.ops.attention import (PagedAttentionParams,
                                          paged_attention_jnp,
                                          paged_attention_tp)
from hydrainfer_tpu.parallel.mesh import make_mesh, shard_kv_cache


def build_batch(rng, n_layers=2, n_blocks=16, block_size=4, kvh=4, h=8, d=16,
                dtype=jnp.float32):
    """Two prefill chunks + two decode steps sharing one paged cache."""
    cache = jnp.asarray(rng.standard_normal(
        (n_layers, 1, n_blocks, block_size, 2 * kvh, d)), dtype)
    # seq 0: prefill 5 tokens from pos 0; seq 1: prefill 3 from pos 2 (chunk);
    # seq 2, 3: decode one token at kv_len 7 / 9
    q_lens = [5, 3, 1, 1]
    kv_lens = [5, 5, 7, 9]
    positions = [0, 1, 2, 3, 4, 2, 3, 4, 6, 8]
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, h, d)), dtype)
    q_seq_ids = sum(([i] * n for i, n in enumerate(q_lens)), [])
    q_local_ids = sum(([j for j in range(n)] for n in q_lens), [])
    block_tables = np.full((4, 3), -1, np.int32)
    b = 1
    for s, kl in enumerate(kv_lens):
        for j in range((kl + block_size - 1) // block_size):
            block_tables[s, j] = b
            b += 1
    cu = np.zeros(5, np.int32)
    cu[1:] = np.cumsum(q_lens)
    params = PagedAttentionParams(
        q_seq_ids=jnp.asarray(q_seq_ids, jnp.int32),
        q_local_ids=jnp.asarray(q_local_ids, jnp.int32),
        positions=jnp.asarray(positions, jnp.int32),
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        block_tables=jnp.asarray(block_tables),
        new_kv_slot_ids=jnp.full((T,), -1, jnp.int32),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([4], jnp.int32))
    return q, cache, params


@pytest.mark.parametrize("kv_scale", [None, 0.05])
def test_tp_matches_unsharded_oracle(kv_scale):
    rng = np.random.default_rng(0)
    q, cache, params = build_batch(rng)
    if kv_scale is not None:
        cache = jnp.clip(jnp.round(cache / kv_scale), -127, 127).astype(jnp.int8)
    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(1, 8))
    ref = paged_attention_jnp(q, cache, 1, params, 0.25, max_q=5,
                              kv_scale=kv_scale)

    # sharded inputs exactly as the TP engine lays them out
    q_s = jax.device_put(q, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "tp", None)))
    cache_s = shard_kv_cache(cache, mesh)
    got = jax.jit(lambda *a: paged_attention_tp(
        *a, sm_scale=0.25, max_q=5, mesh=mesh, kv_scale=kv_scale))(
            q_s, cache_s, 1, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_indivisible_heads_falls_back():
    """3 kv heads over tp=8 can't shard: the wrapper must still be exact
    (GSPMD-partitioned dense fallback)."""
    rng = np.random.default_rng(1)
    q, cache, params = build_batch(rng, kvh=3, h=6)
    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(1, 8))
    ref = paged_attention_jnp(q, cache, 0, params, 0.25, max_q=5)
    got = paged_attention_tp(q, cache, 0, params, 0.25, max_q=5, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
