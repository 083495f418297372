"""Pallas in-place KV writer vs the jnp scatter oracle (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.cache_ops import write_kv_cache
from hydrainfer_tpu.ops.pallas.kv_writer import write_kv_pages


def run_case(rng, T, bs=4, nb=16, ckv=4, d=8, layer=0, L=2,
             slot_pattern="prefill"):
    cache0 = rng.standard_normal((L, 1, nb, bs, ckv, d)).astype(np.float32)
    kvh = ckv // 2
    k = rng.standard_normal((T, kvh, d)).astype(np.float32)
    v = rng.standard_normal((T, kvh, d)).astype(np.float32)

    if slot_pattern == "prefill":
        # one sequence filling consecutive slots of blocks 2,3,...
        slots = np.arange(2 * bs, 2 * bs + T, dtype=np.int32)
        seqs = np.zeros(T, np.int32)
    elif slot_pattern == "decode":
        # each token its own sequence, scattered single slots
        slots = rng.choice(nb * bs, size=T, replace=False).astype(np.int32)
        seqs = np.arange(T, dtype=np.int32)
    elif slot_pattern == "mixed":
        # seq0: a chunk starting mid-block; seq1: one decode token; padding
        n0 = T - 2
        slots = np.concatenate([
            np.arange(bs + 2, bs + 2 + n0, dtype=np.int32),  # mid-block start
            [int(7 * bs + 1)], [-1]]).astype(np.int32)
        seqs = np.concatenate([
            np.zeros(n0, np.int32), [1], [-1]]).astype(np.int32)
    else:
        raise ValueError(slot_pattern)

    expected = write_kv_cache(jnp.asarray(cache0), layer, jnp.asarray(slots),
                              jnp.asarray(k), jnp.asarray(v), bs)

    kv = jnp.concatenate([jnp.asarray(k)[:, :, None],
                          jnp.asarray(v)[:, :, None]], axis=2)
    kv = kv.reshape(T, ckv, d)
    got = write_kv_pages(jnp.asarray(cache0), kv,
                         jnp.asarray(layer, jnp.int32),
                         jnp.asarray(slots), jnp.asarray(seqs),
                         block_size=bs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=0, atol=0)


@pytest.mark.parametrize("pattern,T", [
    ("prefill", 12),    # 3 whole blocks: tier-A page DMAs
    ("prefill", 10),    # 2 whole blocks + 2 leftover rows
    ("decode", 6),      # all single-row tier-B DMAs
    ("mixed", 9),       # mid-block chunk + decode token + padded token
    ("decode", 3),      # T < block_size
])
def test_writer_matches_scatter(pattern, T):
    rng = np.random.default_rng(hash((pattern, T)) % 2**32)
    run_case(rng, T, slot_pattern=pattern)


def test_writer_nonzero_layer():
    rng = np.random.default_rng(9)
    run_case(rng, 8, layer=1, slot_pattern="prefill")


def test_writer_int8_cache():
    rng = np.random.default_rng(10)
    bs, nb, ckv, d, T = 4, 8, 4, 8, 6
    cache0 = rng.integers(-127, 127, (1, 1, nb, bs, ckv, d)).astype(np.int8)
    kvh = ckv // 2
    k = rng.integers(-127, 127, (T, kvh, d)).astype(np.int8)
    v = rng.integers(-127, 127, (T, kvh, d)).astype(np.int8)
    slots = np.arange(bs, bs + T, dtype=np.int32)
    seqs = np.zeros(T, np.int32)
    expected = write_kv_cache(jnp.asarray(cache0), 0, jnp.asarray(slots),
                              jnp.asarray(k), jnp.asarray(v), bs)
    kv = jnp.concatenate([jnp.asarray(k)[:, :, None],
                          jnp.asarray(v)[:, :, None]], axis=2).reshape(T, ckv, d)
    got = write_kv_pages(jnp.asarray(cache0), kv, jnp.asarray(0, jnp.int32),
                         jnp.asarray(slots), jnp.asarray(seqs),
                         block_size=bs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
