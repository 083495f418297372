import numpy as np
import pytest

from hydrainfer_tpu.memory import (
    TokenCacheBlockManager,
    TokenCacheBlockManagerConfig,
    compute_prefix_hashes,
)


def make_manager(n_blocks=16, block_size=4):
    cfg = TokenCacheBlockManagerConfig(
        n_layers=2, n_tensors=2, n_blocks=n_blocks, block_size=block_size,
        n_heads=2, head_dim=8, dtype="fp32",
    )
    return TokenCacheBlockManager(cfg)


def test_alloc_realloc_free():
    m = make_manager()
    vc = m.allocate_virtual_cache()
    assert vc.n_cache_tokens == 0
    m.realloc(vc, 10)  # 3 blocks of 4
    assert vc.n_cache_tokens == 10
    assert len(vc.block_table) == 3
    m.realloc(vc, 3)  # shrink to 1 block
    assert len(vc.block_table) == 1
    m.free(vc)
    assert vc.block_table == []


def test_v2p_translation():
    m = make_manager()
    vc = m.allocate_virtual_cache()
    m.realloc(vc, 12)
    t = vc.block_table
    assert m.v2p(vc, [0, 5, 11]) == [t[0] * 4 + 0, t[1] * 4 + 1, t[2] * 4 + 3]
    np.testing.assert_array_equal(
        m.v2p_array(vc, np.array([0, 5, 11])),
        np.array(m.v2p(vc, [0, 5, 11])),
    )


def test_prefix_cache_reuse_across_requests():
    m = make_manager()
    tokens = list(range(12))
    hashes = compute_prefix_hashes(tokens, m.block_size)
    vc1 = m.allocate_virtual_cache(hashes)
    assert vc1.n_cache_tokens == 0  # nothing cached yet
    m.realloc(vc1, 12)
    m.set_blocks(vc1, [0, 1, 2], hashes)

    vc2 = m.allocate_virtual_cache(hashes)
    assert vc2.n_cache_tokens == 12  # full prefix hit
    assert vc2.block_table == vc1.block_table

    # partial hit: first 2 blocks shared, third differs
    other = tokens[:8] + [99, 98, 97, 96]
    vc3 = m.allocate_virtual_cache(compute_prefix_hashes(other, m.block_size))
    assert vc3.n_cache_tokens == 8
    assert vc3.block_table == vc1.block_table[:2]

    assert m.metrics().prefix_cache_hit_rate > 0


def test_freed_blocks_are_reused_after_exhaustion():
    m = make_manager(n_blocks=4)
    vc1 = m.allocate_virtual_cache()
    m.realloc(vc1, 16)  # all 4 blocks
    assert m.n_available_blocks() == 0
    m.free(vc1)
    assert m.n_available_blocks() == 4
    vc2 = m.allocate_virtual_cache()
    m.realloc(vc2, 16)  # second-chance allocation from shared cache
    assert len(vc2.block_table) == 4
    with pytest.raises(AssertionError):
        m.realloc(m.allocate_virtual_cache(), 4)


def test_gather_scatter_roundtrip():
    m = make_manager()
    rng = np.random.default_rng(0)
    data = rng.standard_normal((2,) + m.cache_array.shape[:2] + m.cache_array.shape[3:]).astype(np.float32)
    m.scatter_blocks([3, 7], data)
    out = np.asarray(m.gather_blocks([3, 7]))
    np.testing.assert_allclose(out, data, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.gather_blocks([0])), 0.0)


def test_compute_n_blocks():
    cfg = TokenCacheBlockManagerConfig(n_layers=2, n_tensors=2, n_blocks=1, block_size=4, n_heads=2, head_dim=8, dtype="fp32")
    per_block = 2 * 2 * 4 * 2 * 8 * 4
    assert TokenCacheBlockManager.compute_n_blocks(cfg, per_block * 7 + 3) == 7
