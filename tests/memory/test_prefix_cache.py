import numpy as np
from PIL import Image

from hydrainfer_tpu.memory import SharedCache, compute_image_hash, compute_prefix_hashes
from hydrainfer_tpu.memory.shared_cache import SharedCacheConfig, compute_block_hash


def _hashes(tokens, bs=4):
    return compute_prefix_hashes(tokens, bs, -1)


def test_match_pin_insert_evict_sequence():
    cache = SharedCache(SharedCacheConfig(n_blocks=100))

    assert cache.match(_hashes([1, 2, 3, 4, 5, 6, 7, 8])) == [-1, -1]

    cache.pin([7, 11])
    cache.insert(_hashes([1, 2, 3, 4, 5, 6, 7, 8]), [7, 11])

    assert cache.match(_hashes([1, 2, 3, 4, 5, 6, 7, 8])) == [7, 11]
    # different first block breaks the chain for all later blocks
    assert cache.match(_hashes([3, 2, 3, 4, 5, 6, 7, 8])) == [-1, -1]
    assert cache.match(_hashes([1, 2, 3, 4, 6, 6, 7, 8])) == [7, -1]
    assert cache.match(_hashes([1, 2, 3, 4])) == [7]
    # same tokens at a different prefix position do not match
    assert cache.match(_hashes([5, 6, 7, 8])) == [-1]

    # everything pinned: nothing evictable
    assert cache.evict(2) == []

    cache.pin(cache.match(_hashes([1, 2, 3, 4])))          # block 7: refcount 2
    cache.unpin(cache.match(_hashes([1, 2, 3, 4, 5, 6, 7, 8])))  # 7→1, 11→0

    assert cache.evict(2) == [11]
    assert cache.evict(1) == []
    assert cache.match(_hashes([1, 2, 3, 4, 5, 6, 7, 8])) == [7, -1]

    cache.unpin(cache.match(_hashes([1, 2, 3, 4])))
    assert cache.evict(1) == [7]
    assert cache.match(_hashes([1, 2, 3, 4])) == [-1]


def test_write_safety():
    cache = SharedCache(SharedCacheConfig(n_blocks=4))
    cache.pin([0])
    assert cache.is_write_safe(0)
    cache.pin([0])
    assert not cache.is_write_safe(0)


def test_image_hash_distinguishes_content():
    rng = np.random.default_rng(0)
    arr1 = rng.integers(0, 255, (336, 336, 3), dtype=np.uint8)
    arr2 = rng.integers(0, 255, (336, 336, 3), dtype=np.uint8)
    img1 = Image.fromarray(arr1)
    img1b = Image.fromarray(arr1.copy())
    img2 = Image.fromarray(arr2)
    h1, h1b, h2 = map(compute_image_hash, (img1, img1b, img2))
    assert h1 == h1b
    assert h1 != h2

    # substituting image hashes into the token stream changes block hashes
    tokens = [1, 2, 3, 100, 100, 5]
    t1 = [h1 if t == 100 else t for t in tokens]
    t2 = [h2 if t == 100 else t for t in tokens]
    assert compute_block_hash(t1) != compute_block_hash(t2)
    assert compute_block_hash(t1) != compute_block_hash(tokens)
