"""Prefix (shared) cache: content-hash → physical block map with ref-counts.

Behavioral parity with the reference prefix cache
(reference: hydrainfer/memory/shared_cache.py:20-96):
  - every block starts unpinned and evictable;
  - `match` returns the physical block per hash or -1;
  - pin/unpin ref-count blocks in/out of the evictable set;
  - `evict(n)` reclaims up to n unpinned blocks and drops their hashes;
  - block hashes chain: hash_i = xxh64(hash_{i-1} || tokens of block i), so a
    match on block i implies the whole prefix matches;
  - image content hashes are substituted for the image-token runs before
    hashing so identical prompts with different images do not collide.
"""
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Set

import numpy as np
import xxhash


def compute_block_hash(token_ids: Sequence[int], prefix: int = -1) -> int:
    h = xxhash.xxh64()
    if prefix != -1:
        h.update(int(prefix).to_bytes(8, "little", signed=False))
    # Token ids may be full-width image content hashes (uint64); mask into
    # 64-bit lanes so both plain ids and substituted hashes serialize.
    ids = np.asarray([int(t) & 0xFFFFFFFFFFFFFFFF for t in token_ids], dtype=np.uint64)
    h.update(ids.tobytes())
    return h.intdigest()


def compute_prefix_hashes(token_ids: Sequence[int], block_size: int, prefix: int = -1) -> List[int]:
    """Chained per-block hashes over the full blocks of `token_ids`."""
    n_blocks = len(token_ids) // block_size
    hashes: List[int] = []
    h = prefix
    for i in range(n_blocks):
        h = compute_block_hash(token_ids[i * block_size : (i + 1) * block_size], prefix=h)
        hashes.append(h)
    return hashes


def compute_image_hash(image) -> int:
    """Content hash of a PIL image (RGB-normalized)."""
    if image.mode != "RGB":
        image = image.convert("RGB")
    h = xxhash.xxh64()
    h.update(np.asarray(image).tobytes())
    return h.intdigest()


@dataclass
class SharedCacheConfig:
    n_blocks: int = 1024


class SharedCache:
    def __init__(self, config: SharedCacheConfig):
        self.n_blocks = config.n_blocks
        self._hash_to_block: Dict[int, int] = {}
        self._block_to_hash: List[Optional[int]] = [None] * config.n_blocks
        self._ref_counts: List[int] = [0] * config.n_blocks
        # Only blocks that have actually been released end up evictable;
        # never-allocated blocks belong to the BlockAllocator, keeping the
        # two pools disjoint (the reference double-counts fresh blocks in
        # both pools; we deliberately do not).
        self._evictable: Set[int] = set()

    def match(self, hashes: Sequence[int]) -> List[int]:
        """Physical block id per hash, -1 where absent. No pinning."""
        return [self._hash_to_block.get(h, -1) for h in hashes]

    def pin(self, block_ids: Sequence[int]) -> None:
        for bid in block_ids:
            self._ref_counts[bid] += 1
            self._evictable.discard(bid)

    def unpin(self, block_ids: Sequence[int]) -> None:
        for bid in block_ids:
            self._ref_counts[bid] -= 1
            assert self._ref_counts[bid] >= 0, f"unpin underflow on block {bid}"
            if self._ref_counts[bid] == 0:
                self._evictable.add(bid)

    def insert(self, hashes: Sequence[int], block_ids: Sequence[int]) -> None:
        """Register filled blocks under their content hashes."""
        for h, bid in zip(hashes, block_ids):
            self._hash_to_block[h] = bid
            self._block_to_hash[bid] = h

    def evict(self, n_blocks: int) -> List[int]:
        """Reclaim up to n unpinned blocks; their hash entries are dropped."""
        evicted: List[int] = []
        for _ in range(min(n_blocks, len(self._evictable))):
            bid = self._evictable.pop()
            h = self._block_to_hash[bid]
            if h is not None and self._hash_to_block.get(h) == bid:
                del self._hash_to_block[h]
            self._block_to_hash[bid] = None
            evicted.append(bid)
        return evicted

    # The shared cache doubles as a second-chance allocator: allocating from
    # it means evicting cold cached blocks.
    allocate = evict

    def n_available(self) -> int:
        return len(self._evictable)

    def is_write_safe(self, block_id: int) -> bool:
        """A block is writable iff exactly one virtual cache references it."""
        return self._ref_counts[block_id] == 1
