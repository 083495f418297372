"""Free-list block allocator for the paged HBM cache.

Behavioral parity with the reference's stack allocator
(reference: hydrainfer/memory/block_allocator.py:11-38): `allocate(n)` may
return fewer than `n` ids when the pool is exhausted — callers handle the
shortfall (the scheduler treats it as back-pressure).
"""
from dataclasses import dataclass
from typing import List


@dataclass
class BlockAllocatorMetrics:
    n_total_blocks: int = 0
    n_free_blocks: int = 0

    @property
    def usage(self) -> float:
        if self.n_total_blocks == 0:
            return 0.0
        return 1.0 - self.n_free_blocks / self.n_total_blocks


class BlockAllocator:
    def __init__(self, n_blocks: int, reserved: int = 0):
        """`reserved` leading blocks are never handed out (e.g. block 0 as
        the padding-scratch target in ref-mode caches)."""
        self.n_blocks = n_blocks
        self.reserved = reserved
        # LIFO free list: recently freed blocks are re-used first, which keeps
        # the hot working set of pages dense in HBM.
        self._free: List[int] = list(range(n_blocks - 1, reserved - 1, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> List[int]:
        """Pop up to `n` block ids; returns fewer if exhausted."""
        n = min(n, len(self._free))
        if n == 0:
            return []
        out = self._free[-n:][::-1]
        del self._free[-n:]
        return out

    def free(self, block_ids: List[int]) -> None:
        for bid in block_ids:
            assert self.reserved <= bid < self.n_blocks, f"bad block id {bid}"
            self._free.append(bid)
        assert len(self._free) <= self.n_blocks, "double free detected"

    def metrics(self) -> BlockAllocatorMetrics:
        return BlockAllocatorMetrics(self.n_blocks, len(self._free))
