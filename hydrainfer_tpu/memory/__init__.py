from .block_allocator import BlockAllocator, BlockAllocatorMetrics
from .shared_cache import SharedCache, compute_prefix_hashes, compute_image_hash
from .token_cache import (
    TokenCacheBlockManager,
    TokenCacheBlockManagerConfig,
    TokenCacheBlockManagerMetrics,
    VirtualTokenCache,
)

__all__ = [
    "BlockAllocator",
    "BlockAllocatorMetrics",
    "SharedCache",
    "compute_prefix_hashes",
    "compute_image_hash",
    "TokenCacheBlockManager",
    "TokenCacheBlockManagerConfig",
    "TokenCacheBlockManagerMetrics",
    "VirtualTokenCache",
]
