"""Paged token-cache block manager over a JAX HBM array.

TPU-native re-design of the reference's TokenCacheBlockManager
(reference: hydrainfer/memory/token_cache_manger.py:51-178) used for BOTH the
KV cache (n_tensors=2: key, value) and the vision feature cache (n_tensors=1).

Differences from the CUDA design, on purpose:
  - storage is a single immutable jnp array
    (n_layers, n_tensors, n_blocks, block_size, n_heads, head_dim) updated
    functionally; the hot-path writes happen INSIDE the jitted model step
    with buffer donation, so XLA updates in place — there is no separate
    "set_kv_cache kernel" host call;
  - migration is a device-to-device array transfer (gather blocks → transfer
    over ICI/DCN → scatter blocks) instead of cudaIpcMemHandle / NCCL isend;
  - there is no CUDA stream; async dispatch + donation provide the overlap.

Host-side metadata (block tables, allocator, prefix cache) is plain Python —
it never enters the jit trace; only dense int32 arrays derived from it do.
"""
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.counter import IncreasingAllocator
from ..utils.logger import getLogger
from .block_allocator import BlockAllocator, BlockAllocatorMetrics
from .shared_cache import SharedCache, SharedCacheConfig

logger = getLogger(__name__)


def _new_ref_adopting(value: jax.Array):
    """jax.new_ref without the defensive copy of the init value.

    new_ref's impl copies init_val to preserve its value semantics; for a
    multi-GB KV pool that transient 2x peak OOMs the chip. The manager owns
    `value` exclusively and drops its handle right after, so adopting the
    buffer is safe. Falls back to the public API if jax internals moved.
    """
    try:
        from jax._src.core import ArrayRefImpl, Ref
        from jax._src.state.types import AbstractRef
        aval = AbstractRef(jax.typeof(value))
        return Ref(aval, ArrayRefImpl(aval, value))
    except Exception:  # pragma: no cover - depends on jax version
        return jax.new_ref(value)

_DTYPE_SIZE = {"bf16": 2, "bfloat16": 2, "fp16": 2, "float16": 2, "fp32": 4, "float32": 4, "int8": 1, "fp8": 1}


def str2dtype(name: str):
    return {
        "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
        "fp16": jnp.float16, "float16": jnp.float16,
        "fp32": jnp.float32, "float32": jnp.float32,
        "int8": jnp.int8,
        "fp8": jnp.float8_e4m3fn,
    }[name]


@dataclass
class TokenCacheBlockManagerConfig:
    n_layers: int = 32
    n_tensors: int = 2           # 2 = (K, V) kv-cache; 1 = image-feature cache
    n_blocks: int = 1024
    block_size: int = 16
    n_heads: int = 32
    head_dim: int = 128
    dtype: str = "bf16"
    # hold the cache as a jax.Ref for TRUE in-place updates inside the
    # jitted step (no scan-carry / donation round-trips)
    use_ref: bool = False
    # store the pool as n_layers SEPARATE per-layer buffers (each
    # (1, n_tensors, n_blocks, block_size, heads, dim)) instead of one
    # stacked (n_layers, ...) array. Pairs with DecoderConfig.layer_loop
    # ="unroll": the attention kernel's operand is then a per-layer buffer
    # indexed with a STATIC layer 0 (free offset-0 slice) instead of a
    # dynamic `cache[layer]` slice that XLA materializes (~pool/L bytes per
    # layer = the whole pool per step, measured 3.2ms/GB — PERF_NOTES.md).
    per_layer: bool = False

    @property
    def block_nbytes(self) -> int:
        return (self.n_layers * self.n_tensors * self.block_size
                * self.n_heads * self.head_dim * _DTYPE_SIZE[self.dtype])


@dataclass
class VirtualTokenCache:
    """The migratable handle to a request's cache: a virtual id plus the
    block table mapping virtual block index → physical block id.

    This is what crosses node boundaries during EP/PD migration
    (reference: hydrainfer/memory/token_cache.py:60-67). Instead of a CUDA
    IPC memory handle it carries the owning node's name; the receiver asks
    that node to gather + transfer the blocks.
    """
    vid: int
    n_blocks_of_cache_manager: int
    n_cache_tokens: int = 0
    block_table: List[int] = field(default_factory=list)
    owner_node: str = ""         # control-plane address of the owning node


@dataclass
class TokenCacheBlockManagerMetrics:
    allocator: BlockAllocatorMetrics
    prefix_cache_hit_rate: float


class TokenCacheBlockManager:
    def __init__(self, config: TokenCacheBlockManagerConfig, device=None, node_name: str = ""):
        self.config = config
        self.block_size = config.block_size
        self.n_blocks = config.n_blocks
        self.node_name = node_name
        self.dtype = str2dtype(config.dtype)
        shape = (config.n_layers, config.n_tensors, config.n_blocks,
                 config.block_size, config.n_heads, config.head_dim)
        self.device = device if device is not None else jax.devices()[0]
        self.use_ref = config.use_ref
        self.per_layer = config.per_layer
        with jax.default_device(self.device):
            if self.per_layer:
                per_shape = (1,) + shape[1:]
                layers = [jnp.zeros(per_shape, dtype=self.dtype)
                          for _ in range(config.n_layers)]
                if self.use_ref:
                    self.cache_ref = [_new_ref_adopting(v) for v in layers]
                    self._cache_array = None
                else:
                    self.cache_ref = None
                    self._cache_array = layers
            else:
                value = jnp.zeros(shape, dtype=self.dtype)
                if self.use_ref:
                    # new_ref materializes on the default device — pin it here
                    self.cache_ref = _new_ref_adopting(value)
                    self._cache_array = None
                    value = None
                else:
                    self.cache_ref = None
                    self._cache_array = value
        self.block_allocator = BlockAllocator(config.n_blocks)
        self.shared_cache = SharedCache(SharedCacheConfig(n_blocks=config.n_blocks))
        self._vid_allocator = IncreasingAllocator(start=1)
        self._n_blocks_queried = 0
        self._n_blocks_matched = 0

    @property
    def cache_array(self):
        """Value view of the cache (ref mode: materializes a snapshot — use
        cache_ref / gather_blocks / scatter_blocks on hot paths). In
        per_layer mode this is the LIST of per-layer buffers (what the
        unrolled decoder step takes); use stacked_snapshot() for one array."""
        if self.per_layer:
            if self.use_ref:
                return [r[...] for r in self.cache_ref]
            return self._cache_array
        if self.use_ref:
            return self.cache_ref[...]
        return self._cache_array

    @cache_array.setter
    def cache_array(self, value) -> None:
        if self.per_layer:
            assert isinstance(value, (list, tuple)) and \
                len(value) == self.config.n_layers
            if self.use_ref:
                with jax.default_device(self.device):
                    self.cache_ref = [_new_ref_adopting(v) for v in value]
            else:
                self._cache_array = list(value)
            return
        if self.use_ref:
            with jax.default_device(self.device):
                self.cache_ref = _new_ref_adopting(value)
        else:
            self._cache_array = value

    def stacked_snapshot(self) -> jax.Array:
        """(n_layers, n_tensors, ...) value snapshot regardless of layout
        (copies in per_layer mode — tests/introspection only)."""
        if self.per_layer:
            return jnp.concatenate(list(self.cache_array), axis=0)
        return self.cache_array

    # ---------------- allocation / virtual caches ----------------

    def n_available_blocks(self) -> int:
        return self.block_allocator.n_free + self.shared_cache.n_available()

    def _allocate_new_blocks(self, n: int) -> List[int]:
        block_ids = self.block_allocator.allocate(n)
        if len(block_ids) < n:
            # Second chance: evict cold prefix-cache blocks.
            block_ids += self.shared_cache.allocate(n - len(block_ids))
        assert len(block_ids) == n, "out of cache blocks"
        self.shared_cache.pin(block_ids)
        return block_ids

    def allocate_virtual_cache(self, hashes: Optional[Sequence[int]] = None) -> VirtualTokenCache:
        """New virtual cache, pre-populated with the longest prefix-cache hit."""
        matched: List[int] = []
        if hashes:
            per_hash = self.shared_cache.match(hashes)
            for bid in per_hash:
                if bid == -1:
                    break
                matched.append(bid)
            self.shared_cache.pin(matched)
            self._n_blocks_matched += len(matched)
            self._n_blocks_queried += len(hashes)
        return VirtualTokenCache(
            vid=self._vid_allocator.allocate(),
            n_blocks_of_cache_manager=self.n_blocks,
            n_cache_tokens=len(matched) * self.block_size,
            block_table=matched,
            owner_node=self.node_name,
        )

    def realloc(self, vc: VirtualTokenCache, n_tokens: int) -> None:
        """Grow or shrink a virtual cache to cover n_tokens."""
        n_need = -(-n_tokens // self.block_size)
        if n_need > len(vc.block_table):
            vc.block_table += self._allocate_new_blocks(n_need - len(vc.block_table))
        elif n_need < len(vc.block_table):
            self._release_blocks(vc.block_table[n_need:])
            vc.block_table = vc.block_table[:n_need]
        vc.n_cache_tokens = n_tokens

    def free(self, vc: VirtualTokenCache) -> None:
        self._release_blocks(vc.block_table)
        vc.block_table = []
        vc.n_cache_tokens = 0

    def _release_blocks(self, block_ids: List[int]) -> None:
        # Unpin only: released blocks stay matchable in the prefix cache until
        # evicted under allocation pressure (second-chance semantics).
        self.shared_cache.unpin(block_ids)

    # ---------------- address translation ----------------

    def v2p(self, vc: VirtualTokenCache, virtual_cache_ids: Sequence[int]) -> List[int]:
        """Virtual token position → physical slot (= block_id*block_size+off)."""
        bs = self.block_size
        table = vc.block_table
        return [table[v // bs] * bs + v % bs for v in virtual_cache_ids]

    def v2p_array(self, vc: VirtualTokenCache, virtual_cache_ids: np.ndarray) -> np.ndarray:
        table = np.asarray(vc.block_table, dtype=np.int32)
        v = np.asarray(virtual_cache_ids, dtype=np.int32)
        return table[v // self.block_size] * self.block_size + v % self.block_size

    def block_table_array(self, vc: VirtualTokenCache, pad_to: Optional[int] = None) -> np.ndarray:
        t = np.asarray(vc.block_table, dtype=np.int32)
        if pad_to is not None and len(t) < pad_to:
            t = np.pad(t, (0, pad_to - len(t)))
        return t

    # ---------------- prefix-cache registration ----------------

    def set_blocks(self, vc: VirtualTokenCache, virtual_block_ids: Sequence[int], hashes: Sequence[int]) -> None:
        """Register filled virtual blocks in the prefix cache."""
        assert len(virtual_block_ids) == len(hashes)
        physical = [vc.block_table[v] for v in virtual_block_ids]
        self.shared_cache.insert(hashes=hashes, block_ids=physical)

    # ---------------- migration data plane ----------------

    def gather_blocks(self, block_ids: Sequence[int]) -> jax.Array:
        """Pack blocks into a dense (n, layers, tensors, block, heads, dim) array
        for transfer (replaces per-block cudaMemcpy at
        reference csrc/data_transfer/block_migration.cpp:194-246)."""
        idx = jnp.asarray(np.asarray(block_ids, dtype=np.int32))
        if self.per_layer:
            parts = ([jnp.moveaxis(r[:, :, idx], 2, 0) for r in self.cache_ref]
                     if self.use_ref else
                     [jnp.moveaxis(jnp.take(a, idx, axis=2), 2, 0)
                      for a in self._cache_array])
            return jnp.concatenate(parts, axis=1)
        if self.use_ref:
            return jnp.moveaxis(self.cache_ref[:, :, idx], 2, 0)
        return jnp.moveaxis(jnp.take(self._cache_array, idx, axis=2), 2, 0)

    def scatter_blocks(self, block_ids: Sequence[int], blocks: jax.Array) -> None:
        idx = jnp.asarray(np.asarray(block_ids, dtype=np.int32))
        # land the payload with the cache's own placement (single device, or
        # the node mesh's kv-head sharding — block payloads share the
        # cache's axis order so the spec transfers directly)
        if self.per_layer:
            if self.use_ref:
                blocks = jax.device_put(blocks, self.device).astype(self.dtype)
                for l, r in enumerate(self.cache_ref):
                    _scatter_blocks_ref(r, idx, blocks[:, l:l + 1])
            else:
                for l in range(self.config.n_layers):
                    a = self._cache_array[l]
                    payload = jax.device_put(
                        blocks[:, l:l + 1], a.sharding).astype(self.dtype)
                    self._cache_array[l] = _scatter_blocks_jit(a, idx, payload)
            return
        if self.use_ref:
            blocks = jax.device_put(blocks, self.device).astype(self.dtype)
            _scatter_blocks_ref(self.cache_ref, idx, blocks)
            return
        sharding = self._cache_array.sharding
        blocks = jax.device_put(blocks, sharding).astype(self.dtype)
        self._cache_array = _scatter_blocks_jit(self._cache_array, idx, blocks)

    # ---------------- sizing / metrics ----------------

    @classmethod
    def compute_n_blocks(cls, config: TokenCacheBlockManagerConfig, budget_bytes: int) -> int:
        return budget_bytes // config.block_nbytes

    def metrics(self) -> TokenCacheBlockManagerMetrics:
        hit = (self._n_blocks_matched / self._n_blocks_queried
               if self._n_blocks_queried else 0.0)
        return TokenCacheBlockManagerMetrics(self.block_allocator.metrics(), hit)


@jax.jit
def _scatter_blocks_jit(cache: jax.Array, idx: jax.Array, blocks: jax.Array) -> jax.Array:
    # blocks: (n, layers, tensors, block_size, heads, dim) → axis-2 scatter
    return cache.at[:, :, idx].set(jnp.moveaxis(blocks, 0, 2))


@jax.jit
def _scatter_blocks_ref(cache_ref, idx: jax.Array, blocks: jax.Array):
    cache_ref[:, :, idx] = jnp.moveaxis(blocks, 0, 2)
    return 0
