"""In-place paged KV write kernel: token rows → cache pages, cache aliased.

Why this kernel exists: on the value-cache path the XLA scatter
(`cache.at[l, i, blk, off].set(...)`) inside the layer scan makes XLA
ping-pong the multi-GB loop carry — a whole-cache copy per step (measured
~6ms at a 3.7GB pool, bench bisect `HYDRA_BISECT=no-attn`). Declaring the
cache as a pallas `input_output_aliases` operand pins the buffer: the kernel
issues HBM→HBM DMAs for exactly the written rows and the carry stays in
place. This is the TPU-native form of the reference's CUDA scatter kernels
(reference: csrc/kernel/kv_cache_kernels/kv_cache_kernels.cu:17-96).

Write plan (computed in-jit, static shapes):
  tier A — runs of exactly `block_size` tokens filling one whole page:
           one (bs, CKV, D) DMA each.
  tier B — leftover rows (chunk heads/tails, decode steps): one
           (1, CKV, D) DMA each.
All DMAs are started first, then waited, so they overlap on the DMA engine.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _writer_kernel(
    # scalar prefetch
    layer_ref,    # i32[1]
    a_src_ref,    # i32[KA]  tier-A source token starts
    a_page_ref,   # i32[KA]  tier-A destination pages
    b_src_ref,    # i32[KB]  tier-B source token rows
    b_slot_ref,   # i32[KB]  tier-B destination slots
    counts_ref,   # i32[2]   (n_a, n_b)
    # inputs (ANY)
    kv_new_ref,   # (T, CKV, D)
    cache_ref,    # (L, 1, NB, BS, CKV, D) — aliased to the output
    # outputs
    cache_out_ref,  # the SAME buffer on hardware; DMAs target this ref so
                    # interpret mode (separate buffers) also sees the writes
    # scratch
    sem,
    *,
    block_size: int,
):
    del cache_ref
    layer = layer_ref[0]
    n_a, n_b = counts_ref[0], counts_ref[1]
    # a (block_size,) slice of kv_new is untraceable when T < block_size —
    # tier A is statically impossible there (plan emits none)
    has_tier_a = kv_new_ref.shape[0] >= block_size

    def a_copy(i):
        return pltpu.make_async_copy(
            kv_new_ref.at[pl.ds(a_src_ref[i], block_size)],
            cache_out_ref.at[layer, 0, a_page_ref[i]],
            sem)

    def b_copy(j):
        slot = b_slot_ref[j]
        return pltpu.make_async_copy(
            kv_new_ref.at[pl.ds(b_src_ref[j], 1)],
            cache_out_ref.at[layer, 0, slot // block_size,
                             pl.ds(slot % block_size, 1)],
            sem)

    # start everything, then wait everything — all copies in flight at once
    if has_tier_a:
        lax.fori_loop(0, n_a, lambda i, c: (a_copy(i).start(), c)[1], 0)
    lax.fori_loop(0, n_b, lambda j, c: (b_copy(j).start(), c)[1], 0)
    if has_tier_a:
        lax.fori_loop(0, n_a, lambda i, c: (a_copy(i).wait(), c)[1], 0)
    lax.fori_loop(0, n_b, lambda j, c: (b_copy(j).wait(), c)[1], 0)


def _write_plan(slot_ids: jax.Array, seq_ids: jax.Array, block_size: int):
    """Decompose the token→slot scatter into whole-page runs + single rows.

    Exploits the executor's slot assignment: a sequence's chunk tokens are
    contiguous and their slots increase by 1 within each page. A run of
    `block_size` tokens starting page-aligned, ending on the same sequence
    at start_slot+bs-1, therefore covers exactly one page.
    """
    T = slot_ids.shape[0]
    bs = block_size
    idx = jnp.arange(T, dtype=jnp.int32)
    valid = slot_ids >= 0
    if T >= bs:
        end_slot = jnp.roll(slot_ids, -(bs - 1))
        end_seq = jnp.roll(seq_ids, -(bs - 1))
        full = (valid & (idx + bs <= T) & (slot_ids % bs == 0)
                & (end_slot == slot_ids + bs - 1) & (end_seq == seq_ids))
    else:
        full = jnp.zeros((T,), bool)
    covered = jnp.zeros((T,), bool)
    for k in range(min(bs, T)):
        covered = covered | (jnp.roll(full, k) & (idx >= k))
    tier_b = valid & ~covered

    ka = max(T // bs, 1)
    a_src = jnp.where(full, size=ka, fill_value=0)[0].astype(jnp.int32)
    n_a = full.sum().astype(jnp.int32)
    a_page = jnp.maximum(slot_ids[a_src], 0) // bs
    b_src = jnp.where(tier_b, size=T, fill_value=0)[0].astype(jnp.int32)
    n_b = tier_b.sum().astype(jnp.int32)
    b_slot = jnp.maximum(slot_ids[b_src], 0)
    counts = jnp.stack([n_a, n_b]).astype(jnp.int32)
    return a_src, a_page, b_src, b_slot, counts


@functools.partial(jax.jit, static_argnames=["block_size", "interpret"])
def write_kv_pages(cache: jax.Array, kv_new: jax.Array, layer_id: jax.Array,
                   slot_ids: jax.Array, seq_ids: jax.Array, *,
                   block_size: int, interpret: bool = False) -> jax.Array:
    """Write per-token combined-head KV rows into the paged cache, in place.

    cache:   (L, 1, NB, BS, CKV, D) — returned aliased (same buffer)
    kv_new:  (T, CKV, D) rows to write (K even / V odd combined heads)
    slot_ids:(T,) physical slots, negative = padded token (dropped)
    seq_ids: (T,) sequence index per token (runs detection), -1 = padding
    """
    a_src, a_page, b_src, b_slot, counts = _write_plan(
        slot_ids, seq_ids, block_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = pl.pallas_call(
        functools.partial(_writer_kernel, block_size=block_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # input index 7 = cache (6 scalar-prefetch operands + kv_new)
        input_output_aliases={7: 0},
        interpret=interpret,
        name="write_kv_pages",
    )
    return kernel(jnp.asarray(layer_id, jnp.int32).reshape(1),
                  a_src, a_page, b_src, b_slot, counts,
                  kv_new.astype(cache.dtype), cache)
