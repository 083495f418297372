"""Paged-cache scatter/gather ops (run inside jit, updates donated buffers).

TPU-native replacement for the reference CUDA scatter kernels
(reference: csrc/kernel/kv_cache_kernels/kv_cache_kernels.cu:17-96 and
csrc/kernel/cache_kernels/cache_kernels.cu:17-84). On TPU an XLA scatter on a
donated buffer is an in-place HBM write — no custom kernel needed for the
store itself; the win is that it fuses into the surrounding jitted step.

Padding convention: slot_id < 0 marks a padded token; those writes are
dropped via scatter mode='drop'.
"""
import jax
import jax.numpy as jnp


def write_token_cache(cache, layer_id: int, slot_ids: jax.Array,
                      values: tuple, block_size: int):
    """Scatter per-token rows into the paged cache for one layer.

    cache:    (n_layers, n_tensors, n_blocks, block_size, n_heads, head_dim)
              — either a jax.Array (functional update, donated buffers) or a
              jax.Ref (TRUE in-place update; avoids the whole-cache copies
              XLA's scan-carry handling costs ~3ms/GB/step)
    slot_ids: (n_tokens,) int32 physical slots (= block_id*block_size+offset);
              negative → padding (dropped / routed to the scratch block)
    values:   n_tensors arrays of (n_tokens, n_heads, head_dim)
    """
    n_blocks = cache.shape[2]
    # Padding slots (<0) must map to a positive out-of-bounds index: with
    # mode='drop' negative indices still WRAP numpy-style, but indices >= n
    # are dropped.
    blk = jnp.where(slot_ids < 0, n_blocks, slot_ids // block_size)
    off = jnp.where(slot_ids < 0, 0, slot_ids % block_size)
    if isinstance(cache, jax.Ref):
        # Full-ref functional update: XLA recognizes the read→scatter→write
        # as an in-place scatter on the ref's buffer (0 temp bytes). A bare
        # ref scatter (`cache[l, i, blk, off] = v`) instead makes layout
        # assignment pick a transposed cache layout at multi-GB sizes and
        # materialize a whole-cache copy per step.
        for i, v in enumerate(values):
            cache[...] = cache[...].at[layer_id, i, blk, off].set(
                v.astype(cache.dtype), mode="drop")
        return cache
    for i, v in enumerate(values):
        cache = cache.at[layer_id, i, blk, off].set(
            v.astype(cache.dtype), mode="drop")
    return cache


def write_kv_cache(cache: jax.Array, layer_id: int, slot_ids: jax.Array,
                   k: jax.Array, v: jax.Array, block_size: int) -> jax.Array:
    """KV specialization over the combined-head layout.

    cache: (n_layers, 1, n_blocks, block_size, 2*n_kv_heads, head_dim) with
    keys at even combined-head indices and values at odd — the native layout
    of the TPU ragged paged attention kernel, so attention reads pages
    zero-copy. k, v: (n_tokens, n_kv_heads, head_dim).
    """
    kv = jnp.concatenate([k[:, :, None], v[:, :, None]], axis=2)
    kv = kv.reshape(k.shape[0], 2 * k.shape[1], k.shape[2])
    return write_token_cache(cache, layer_id, slot_ids, (kv,), block_size)


def gather_token_cache(cache: jax.Array, layer_id: int, tensor_id: int,
                       block_tables: jax.Array) -> jax.Array:
    """Gather pages for a batch of sequences into a dense array.

    block_tables: (n_seqs, max_blocks) int32, -1 padded (reads clamp to 0;
                  callers mask by kv length so garbage rows are never used).
    returns: (n_seqs, max_blocks*block_size, n_heads, head_dim)
    """
    tables = jnp.maximum(block_tables, 0)
    pages = cache[layer_id, tensor_id][tables]  # (S, max_blocks, bs, H, D)
    s, mb, bs, h, d = pages.shape
    return pages.reshape(s, mb * bs, h, d)
