"""Mixture-of-Experts ops: routing + sort-based ragged expert dispatch.

TPU-native replacement for the reference's CUDA MoE kernels
(reference: csrc/kernel/moe/ — topk_softmax, grouped_topk_sigmoid, token
permute/unpermute by index map, align-block grouped GEMM): routing is pure
jnp; dispatch sorts (token, expert) pairs by expert and runs ONE
`jax.lax.ragged_dot` grouped matmul per projection — the MXU-native
equivalent of the reference's permute + grouped GEMM + unpermute pipeline.
All shapes static: the sorted dispatch has length T*top_k regardless of the
routing outcome.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .activation import silu_and_mul


def topk_softmax(router_logits: jax.Array, top_k: int
                 ) -> Tuple[jax.Array, jax.Array]:
    """(T, E) logits → (weights (T,k) normalized, expert ids (T,k)).
    Standard Mixtral routing: softmax over all experts, then top-k weights
    renormalized (reference: csrc/kernel/moe/topk_softmax_kernel.cu)."""
    return route(router_logits, top_k, scoring="softmax", norm_topk=True)


def route(router_logits: jax.Array, top_k: int, scoring: str = "softmax",
          norm_topk: bool = True, routed_scaling: float = 1.0
          ) -> Tuple[jax.Array, jax.Array]:
    """Greedy top-k routing with softmax or sigmoid scoring
    (reference: hydrainfer/model/deepseek_v3.py:40-93 MoEGate)."""
    logits = router_logits.astype(jnp.float32)
    scores = (jax.nn.softmax(logits, axis=-1) if scoring == "softmax"
              else jax.nn.sigmoid(logits))
    weights, idx = jax.lax.top_k(scores, top_k)
    if norm_topk and top_k > 1:
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-20)
    return weights * routed_scaling, idx.astype(jnp.int32)


def grouped_topk(scores_logits: jax.Array, bias, n_groups: int,
                 topk_groups: int, top_k: int, scoring: str = "sigmoid",
                 group_agg: str = "top2sum", norm_topk: bool = True,
                 routed_scaling: float = 1.0
                 ) -> Tuple[jax.Array, jax.Array]:
    """Group-limited routing: keep only the topk_groups best expert groups
    (scored by their top-2 sum or max of [scores + bias]), then top-k
    experts inside; weights are the UNBIASED scores, optionally normalized,
    scaled. Covers DeepSeek-V3's noaux_tc (sigmoid + learned bias, top-2
    sum) and DeepSeek-V2's group_limited_greedy (softmax, no bias, max)."""
    T, E = scores_logits.shape
    logits = scores_logits.astype(jnp.float32)
    scores = (jax.nn.softmax(logits, axis=-1) if scoring == "softmax"
              else jax.nn.sigmoid(logits))
    biased = scores if bias is None else scores + bias.astype(jnp.float32)[None, :]
    grouped = biased.reshape(T, n_groups, E // n_groups)
    if group_agg == "max":
        group_score = jnp.max(grouped, axis=-1)                       # (T, G)
    else:
        group_score = jnp.sum(jax.lax.top_k(grouped, 2)[0], axis=-1)  # (T, G)
    _, keep_groups = jax.lax.top_k(group_score, topk_groups)
    group_mask = jnp.zeros((T, n_groups), bool).at[
        jnp.arange(T)[:, None], keep_groups].set(True)
    expert_mask = jnp.repeat(group_mask, E // n_groups, axis=1)
    masked = jnp.where(expert_mask, biased, -jnp.inf)
    _, idx = jax.lax.top_k(masked, top_k)
    weights = jnp.take_along_axis(scores, idx, axis=1)
    if norm_topk:
        weights = weights / jnp.maximum(jnp.sum(weights, -1, keepdims=True),
                                        1e-20)
    return weights * routed_scaling, idx.astype(jnp.int32)


def grouped_topk_sigmoid(scores_logits: jax.Array, bias: jax.Array,
                         n_groups: int, topk_groups: int, top_k: int,
                         routed_scaling: float = 1.0
                         ) -> Tuple[jax.Array, jax.Array]:
    """DeepSeek-V3 noaux_tc gate
    (reference: csrc/kernel/moe/grouped_topk_sigmoid_kernel.cu and
    hydrainfer/model/deepseek_v3.py:40-93)."""
    return grouped_topk(scores_logits, bias, n_groups, topk_groups, top_k,
                        scoring="sigmoid", group_agg="top2sum",
                        norm_topk=True, routed_scaling=routed_scaling)


def moe_ffn(x: jax.Array, gate_up: jax.Array, down: jax.Array,
            weights: jax.Array, expert_ids: jax.Array) -> jax.Array:
    """Grouped-matmul expert FFN.

    x: (T, d); gate_up: (E, d, 2I); down: (E, I, d);
    weights/expert_ids: (T, k) from a routing fn. Returns (T, d).
    """
    T, d = x.shape
    E = gate_up.shape[0]
    k = expert_ids.shape[1]
    n = T * k

    flat_experts = expert_ids.reshape(n)
    flat_tokens = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    flat_weights = weights.reshape(n)

    # permute by expert (stable: token order preserved within an expert)
    order = jnp.argsort(flat_experts, stable=True)
    sorted_tokens = flat_tokens[order]
    sorted_weights = flat_weights[order]
    xs = jnp.take(x, sorted_tokens, axis=0)                 # (n, d)
    group_sizes = jnp.bincount(flat_experts, length=E).astype(jnp.int32)

    h = jax.lax.ragged_dot(xs, gate_up, group_sizes,
                           preferred_element_type=jnp.float32).astype(x.dtype)
    h = silu_and_mul(h)
    out = jax.lax.ragged_dot(h, down, group_sizes,
                             preferred_element_type=jnp.float32)
    out = out * sorted_weights[:, None]

    # unpermute: weighted scatter-add back to token rows
    result = jnp.zeros((T, d), jnp.float32)
    result = result.at[sorted_tokens].add(out)
    return result.astype(x.dtype)


def moe_ffn_ep(x: jax.Array, gate_up: jax.Array, down: jax.Array,
               weights: jax.Array, expert_ids: jax.Array, mesh,
               axis: str = "tp") -> jax.Array:
    """Expert-parallel FFN: experts sharded over a mesh axis, tokens
    replicated.

    The TPU-native expert-parallel layout: each device holds E/n contiguous
    experts (the leading axis of gate_up/down is sharded); every device
    masks the routing table down to ITS experts, runs the same sort-based
    grouped matmul on its shard, and a psum over the axis combines partial
    token outputs. No all-to-all, no token permutation across chips — the
    combine is one ICI all-reduce of (T, d), which for decode batches is
    tiny next to the expert-weight HBM reads the sharding divides by n.
    (The reference has no expert parallelism at all; its MoE kernels are
    single-GPU — csrc/kernel/moe/.)

    Non-local (token, expert) pairs keep static shape: they collapse onto
    local expert 0 with weight 0, so each shard's ragged_dot stays the same
    shape as the unsharded op.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    E = gate_up.shape[0]
    n_shards = mesh.shape[axis]
    assert E % n_shards == 0, (E, n_shards)
    e_local = E // n_shards

    def local_fn(x, gu, dn, w, ids):
        lo = jax.lax.axis_index(axis) * e_local
        local = (ids >= lo) & (ids < lo + e_local)
        w_local = jnp.where(local, w, 0.0)
        ids_local = jnp.where(local, ids - lo, 0)
        out = moe_ffn(x, gu, dn, w_local, ids_local)
        return jax.lax.psum(out, axis)

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=P(), check_vma=False)(x, gate_up, down, weights, expert_ids)


def moe_ffn_dense(x: jax.Array, gate_up: jax.Array, down: jax.Array,
                  weights: jax.Array, expert_ids: jax.Array) -> jax.Array:
    """Oracle: run every expert on every token, mask-combine. O(T*E)."""
    E = gate_up.shape[0]
    h = jnp.einsum("td,edi->tei", x.astype(jnp.float32),
                   gate_up.astype(jnp.float32))
    h = jax.nn.silu(h[..., : h.shape[-1] // 2]) * h[..., h.shape[-1] // 2:]
    y = jnp.einsum("tei,eid->ted", h, down.astype(jnp.float32))  # (T,E,d)
    T, k = expert_ids.shape
    mask = jnp.zeros((T, E), jnp.float32).at[
        jnp.arange(T)[:, None], expert_ids].add(weights.astype(jnp.float32))
    return jnp.einsum("ted,te->td", y, mask).astype(x.dtype)
