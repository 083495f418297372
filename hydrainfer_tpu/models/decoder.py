"""Shared paged-attention decoder blocks for Llama-family language models.

TPU-native re-design of the reference's shared forward blocks
(reference: hydrainfer/model/model_forward.py:39-105 — UpDownMLP,
GateUpDownMLP, ROPECausalGroupedQueryPageAttention, DecoderLayer with
last-layer token discard). One pure function `decoder_forward` runs the whole
stack inside a single jit: embed → (overwrite image slots) → lax.scan over
the first n_layers-1 decoder layers with STACKED weights (one compiled layer
body instead of an unrolled stack — an order of magnitude less HLO and
compile time) → explicit last layer → final norm → lm_head on ONLY the
sampled rows → greedy argmax.

The last-layer token-discard optimization survives in static-shape form:
after the final layer's attention (which must see all T tokens to append
their KV), the residual stream is gathered down to the S sampled rows before
the final MLP and the lm_head matmul (reference: model_forward.py:101-103).
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.activation import silu_and_mul
from ..ops.quant import qmatmul, qmatmul_f32
from ..ops.attention import PagedAttentionParams, paged_attention
from ..ops.cache_ops import write_kv_cache
from ..ops.norm import rms_norm
from ..ops.rope import apply_rotary_emb
from .factory import LanguageModelBatch


@dataclass(frozen=True)
class DecoderConfig:
    n_layers: int
    hidden_size: int
    intermediate_size: int
    n_qo_heads: int
    n_kv_heads: int
    head_dim: int
    vocab_size: int
    max_position_embeddings: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    qkv_bias: bool = False
    rope_interleaved: bool = False
    tie_word_embeddings: bool = False
    attention_impl: str = "auto"
    # layer-loop compilation strategy:
    #   "scan"   — lax.scan over stacked weights; ONE compiled layer body.
    #              The cache is one stacked (L, ...) array/Ref and the
    #              kernel operand `cache[layer, 0]` has a DYNAMIC layer
    #              index, which XLA materializes (~cache/L bytes per layer,
    #              i.e. the whole pool per step: measured 3.2ms/GB).
    #   "unroll" — Python loop over per-layer weights with the cache held
    #              as L per-layer buffers (see TokenCacheBlockManagerConfig
    #              .per_layer). The kernel operand is the per-layer buffer
    #              itself (static offset-0 slice = free bitcast): per-step
    #              cost is independent of pool size.
    layer_loop: str = "scan"
    # INT8 KV cache: when set, K/V are quantized symmetrically with this
    # static scale on write and dequantized inside the attention kernel
    # (ragged kernel k_scale/v_scale path). None = cache in model dtype.
    kv_scale: float = None
    # multimodal RoPE (Qwen2-VL): per-axis frequency sections (t, h, w)
    # summing to head_dim/2; () = standard 1D rope. See ops/rope.py:
    # mrope_gather (HF-exact; the reference has no M-RoPE at all).
    mrope_section: tuple = ()
    # Multi-head Latent Attention (DeepSeek V2/V3; 0 = off). The KV cache
    # stores ONE vector per token: [c_kv (kv_lora) | rotated k_pe (rope)],
    # so head_dim must equal mla_kv_lora + mla_rope_dim and n_kv_heads 1.
    # Attention runs "absorbed": q_nope is projected into latent space with
    # W_UK, scores are taken against the cached latents directly (an MQA
    # with the v:=k trick — the attention output's first kv_lora dims are
    # the latent context, expanded per head by W_UV). The reference cannot
    # load MLA checkpoints at all (hydrainfer/model/deepseek_v3.py:158-183
    # is plain GQA) — i.e. no REAL DeepSeek-V2/V3 checkpoint works there.
    mla_kv_lora: int = 0
    mla_rope_dim: int = 0
    mla_nope_dim: int = 0
    mla_v_dim: int = 0
    # real V3 checkpoints store rope weights interleaved (HF rope_interleave)
    mla_rope_interleave: bool = True
    # 0 = 1/sqrt(nope+rope); yarn-scaled checkpoints bake mscale^2 in here
    mla_softmax_scale: float = 0.0
    # rope table dim override (MLA ropes only mla_rope_dim of each head);
    # 0 = head_dim
    rope_head_dim: int = 0
    # YaRN rope scaling (DeepSeek-V2/V3/R1 checkpoints all ship it):
    # (factor, original_max_pos, beta_fast, beta_slow, attention_factor,
    # truncate); () = plain rope. attention_factor scales cos/sin (HF
    # modeling_rope_utils._compute_yarn_parameters); the mscale^2 softmax
    # scale lives in mla_softmax_scale.
    yarn: tuple = ()
    # sparse MoE MLP (0 = dense): layers carry moe_router/moe_gate_up/moe_down
    moe_top_k: int = 0
    n_experts: int = 0
    moe_scoring: str = "softmax"       # softmax | sigmoid
    moe_norm_topk: bool = True
    moe_routed_scaling: float = 1.0
    # group-limited routing (DeepSeek-V3 noaux_tc gate): experts divide into
    # n_groups, only topk_groups survive (scored by their top-2 sum of
    # sigmoid+bias), then top-k inside. 0 = plain top-k routing.
    moe_n_groups: int = 0
    moe_topk_groups: int = 0
    # "noaux_tc" (V3: sigmoid + learned bias, groups by top-2 sum) or
    # "group_limited_greedy" (V2: softmax, no bias, groups by max)
    moe_group_method: str = "noaux_tc"
    # manual-SPMD tensor parallelism INSIDE a shard_map (PP v2's
    # TP-in-stage): head counts in this cfg are already LOCAL shard counts
    # and the row-parallel matmuls (o_proj, mlp down) psum their partial
    # sums over this named axis. None = single-shard semantics.
    tp_reduce_axis: Optional[str] = None
    # tensor-parallel mesh (set by shard_to): attention runs under shard_map
    # with q heads + cache kv-heads sharded over the 'tp' axis — the Pallas
    # ragged kernel cannot be GSPMD-partitioned, so the head axis is split
    # explicitly and each device runs the kernel on its local heads
    mesh: object = None
    # perf-bisect ablations, comma-separated ("no-attn", "no-write"): lets
    # the in-process A/B harness build ablated engines side by side (the
    # HYDRA_BISECT env var sets the same thing process-wide)
    bisect: str = ""
    # ragged-kernel tuning override: kv pages fetched per flash block
    # (None = upstream auto-tuned table). At short decode contexts the
    # tuned sizes leave the kernel DMA-latency-bound (xplane: ~60% of the
    # fused-decode program in 28 attention calls); this knob is the A/B
    # vehicle (evaluation/ab_bench.py kv_pages_per_block=N).
    kv_pages_per_block: Optional[int] = None


def init_rope_tables(cfg: DecoderConfig):
    import math

    import numpy as np
    d = cfg.rope_head_dim or cfg.head_dim
    base = cfg.rope_theta
    att = 1.0
    if cfg.yarn:
        # YaRN (HF modeling_rope_utils._compute_yarn_parameters): blend
        # interpolated and extrapolated inverse frequencies with a linear
        # ramp over the correction range, then scale cos/sin
        factor, orig_max, bfast, bslow, att, trunc = cfg.yarn
        pos_freqs = base ** (np.arange(0, d, 2, dtype=np.float64) / d)
        inv_ex = 1.0 / pos_freqs
        inv_in = 1.0 / (factor * pos_freqs)

        def corr_dim(rot):
            return (d * math.log(orig_max / (rot * 2 * math.pi))) \
                / (2 * math.log(base))

        low, high = corr_dim(bfast), corr_dim(bslow)
        if trunc:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, d - 1)
        if low == high:
            high += 0.001
        ramp = np.clip((np.arange(d // 2, dtype=np.float64) - low)
                       / (high - low), 0, 1)
        ex_f = 1.0 - ramp
        inv = jnp.asarray(inv_in * (1 - ex_f) + inv_ex * ex_f, jnp.float32)
    else:
        inv = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    t = jnp.arange(cfg.max_position_embeddings, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv)
    return jnp.cos(freqs) * att, jnp.sin(freqs) * att


def stack_layer_weights(layers: list, consume: bool = False) -> dict:
    """List of per-layer dicts → dict of pytrees stacked on a leading layer
    axis (for lax.scan). Handles plain arrays and QuantizedTensor leaves;
    None-valued entries (absent biases) are dropped.

    consume=True drops each per-layer entry as its key is stacked, so the
    transient HBM peak is one key's stack (~3 GB for a 7B int8 gate_up)
    instead of a full second copy of the tree (which OOMs a 16 GB chip at
    the 7B int8 size)."""
    keys = [k for k, v in layers[0].items() if v is not None]
    out = {}
    for k in keys:
        out[k] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                        *[lw[k] for lw in layers])
        if consume:
            for lw in layers:
                lw[k] = None
    return out


def pack_decoder_weights(weights: dict, layer_loop: str = "scan") -> dict:
    """Converted checkpoint layout {"layers": [per-layer dicts], ...} →
    scan layout {"layers_segments": [{"offset", stacked...}], "last_layer"},
    or (layer_loop="unroll") the per-layer list kept as "layers_list".

    Consecutive layers with the same weight signature (e.g. DeepSeek's dense
    prefix then MoE region) form one scan segment each."""
    if ("layers_segments" in weights or "layers_list" in weights
            or "layers_stacked" in weights):
        return weights
    layers = weights["layers"]
    if layer_loop == "unroll":
        packed = {k: v for k, v in weights.items() if k != "layers"}
        packed["layers_list"] = [
            {k: v for k, v in lw.items() if v is not None}
            for lw in layers[:-1]]
        packed["last_layer"] = {k: v for k, v in layers[-1].items()
                                if v is not None}
        return packed
    if layer_loop == "unroll_stacked":
        # unroll's per-layer cache buffers (static offset-0 kernel operand,
        # pool-size-independent steps) WITHOUT unroll's per-layer weight
        # args: the body layers stack per key and each iteration takes a
        # STATIC slice (free). Dispatch cost over the tunnel scales with
        # the executable's arg count (PERF_NOTES: 46ms at ~45 args vs
        # 105ms at ~230), so ~L+10 args instead of ~8L is the point.
        body = layers[:-1]
        sigs = {tuple(sorted(k for k, v in lw.items() if v is not None))
                for lw in body}
        if len(sigs) != 1:
            # mixed signatures (e.g. DeepSeek dense prefix + MoE): keep the
            # plain per-layer list
            return pack_decoder_weights(weights, "unroll")
        packed = {k: v for k, v in weights.items() if k != "layers"}
        # consume: drop per-layer refs key-by-key as they stack, so the
        # transient peak is one key's stack, not a second full tree (a 7B
        # int8 tree + its stacked copy OOMs a 16 GB chip). The input dict's
        # layer list is spent afterwards (unroll_stacked only — scan-path
        # callers re-pack the same raw tree in tests).
        packed["layers_stacked"] = stack_layer_weights(body, consume=True)
        packed["last_layer"] = {k: v for k, v in layers[-1].items()
                                if v is not None}
        weights.pop("layers", None)
        return packed
    packed = {k: v for k, v in weights.items() if k != "layers"}
    body = layers[:-1]
    segments = []
    i = 0
    while i < len(body):
        sig = tuple(sorted(k for k, v in body[i].items() if v is not None))
        j = i
        while j < len(body) and sig == tuple(
                sorted(k for k, v in body[j].items() if v is not None)):
            j += 1
        seg = stack_layer_weights(body[i:j])
        seg["offset"] = jnp.asarray(i, jnp.int32)
        segments.append(seg)
        i = j
    packed["layers_segments"] = segments
    packed["last_layer"] = {k: v for k, v in layers[-1].items() if v is not None}
    return packed


import os as _os
_BISECT = _os.environ.get("HYDRA_BISECT", "")


def _deinterleave(x):
    """[x0,x1,x2,x3,...] → [x0,x2,...,x1,x3,...] (HF rope_interleave:
    checkpoints whose rope weights are stored pair-interleaved are
    reordered before the standard rotate-half rope)."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _mla_layer(x, cache, layer_id, lw, batch: LanguageModelBatch,
               cos, sin, cfg: DecoderConfig, max_q: int):
    """DeepSeek Multi-head Latent Attention layer (absorbed form).

    HF reference semantics (transformers modeling_deepseek_v3.py:380-445):
    q via the optional q-LoRA stack, kv compressed to [c_kv | k_pe]. Here
    the cache stores EXACTLY that compressed vector per token (kv head 1,
    dim kv_lora+rope — the ~an-order-of-magnitude KV saving MLA exists
    for), and attention runs absorbed: q_nope @ W_UK gives the latent-space
    query, scores are taken directly against cached vectors with the
    standard paged-attention kernels via the v:=k trick (the output's first
    kv_lora dims are the latent context), then W_UV expands per head.
    Mathematically identical to HF's materialized form."""
    T = x.shape[0]
    H = cfg.n_qo_heads
    r, dr = cfg.mla_kv_lora, cfg.mla_rope_dim
    dn, dv = cfg.mla_nope_dim, cfg.mla_v_dim
    eps = cfg.rms_norm_eps

    h = rms_norm(x, lw["input_norm"], eps)
    if "q_a" in lw:
        q = qmatmul(rms_norm(qmatmul(h, lw["q_a"]), lw["q_a_norm"], eps),
                    lw["q_b"])
    else:
        q = qmatmul(h, lw["q_proj"])
    q = q.reshape(T, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = qmatmul(h, lw["kv_a"])                       # (T, r + dr)
    c_kv = rms_norm(ckv[:, :r], lw["kv_a_norm"], eps)
    k_pe = ckv[:, None, r:]                            # (T, 1, dr)

    if cfg.mla_rope_interleave:
        q_pe = _deinterleave(q_pe)
        k_pe = _deinterleave(k_pe)
    q_pe = apply_rotary_emb(q_pe, cos, sin, False)
    k_pe = apply_rotary_emb(k_pe, cos, sin, False)

    # absorbed latent query: W_UK is (r, H, dn)
    q_lat = jnp.einsum("thn,rhn->thr", q_nope, lw["w_uk"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
    q_full = jnp.concatenate([q_lat, q_pe], axis=-1)   # (T, H, r+dr)

    kv_vec = jnp.concatenate([c_kv[:, None, :], k_pe], axis=-1)  # (T,1,r+dr)
    # the cache may carry the latent dim PADDED to a 128 lane multiple (the
    # Pallas latent kernel's DMA alignment; cluster/node.py sizes it) — pad
    # q and the cached vector with zeros, which adds exactly 0 to every
    # q·k score and leaves the output's first r dims (the ones w_uv reads)
    # untouched
    cache_dim = (cache[0].shape[-1] if isinstance(cache, (list, tuple))
                 else cache.shape[-1])
    if cache_dim > r + dr:
        pad = ((0, 0), (0, 0), (0, cache_dim - (r + dr)))
        q_full = jnp.pad(q_full, pad)
        kv_vec = jnp.pad(kv_vec, pad)
    if cfg.kv_scale is not None:
        # int8 latent cache: ONE plane (v:=k reads the same vector), so one
        # static symmetric scale quantizes the whole [c_kv|k_pe] vector;
        # the attention oracle dequantizes with the same kv_scale below —
        # where the MLA byte saving compounds (BASELINE INT8-KV configs)
        kv_vec = jnp.clip(jnp.round(kv_vec.astype(jnp.float32) / cfg.kv_scale),
                          -127, 127).astype(jnp.int8)
    bisect = cfg.bisect or _BISECT
    if "no-write" not in bisect:
        head_axis = (cache[0].shape[-2] if isinstance(cache, (list, tuple))
                     else cache.shape[-2])
        if head_axis == 1:
            # single-plane latent cache: ONE [c_kv|k_pe] vector per token
            # (the v:=k trick reads the same plane for scores and values) —
            # the full MLA KV saving, no duplicate storage
            from ..ops.cache_ops import write_token_cache
            cache = write_token_cache(cache, layer_id,
                                      batch.attention.new_kv_slot_ids,
                                      (kv_vec,),
                                      cache[0].shape[3]
                                      if isinstance(cache, (list, tuple))
                                      else cache.shape[3])
        else:
            cache = _write_kv(cache, layer_id, batch, kv_vec, kv_vec, cfg)

    scale = cfg.mla_softmax_scale or 1.0 / ((dn + dr) ** 0.5)
    if cfg.mesh is not None:
        # TP over MLA: q heads (and W_UK/W_UV/o_proj) shard over 'tp'; the
        # latent cache is REPLICATED (kv head 1 cannot split), so attention
        # partitions along the q-head axis under GSPMD (paged_attention_tp
        # detects KVH % tp != 0 and takes the oracle path, which XLA
        # partitions by the sharded head operands)
        from ..ops.attention import paged_attention_tp
        attn = paged_attention_tp(q_full, cache, layer_id, batch.attention,
                                  scale, max_q, cfg.mesh,
                                  impl=cfg.attention_impl,
                                  kv_scale=cfg.kv_scale)
    else:
        attn = paged_attention(q_full, cache, layer_id, batch.attention,
                               scale, max_q, impl=cfg.attention_impl,
                               kv_scale=cfg.kv_scale)
    ctx = attn[..., :r]                                # (T, H, r)
    out = jnp.einsum("thr,rhv->thv", ctx, lw["w_uv"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + qmatmul(out.reshape(T, H * dv), lw["o_proj"])

    h = rms_norm(x, lw["post_norm"], eps)
    return x + _mlp(h, lw, cfg), cache


def _layer_body(x, cache, layer_id, lw, batch: LanguageModelBatch,
                cos, sin, cfg: DecoderConfig, max_q: int):
    """One decoder layer: attention block + MLP block."""
    if cfg.mla_kv_lora > 0:
        return _mla_layer(x, cache, layer_id, lw, batch, cos, sin, cfg, max_q)
    T = x.shape[0]
    Hq, Hkv, D = cfg.n_qo_heads, cfg.n_kv_heads, cfg.head_dim

    h = rms_norm(x, lw["input_norm"], cfg.rms_norm_eps)
    qkv = qmatmul(h, lw["qkv_proj"])
    if "qkv_bias" in lw:
        qkv = qkv + lw["qkv_bias"]
    q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
    q = apply_rotary_emb(q.reshape(T, Hq, D), cos, sin, cfg.rope_interleaved)
    k = apply_rotary_emb(k.reshape(T, Hkv, D), cos, sin, cfg.rope_interleaved)
    v = v.reshape(T, Hkv, D)

    bisect = cfg.bisect or _BISECT
    if "no-write" not in bisect:
        cache = _write_kv(cache, layer_id, batch, k, v, cfg)
    if "no-attn" in bisect:
        attn = q
    elif cfg.attention_impl == "layered" and not isinstance(cache, jax.Ref):
        # in-place chain: aliased writer → aliased attention passthrough.
        # The cache buffer is pinned end-to-end; the scan carry never copies.
        from ..ops.attention import paged_attention_layered
        attn, cache = paged_attention_layered(
            q, cache, layer_id, batch.attention, 1.0 / (D ** 0.5),
            k_scale=cfg.kv_scale, v_scale=cfg.kv_scale,
            interpret=jax.default_backend() != "tpu", return_cache=True)
    elif cfg.mesh is not None:
        from ..ops.attention import paged_attention_tp
        attn = paged_attention_tp(q, cache, layer_id, batch.attention,
                                  1.0 / (D ** 0.5), max_q, cfg.mesh,
                                  impl=cfg.attention_impl, kv_scale=cfg.kv_scale)
    else:
        attn = paged_attention(q, cache, layer_id, batch.attention,
                               1.0 / (D ** 0.5), max_q, impl=cfg.attention_impl,
                               kv_scale=cfg.kv_scale,
                               pages_per_block=cfg.kv_pages_per_block)
    o = qmatmul(attn.reshape(T, Hq * D), lw["o_proj"])
    if cfg.tp_reduce_axis:       # row-parallel o_proj: combine shard sums
        o = jax.lax.psum(o, cfg.tp_reduce_axis)
    x = x + o

    h = rms_norm(x, lw["post_norm"], cfg.rms_norm_eps)
    return x + _mlp(h, lw, cfg), cache


def _write_kv(cache, layer_id, batch, k, v, cfg: DecoderConfig):
    if cfg.kv_scale is not None and k.dtype != jnp.int8:
        k = jnp.clip(jnp.round(k.astype(jnp.float32) / cfg.kv_scale),
                     -127, 127).astype(jnp.int8)
        v = jnp.clip(jnp.round(v.astype(jnp.float32) / cfg.kv_scale),
                     -127, 127).astype(jnp.int8)
    if cfg.attention_impl == "layered" and not isinstance(cache, jax.Ref):
        # pallas DMA writer with the cache aliased in/out: in-place on the
        # value path (the XLA scatter ping-pongs the scan carry instead)
        from ..ops.pallas.kv_writer import write_kv_pages
        kv = jnp.concatenate([k[:, :, None], v[:, :, None]], axis=2)
        kv = kv.reshape(k.shape[0], 2 * k.shape[1], k.shape[2])
        return write_kv_pages(cache, kv, layer_id,
                              batch.attention.new_kv_slot_ids,
                              batch.attention.q_seq_ids,
                              block_size=cache.shape[3],
                              interpret=jax.default_backend() != "tpu")
    return write_kv_cache(cache, layer_id, batch.attention.new_kv_slot_ids,
                          k, v, cache.shape[3])


def _mlp(h: jax.Array, lw: dict, cfg: DecoderConfig) -> jax.Array:
    if cfg.moe_top_k > 0 and "moe_router" in lw:
        from ..ops.moe import grouped_topk_sigmoid, moe_ffn, moe_ffn_ep, route
        logits = jnp.dot(h.astype(jnp.float32),
                         lw["moe_router"].astype(jnp.float32))
        if cfg.moe_n_groups > 0:
            if cfg.moe_group_method == "group_limited_greedy":
                from ..ops.moe import grouped_topk
                weights, idx = grouped_topk(
                    logits, None, cfg.moe_n_groups, cfg.moe_topk_groups,
                    cfg.moe_top_k, scoring="softmax", group_agg="max",
                    norm_topk=cfg.moe_norm_topk,
                    routed_scaling=cfg.moe_routed_scaling)
            else:
                weights, idx = grouped_topk_sigmoid(
                    logits, lw["moe_router_bias"], cfg.moe_n_groups,
                    cfg.moe_topk_groups, cfg.moe_top_k,
                    routed_scaling=cfg.moe_routed_scaling)
        else:
            weights, idx = route(logits, cfg.moe_top_k,
                                 scoring=cfg.moe_scoring,
                                 norm_topk=cfg.moe_norm_topk,
                                 routed_scaling=cfg.moe_routed_scaling)
        if cfg.mesh is not None and cfg.mesh.shape.get("tp", 1) > 1:
            # expert parallelism: expert axis sharded over 'tp', combine by
            # psum (ops/moe.py:moe_ffn_ep) — each chip reads 1/n of the
            # expert weights per step
            out = moe_ffn_ep(h, lw["moe_gate_up"], lw["moe_down"], weights,
                             idx, cfg.mesh, axis="tp")
        else:
            out = moe_ffn(h, lw["moe_gate_up"], lw["moe_down"], weights, idx)
        if "gate_up" in lw:  # shared experts alongside the routed ones
            shared = qmatmul(silu_and_mul(qmatmul(h, lw["gate_up"])), lw["down"])
            if cfg.tp_reduce_axis:  # pp×tp shards gate_up/down: partial sums
                shared = jax.lax.psum(shared, cfg.tp_reduce_axis)
            out = out + shared
        return out
    out = qmatmul(silu_and_mul(qmatmul(h, lw["gate_up"])), lw["down"])
    if cfg.tp_reduce_axis:       # row-parallel down: combine shard sums
        out = jax.lax.psum(out, cfg.tp_reduce_axis)
    return out


def decoder_forward(weights: dict, cache: jax.Array, batch: LanguageModelBatch,
                    cos_tab: jax.Array, sin_tab: jax.Array, cfg: DecoderConfig,
                    max_q: int, input_embeds: Optional[jax.Array] = None,
                    return_logits: bool = False,
                    token_table: Optional[jax.Array] = None,
                    spec: int = 0):
    """Full LM step. Returns (cache, token_table, sampled_token_ids[, logits]).

    weights layout: {"embed", "layers_segments" (stacked scan segments),
    "last_layer" (dict), "norm", "lm_head"} — see LlamaForCausalLM which
    stacks the converted per-layer weights at init.

    token_table is the device-resident async-decode feedback buffer: decode
    tokens are gathered from it (token_src_slots) and sampled tokens are
    scattered back (sample_dst_slots) — the host never sits between a
    sampled token and the step that consumes it.
    """
    if token_table is None:
        token_table = jnp.zeros((1,), jnp.int32)
    token_ids = batch.token_ids
    src = batch.token_src_slots
    token_ids = jnp.where(
        src >= 0, jnp.take(token_table, jnp.maximum(src, 0), axis=0), token_ids)
    if input_embeds is None:
        x = jnp.take(weights["embed"], token_ids, axis=0)
        # splice vision features over <image> positions; padded dst (-1) maps
        # to the out-of-bounds index T so mode='drop' actually drops it
        # (negative indices would wrap numpy-style)
        dst = jnp.where(batch.image_dst_idx < 0, x.shape[0], batch.image_dst_idx)
        x = x.at[dst].set(batch.image_features.astype(x.dtype), mode="drop")
    else:
        x = input_embeds

    # per-token rope tables, gathered once for all layers
    if cfg.mrope_section and getattr(batch, "positions_hw", None) is not None:
        from ..ops.rope import mrope_gather
        cos, sin = mrope_gather(cos_tab, sin_tab, batch.positions,
                                batch.positions_hw[0], batch.positions_hw[1],
                                cfg.mrope_section)
    else:
        cos = jnp.take(cos_tab, batch.positions, axis=0)
        sin = jnp.take(sin_tab, batch.positions, axis=0)

    per_layer = "layers_list" in weights or "layers_stacked" in weights
    if per_layer:
        # unrolled loop over per-layer cache buffers (list of L entries,
        # each (1, n_tensors, n_blocks, bs, heads, dim) — Ref or array).
        # Static layer index 0 into a per-layer buffer is an offset-0 slice
        # (free); nothing in the step scales with total pool size.
        assert isinstance(cache, (list, tuple)) and len(cache) == cfg.n_layers, \
            "unroll layer_loop needs a per-layer cache (per_layer=True manager)"
        cache = list(cache)
        is_ref = isinstance(cache[0], jax.Ref)
        if "layers_stacked" in weights:
            # STATIC slices of per-key stacked weights: same compute as the
            # per-layer list, ~1/8 the dispatch args (dispatch cost over the
            # tunnel scales with the executable's arg count)
            stack = weights["layers_stacked"]
            body_lws = [jax.tree_util.tree_map(lambda v, _l=l: v[_l], stack)
                        for l in range(cfg.n_layers - 1)]
        else:
            body_lws = weights["layers_list"]
        for l, lw in enumerate(body_lws):
            x, cache[l] = _layer_body(x, cache[l], 0, lw, batch, cos, sin,
                                      cfg, max_q)
        last_cache, last_layer_id = cache[-1], 0
        return _last_layer_and_head(
            weights, cache, last_cache, last_layer_id, x, batch, cos, sin,
            cfg, max_q, token_table, return_logits, is_ref, per_layer,
            spec=spec)

    is_ref = isinstance(cache, jax.Ref)

    if is_ref:
        # the ref is closed over: layers write it in place, only the
        # residual stream x rides the scan carry (whole-cache carry copies
        # cost ~3ms/GB/step otherwise)
        def scan_step(x, inp):
            layer_id, lw = inp
            x, _ = _layer_body(x, cache, layer_id, lw, batch, cos, sin, cfg, max_q)
            return x, None
    else:
        def scan_step(carry, inp):
            x, c = carry
            layer_id, lw = inp
            x, c = _layer_body(x, c, layer_id, lw, batch, cos, sin, cfg, max_q)
            return (x, c), None

    for seg in weights["layers_segments"]:
        stack = {k: v for k, v in seg.items() if k != "offset"}
        n_seg = jax.tree_util.tree_leaves(stack)[0].shape[0]
        layer_ids = seg["offset"] + jnp.arange(n_seg, dtype=jnp.int32)
        if is_ref:
            x, _ = jax.lax.scan(scan_step, x, (layer_ids, stack))
        else:
            (x, cache), _ = jax.lax.scan(scan_step, (x, cache), (layer_ids, stack))

    return _last_layer_and_head(
        weights, cache, cache, cfg.n_layers - 1, x, batch, cos, sin,
        cfg, max_q, token_table, return_logits, is_ref, False, spec=spec)


def decoder_forward_multi(weights, cache, batch: LanguageModelBatch,
                          cos_tab: jax.Array, sin_tab: jax.Array,
                          cfg: DecoderConfig, n_steps: int,
                          token_table: jax.Array,
                          fused_k: Optional[jax.Array] = None):
    """K fused decode steps in ONE device program.

    Every sequence in the batch is a single-token decode whose geometry
    advances deterministically: position/kv_len/cache-slot all move by
    exactly 1 per step, and each step's input token is the previous step's
    sampled token read from the device token table — so the host (and the
    per-dispatch tunnel round-trip) drops out of the inner loop entirely.
    This is the TPU equivalent of the reference's captured all-decode CUDA
    graph replayed K times (reference:
    hydrainfer/model_runner/cuda_graph_model_runner.py:29-73), except the
    whole K-step loop is one compiled program.

    fused_k ((S,) int32, defaults to n_steps everywhere) caps each
    sequence's participation: seq r runs steps 0..fused_k[r]-1; on later
    steps its geometry freezes at its last real step and BOTH state writes
    (kv-cache slot, token-table slot) are masked to -1 (dropped), so a
    request near its token limit rides along in a full-window batch without
    corrupting any state — the window never collapses to the batch-wide
    minimum, and n_steps stays a small static set (no per-tail recompiles).

    batch carries step-0 geometry; the block tables must already cover
    positions[0] + fused_k - 1 per sequence (the executor reallocs ahead).
    Returns (cache_out | None for refs, token_table, tokens (n_steps, S));
    rows s >= fused_k[r] of column r are recomputed garbage the host drops.
    """
    a = batch.attention
    if isinstance(cache, (list, tuple)):
        bs = (cache[0].shape[3])
        is_ref = isinstance(cache[0], jax.Ref)
    else:
        bs = cache.shape[3]
        is_ref = isinstance(cache, jax.Ref)
    valid_tok = a.q_seq_ids >= 0                    # (T,)
    seq_of_tok = jnp.maximum(a.q_seq_ids, 0)
    valid_seq = a.kv_lens > 0                       # (S,)
    if fused_k is None:
        fused_k = jnp.full(a.kv_lens.shape, n_steps, jnp.int32)

    def step_batch(s):
        s_seq = jnp.minimum(s, jnp.maximum(fused_k - 1, 0))   # (S,) clamp
        act_seq = s < fused_k                                  # (S,)
        act_tok = valid_tok & (s < fused_k[seq_of_tok])        # (T,)
        pos = a.positions + jnp.where(valid_tok, s_seq[seq_of_tok], 0)
        kv = a.kv_lens + jnp.where(valid_seq, s_seq, 0)
        # the write slot comes from the CACHE position (kv_len - 1), not
        # the rope position — under M-RoPE image runs compress rope
        # positions, so pos and cache index differ by a per-request offset
        cache_pos = jnp.maximum(kv[seq_of_tok] - 1, 0)
        blk = a.block_tables[seq_of_tok, cache_pos // bs]  # (T,)
        slots = jnp.where(act_tok & (blk >= 0),
                          blk * bs + cache_pos % bs, -1)
        attn = PagedAttentionParams(
            q_seq_ids=a.q_seq_ids, q_local_ids=a.q_local_ids,
            positions=pos, kv_lens=kv, block_tables=a.block_tables,
            new_kv_slot_ids=slots, cu_q_lens=a.cu_q_lens,
            num_seqs=a.num_seqs)
        # step 0 takes its input token however the host packed it (table
        # slot OR a host-resolved literal, e.g. right after migration);
        # steps 1..K-1 MUST read the previous step's sampled token from the
        # table — the literal would repeat step 0's input forever
        chained_src = jnp.where(valid_tok,
                                batch.sample_dst_slots[seq_of_tok], -1)
        src = jnp.where(s > 0, chained_src, batch.token_src_slots)
        dst = jnp.where(act_seq, batch.sample_dst_slots, -1)
        import dataclasses
        b = dataclasses.replace(batch, positions=pos, attention=attn,
                                token_src_slots=src, sample_dst_slots=dst)
        if getattr(batch, "positions_hw", None) is not None:
            # decode advances all three mrope axes together
            hw = batch.positions_hw + jnp.where(valid_tok,
                                                s_seq[seq_of_tok], 0)[None, :]
            b = dataclasses.replace(b, positions_hw=hw)
        if getattr(batch, "temperatures", None) is not None \
                and batch.temperatures.shape[0] > 0:
            b = dataclasses.replace(b, sample_seed=batch.sample_seed + s)
        return b

    if is_ref:
        def body(tt, s):
            _, tt, tokens = decoder_forward(
                weights, cache, step_batch(s), cos_tab, sin_tab, cfg,
                max_q=1, token_table=tt)
            return tt, tokens

        token_table, toks = jax.lax.scan(
            body, token_table, jnp.arange(n_steps, dtype=jnp.int32))
        return None, token_table, toks

    def body(carry, s):
        c, tt = carry
        c, tt, tokens = decoder_forward(
            weights, c, step_batch(s), cos_tab, sin_tab, cfg,
            max_q=1, token_table=tt)
        return (c, tt), tokens

    (cache, token_table), toks = jax.lax.scan(
        body, (cache, token_table), jnp.arange(n_steps, dtype=jnp.int32))
    return cache, token_table, toks


def _last_layer_and_head(weights, cache, last_cache, last_layer_id, x, batch,
                         cos, sin, cfg: DecoderConfig, max_q, token_table,
                         return_logits, is_ref, per_layer, spec: int = 0):
    # last layer: attention sees all T tokens (their KV must be appended),
    # then only the sampled rows continue through the MLP and head
    sample_idx = jnp.maximum(batch.sample_token_idx, 0)
    lw = weights["last_layer"]
    if cfg.mla_kv_lora > 0:
        # MLA last layer runs whole (token discard after its MLP — a FLOP
        # nicety the latent path skips), then the shared head
        x, last_cache = _mla_layer(x, last_cache, last_layer_id, lw, batch,
                                   cos, sin, cfg, max_q)
        if per_layer:
            cache = list(cache[:-1]) + [last_cache]
        else:
            cache = last_cache
        cache_out = None if is_ref else cache
        if spec > 0:
            token_table, tokens = _spec_verify_head(weights, x, batch, cfg,
                                                    token_table, spec)
            return cache_out, token_table, tokens
        x = jnp.take(x, sample_idx, axis=0)
        token_table, tokens, logits = _final_head(weights, x, batch, cfg,
                                                  token_table)
        if return_logits:
            return cache_out, token_table, tokens, logits
        return cache_out, token_table, tokens
    T = x.shape[0]
    Hq, Hkv, D = cfg.n_qo_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms_norm(x, lw["input_norm"], cfg.rms_norm_eps)
    qkv = qmatmul(h, lw["qkv_proj"])
    if "qkv_bias" in lw:
        qkv = qkv + lw["qkv_bias"]
    q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
    q = apply_rotary_emb(q.reshape(T, Hq, D), cos, sin, cfg.rope_interleaved)
    k = apply_rotary_emb(k.reshape(T, Hkv, D), cos, sin, cfg.rope_interleaved)
    last_cache = _write_kv(last_cache, last_layer_id, batch, k,
                           v.reshape(T, Hkv, D), cfg)
    if cfg.attention_impl == "layered" and not isinstance(last_cache, jax.Ref):
        from ..ops.attention import paged_attention_layered
        attn, last_cache = paged_attention_layered(
            q, last_cache, last_layer_id, batch.attention, 1.0 / (D ** 0.5),
            k_scale=cfg.kv_scale, v_scale=cfg.kv_scale,
            interpret=jax.default_backend() != "tpu", return_cache=True)
    elif cfg.mesh is not None:
        from ..ops.attention import paged_attention_tp
        attn = paged_attention_tp(q, last_cache, last_layer_id, batch.attention,
                                  1.0 / (D ** 0.5), max_q, cfg.mesh,
                                  impl=cfg.attention_impl, kv_scale=cfg.kv_scale)
    else:
        attn = paged_attention(q, last_cache, last_layer_id, batch.attention,
                               1.0 / (D ** 0.5), max_q, impl=cfg.attention_impl,
                               kv_scale=cfg.kv_scale,
                               pages_per_block=cfg.kv_pages_per_block)
    if per_layer:
        cache = list(cache[:-1]) + [last_cache]
    else:
        cache = last_cache
    x = x + qmatmul(attn.reshape(T, Hq * D), lw["o_proj"])
    if spec > 0:
        # speculative verify: EVERY row's next-token matters, so the
        # discard is skipped and the head runs on all T rows (decode is
        # weight-read-bound — the extra rows are nearly free, which is the
        # whole speculative-decoding bet)
        h = rms_norm(x, lw["post_norm"], cfg.rms_norm_eps)
        x = x + _mlp(h, lw, cfg)
        token_table, tokens = _spec_verify_head(weights, x, batch, cfg,
                                                token_table, spec)
        return (None if is_ref else cache), token_table, tokens
    x = jnp.take(x, sample_idx, axis=0)                  # token discard
    h = rms_norm(x, lw["post_norm"], cfg.rms_norm_eps)
    x = x + _mlp(h, lw, cfg)

    token_table, tokens, logits = _final_head(weights, x, batch, cfg,
                                              token_table)
    cache_out = None if is_ref else cache
    if return_logits:
        return cache_out, token_table, tokens, logits
    return cache_out, token_table, tokens


def _spec_verify_head(weights, x, batch, cfg: DecoderConfig, token_table,
                      K1: int):
    """Verification head for n-gram speculative decoding.

    The batch is S uniform segments of K1 = 1 + K_draft rows: row 0 is the
    real next-token input, rows 1..K are host-proposed draft tokens
    (prompt-lookup). Acceptance runs on device
    (ops/sampling.py:spec_verify_tokens — exact argmax match for greedy
    rows, distribution-preserving rejection sampling for stochastic rows);
    the final token (the one the next step consumes) is written into the
    token table, and [emitted (S*K1) | acc (S)] is returned for host
    bookkeeping. Rejected rows' KV entries lie beyond the accepted kv_len
    and are simply overwritten later (paged slots are position-addressed)
    — no rollback."""
    from ..ops.sampling import spec_verify_tokens
    h = rms_norm(x, weights["norm"], cfg.rms_norm_eps)
    logits = qmatmul_f32(h, weights["lm_head"])
    S = batch.sample_dst_slots.shape[0]
    lg = logits[: S * K1].reshape(S, K1, -1)  # T is bucket-padded past S*K1
    ids = batch.token_ids[: S * K1].reshape(S, K1)  # drafts at cols 1..K
    draft_next = jnp.concatenate(
        [ids[:, 1:], jnp.zeros((S, 1), jnp.int32)], axis=1)
    dl = jnp.clip(batch.draft_lens, 0, K1 - 1)               # (S,)
    temps = getattr(batch, "temperatures", None)
    if temps is not None and temps.shape[0] > 0:
        emitted, acc = spec_verify_tokens(
            lg, draft_next, dl, temperature=temps, top_k=batch.top_ks,
            top_p=batch.top_ps, key=jax.random.key(batch.sample_seed[0]))
    else:
        emitted, acc = spec_verify_tokens(lg, draft_next, dl)
    final = emitted[jnp.arange(S), acc]
    dst = batch.sample_dst_slots
    dst = jnp.where(dst < 0, token_table.shape[0], dst)
    token_table = token_table.at[dst].set(final, mode="drop")
    return token_table, jnp.concatenate([emitted.reshape(-1), acc])


def _final_head(weights, x, batch, cfg: DecoderConfig, token_table):
    """Final norm → lm_head on the sampled rows → greedy/stochastic token →
    token-table scatter. Shared by the layer-loop forwards and the pipeline-
    parallel forward (parallel/pipeline.py)."""
    h = rms_norm(x, weights["norm"], cfg.rms_norm_eps)
    logits = qmatmul_f32(h, weights["lm_head"])
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # stochastic sampling path (compiled in only when the batch carries
    # sampling controls — dims.sampling is part of the jit key via shapes)
    temps = getattr(batch, "temperatures", None)
    if temps is not None and temps.shape[0] > 0:
        from ..ops.sampling import process_logits
        key = jax.random.key(batch.sample_seed[0])
        sampled = process_logits(
            logits, temperature=jnp.maximum(temps, 1e-6),
            top_k=batch.top_ks, top_p=batch.top_ps, key=key)
        tokens = jnp.where(temps > 0, sampled, tokens)

    dst = batch.sample_dst_slots
    dst = jnp.where(dst < 0, token_table.shape[0], dst)  # OOB positive drops
    token_table = token_table.at[dst].set(tokens, mode="drop")
    return token_table, tokens, logits
