"""Pipeline parallelism: layer stages over a 'pp' mesh axis.

The reference exposes a pp_size config knob but never implements pipeline
parallelism (reference: hydrainfer/cluster/cluster.py parallel config — knob
only, no stage runtime). Here PP runs in the serving path, the TPU-native
way: the per-layer weight stacks and the paged KV cache shard their LAYER
axis over the 'pp' mesh axis (each chip holds L/P contiguous layers' weights
and pages — the memory-capacity use case PP exists for), and one shard_map
program relays activations stage-to-stage with `lax.ppermute` over the ICI
ring. Each device runs only its own stage's compute (a `lax.cond` on
`axis_index('pp')` keeps off-turn devices idle rather than computing
garbage).

Utilization note: one program relays a single batch through P stages, so a
single in-flight batch keeps 1/P of the machine busy (the classic pipeline
bubble with M=1 microbatches). Filling the bubble is a scheduling concern —
the engine's async dispatch pipeline can keep P independent batches in
flight — not a model-forward concern; the forward is bubble-agnostic.

Composition: PP shards the LAYER axis; v1 is pp × dp (no tp inside stages).
"""
from typing import List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.decoder import (DecoderConfig, _final_head, _layer_body)
from ..models.factory import LanguageModelBatch
from ..ops.attention import PagedAttentionParams


def pp_pack_weights(weights: dict, pp: int) -> dict:
    """Checkpoint layout {"layers": [L per-layer dicts], embed, norm,
    lm_head} → {"stack": {key: (L, ...) stacked}, embed, norm, lm_head}.
    All L layers must share one weight signature (uniform decoders; MoE
    mixed-signature stacks are not PP-v1 material)."""
    layers = weights["layers"]
    L = len(layers)
    assert L % pp == 0, f"{L} layers not divisible into {pp} stages"
    sig = tuple(sorted(k for k, v in layers[0].items() if v is not None))
    for lw in layers:
        assert tuple(sorted(k for k, v in lw.items() if v is not None)) == sig, \
            "pipeline stages need a uniform layer signature"
    stack = {
        k: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *[lw[k] for lw in layers])
        for k in sig}
    return {"embed": weights["embed"], "norm": weights["norm"],
            "lm_head": weights["lm_head"], "stack": stack}


def _layer_axis_spec(x):
    return P(*(("pp",) + (None,) * (x.ndim - 1)))


# ---- TP inside stages (PP v2) ----
#
# Under shard_map the stage runs MANUAL SPMD: each tp shard must hold its
# own q/k/v (and gate/up) head columns CONTIGUOUSLY, so the packed
# projections are column-permuted from [q|k|v] global layout to
# [q_0|k_0|v_0 | q_1|k_1|v_1 | ...] before contiguous 'tp' sharding — the
# GSPMD TP path (parallel/mesh.py) doesn't need this because XLA partitions
# the LOGICAL concat axis, but shard_map hands the raw local slice to the
# layer body.

def _tp_permute_cols(arr, tp: int, sizes):
    """Permute the LAST axis of a packed projection (stacked or not) so
    contiguous tp shards each hold [seg0_s | seg1_s | ...]."""
    bounds = []
    acc = 0
    for s in sizes[:-1]:
        acc += s
        bounds.append(acc)
    parts = jnp.split(arr, bounds, axis=-1)
    out = []
    for s in range(tp):
        for p, size in zip(parts, sizes):
            w = size // tp
            out.append(jax.lax.slice_in_dim(p, s * w, (s + 1) * w, axis=-1))
    return jnp.concatenate(out, axis=-1)


def _stack_spec(key: str, x, tp: int):
    """PartitionSpec for one stacked stage weight: layer axis on 'pp',
    plus megatron TP on 'tp' (column-parallel qkv/gate_up, row-parallel
    o_proj/down) when tp > 1."""
    if tp > 1:
        if key in ("qkv_proj", "gate_up"):
            return P(*(("pp",) + (None,) * (x.ndim - 2) + ("tp",)))
        if key == "qkv_bias":
            return P("pp", "tp")
        if key in ("o_proj", "down"):
            return P(*(("pp", "tp") + (None,) * (x.ndim - 2)))
    return _layer_axis_spec(x)


def pp_tp_pack_weights(weights: dict, pp: int, tp: int,
                       cfg: DecoderConfig) -> dict:
    """pp_pack_weights + the TP column permutation of packed projections.
    bf16/f32 weights only (quantized (w, scale) stacks would need their
    scale columns permuted in lockstep — not implemented)."""
    wpp = pp_pack_weights(weights, pp)
    if tp <= 1:
        return wpp
    D, Hq, Hkv = cfg.head_dim, cfg.n_qo_heads, cfg.n_kv_heads
    assert Hq % tp == 0 and Hkv % tp == 0, (Hq, Hkv, tp)
    st = dict(wpp["stack"])
    # every tp-sharded stack key must be guarded: _stack_spec would shard a
    # quantized (w, scale) tuple's scale leaf with the weight's spec,
    # silently mis-sharding it (o_proj/down row shards included)
    for k in ("qkv_proj", "qkv_bias", "gate_up", "o_proj", "down"):
        if k in st and not isinstance(st[k], jax.Array):
            raise NotImplementedError(
                f"TP-in-stage with quantized {k} (w, scale) stacks")
    st["qkv_proj"] = _tp_permute_cols(st["qkv_proj"], tp,
                                      [Hq * D, Hkv * D, Hkv * D])
    if "qkv_bias" in st:
        st["qkv_bias"] = _tp_permute_cols(st["qkv_bias"], tp,
                                          [Hq * D, Hkv * D, Hkv * D])
    half = st["gate_up"].shape[-1] // 2
    st["gate_up"] = _tp_permute_cols(st["gate_up"], tp, [half, half])
    return {**wpp, "stack": st}


def pp_shard_weights(weights_pp: dict, mesh: Mesh) -> dict:
    """Layer stacks sharded on 'pp' (stage s holds its L/P layer slices),
    plus megatron 'tp' inside the stage when the mesh has one;
    embed/norm/lm_head replicated."""
    rep = NamedSharding(mesh, P())
    tp = mesh.shape.get("tp", 1)

    def stage_put(key, x):
        return jax.device_put(x, NamedSharding(mesh, _stack_spec(key, x, tp)))

    return {
        "embed": jax.device_put(weights_pp["embed"], rep),
        "norm": jax.device_put(weights_pp["norm"], rep),
        "lm_head": jax.device_put(weights_pp["lm_head"], rep),
        "stack": {k: jax.tree_util.tree_map(
            lambda x, k=k: stage_put(k, x), v)
            for k, v in weights_pp["stack"].items()},
    }


def _cache_spec(cache, mesh: Mesh):
    tp = mesh.shape.get("tp", 1)
    if tp > 1:
        # (L, n_tensors, nb, bs, COMBINED_HEADS, d): layers on 'pp',
        # kv heads on 'tp' — each device holds its stage's layers AND its
        # head shard of their pages
        return P("pp", None, None, None, "tp", None)
    return _layer_axis_spec(cache)


def pp_shard_cache(cache: jax.Array, mesh: Mesh) -> jax.Array:
    """(L, n_tensors, nb, bs, h, d) paged cache with the layer axis sharded
    over 'pp' (and kv heads over 'tp' when the mesh has one)."""
    return jax.device_put(
        cache, NamedSharding(mesh, _cache_spec(cache, mesh)))


def decoder_forward_pp(weights_pp: dict, cache: jax.Array,
                       batch: LanguageModelBatch, cos_tab, sin_tab,
                       cfg: DecoderConfig, max_q: int, token_table: jax.Array,
                       mesh: Mesh):
    """One fill step through the stage pipeline. Returns
    (cache, token_table, tokens) — value-mode cache (layer-sharded).

    Differences vs decoder_forward: the last layer runs inside its stage
    like any other (no token-discard before its MLP — the discard is a
    FLOP nicety, not a correctness requirement); the final norm + lm_head
    run replicated on every device after the relay."""
    pp = mesh.shape["pp"]
    from jax import shard_map

    if cfg.mrope_section and getattr(batch, "positions_hw", None) is not None:
        # M-RoPE composes with pp for free: the section-combined cos/sin
        # gather happens per token BEFORE the stage relay
        from ..ops.rope import mrope_gather
        cos, sin = mrope_gather(cos_tab, sin_tab, batch.positions,
                                batch.positions_hw[0], batch.positions_hw[1],
                                cfg.mrope_section)
    else:
        cos = jnp.take(cos_tab, batch.positions, axis=0)
        sin = jnp.take(sin_tab, batch.positions, axis=0)
    # stage-local attention must not re-enter the tp shard_map path; with
    # TP inside the stage the cfg's head counts become the LOCAL shard
    # counts and o_proj/down psum over 'tp' (models/decoder.py)
    import dataclasses
    tp = mesh.shape.get("tp", 1)
    cfg_local = dataclasses.replace(
        cfg, mesh=None,
        n_qo_heads=cfg.n_qo_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
        tp_reduce_axis="tp" if tp > 1 else None)

    def local(stack, cache, batch, tt, embed, norm, lm_head, cos, sin):
        sid = jax.lax.axis_index("pp")          # stack/cache: (L/P, ...)

        token_ids = batch.token_ids
        src = batch.token_src_slots
        token_ids = jnp.where(
            src >= 0, jnp.take(tt, jnp.maximum(src, 0), axis=0), token_ids)
        x = jnp.take(embed, token_ids, axis=0)
        if batch.image_features is not None and batch.image_features.shape[0]:
            dst = jnp.where(batch.image_dst_idx < 0, x.shape[0],
                            batch.image_dst_idx)
            x = x.at[dst].set(batch.image_features.astype(x.dtype),
                              mode="drop")

        Lp = cache.shape[0]
        layer_ids = jnp.arange(Lp, dtype=jnp.int32)

        def run_stage(x, cache):
            def scan_step(carry, inp):
                x, c = carry
                lid, lw = inp
                x, c = _layer_body(x, c, lid, lw, batch, cos, sin,
                                   cfg_local, max_q)
                return (x, c), None
            (x, cache), _ = jax.lax.scan(scan_step, (x, cache),
                                         (layer_ids, stack))
            return x, cache

        for s in range(pp):
            # only the on-turn stage computes; everyone else idles the tick
            x, cache = jax.lax.cond(
                sid == s, run_stage, lambda x, c: (x, c), x, cache)
            x = jax.lax.ppermute(
                x, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        # after P relays the final activations have wrapped to device 0;
        # broadcast them so the (replicated) head runs everywhere
        x = jax.lax.psum(jnp.where(sid == 0, x, jnp.zeros_like(x)), "pp")

        sample_idx = jnp.maximum(batch.sample_token_idx, 0)
        x = jnp.take(x, sample_idx, axis=0)
        head_w = {"norm": norm, "lm_head": lm_head}
        tt, tokens, _ = _final_head(head_w, x, batch, cfg_local, tt)
        return cache, tt, tokens

    rep = jax.tree_util.tree_map(lambda _: P(), batch)
    stack_specs = {k: jax.tree_util.tree_map(
        lambda x, k=k: _stack_spec(k, x, tp), v)
        for k, v in weights_pp["stack"].items()}
    cache_spec = _cache_spec(cache, mesh)
    out = shard_map(
        local, mesh=mesh,
        in_specs=(stack_specs, cache_spec, rep, P(), P(), P(), P(), P(), P()),
        out_specs=(cache_spec, P(), P()),
        check_vma=False,
    )(weights_pp["stack"], cache, batch, token_table,
      weights_pp["embed"], weights_pp["norm"], weights_pp["lm_head"],
      cos, sin)
    return out


# backward-compatible alias used by tests/dryrun that shard in one call
def pp_shard(weights_pp: dict, cache, mesh: Mesh):
    return pp_shard_weights(weights_pp, mesh), pp_shard_cache(cache, mesh)


def decoder_forward_pp_decode(weights_pp: dict, cache: jax.Array,
                              batch: LanguageModelBatch, cos_tab, sin_tab,
                              cfg: DecoderConfig, token_table: jax.Array,
                              mesh: Mesh, n_micro: int):
    """Microbatched pipeline step for PURE single-token-decode batches —
    the GPipe schedule that fills the relay's bubble.

    The batch's S padded sequences (token row t belongs to seq t — the
    builder packs decode fills in seq order) split into n_micro microbatches
    of S/n_micro consecutive rows, each an independent attention problem.
    Tick t has stage s working on microbatch t-s: every stage is busy once
    the pipe fills, so a step costs n_micro+P-1 stage-ticks instead of the
    relay's n_micro*P — utilization M/(M+P-1) vs 1/P. Activations ppermute
    along the ring; the last stage deposits each microbatch's output in a
    replicated buffer (psum-combined at the end) for the shared head."""
    pp = mesh.shape["pp"]
    from jax import shard_map

    a = batch.attention
    S = a.kv_lens.shape[0]
    assert S % n_micro == 0, (S, n_micro)
    Sm = S // n_micro

    if cfg.mrope_section and getattr(batch, "positions_hw", None) is not None:
        from ..ops.rope import mrope_gather
        cos_all, sin_all = mrope_gather(
            cos_tab, sin_tab, batch.positions, batch.positions_hw[0],
            batch.positions_hw[1], cfg.mrope_section)
    else:
        cos_all = jnp.take(cos_tab, batch.positions, axis=0)
        sin_all = jnp.take(sin_tab, batch.positions, axis=0)

    import dataclasses
    tp = mesh.shape.get("tp", 1)
    cfg_local = dataclasses.replace(
        cfg, mesh=None,
        n_qo_heads=cfg.n_qo_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
        tp_reduce_axis="tp" if tp > 1 else None)

    def local(stack, cache, batch, tt, embed, norm, lm_head, cos_all, sin_all):
        sid = jax.lax.axis_index("pp")
        a = batch.attention

        token_ids = batch.token_ids
        src = batch.token_src_slots
        token_ids = jnp.where(
            src >= 0, jnp.take(tt, jnp.maximum(src, 0), axis=0), token_ids)
        x_all = jnp.take(embed, token_ids[:S], axis=0)     # (S, hidden)

        Lp = cache.shape[0]
        layer_ids = jnp.arange(Lp, dtype=jnp.int32)

        def micro_geometry(m):
            """The m-th microbatch's attention problem (rows [m*Sm, ...))."""
            row0 = m * Sm
            sl = lambda v: jax.lax.dynamic_slice_in_dim(v, row0, Sm)
            kv = sl(a.kv_lens)
            valid = kv > 0
            q_seq = jnp.where(valid, jnp.arange(Sm, dtype=jnp.int32), -1)
            n = jnp.sum(valid.astype(jnp.int32))
            cu = jnp.minimum(jnp.arange(Sm + 1, dtype=jnp.int32), n)
            return PagedAttentionParams(
                q_seq_ids=q_seq,
                q_local_ids=jnp.zeros((Sm,), jnp.int32),
                positions=sl(a.positions[:S]),
                kv_lens=kv,
                block_tables=jax.lax.dynamic_slice_in_dim(
                    a.block_tables, row0, Sm, axis=0),
                new_kv_slot_ids=sl(a.new_kv_slot_ids[:S]),
                cu_q_lens=cu,
                num_seqs=n.reshape(1))

        def run_stage(x, cache, m):
            attn = micro_geometry(m)
            row0 = m * Sm
            mb = dataclasses.replace(
                batch,
                token_ids=jnp.zeros((Sm,), jnp.int32),
                positions=jax.lax.dynamic_slice_in_dim(
                    batch.positions[:S], row0, Sm),
                attention=attn,
                image_features=jnp.zeros((0, x.shape[-1]), x.dtype),
                image_dst_idx=jnp.zeros((0,), jnp.int32),
                sample_token_idx=jnp.arange(Sm, dtype=jnp.int32),
                token_src_slots=jnp.full((Sm,), -1, jnp.int32),
                sample_dst_slots=jnp.full((Sm,), -1, jnp.int32))
            cos = jax.lax.dynamic_slice_in_dim(cos_all[:S], row0, Sm)
            sin = jax.lax.dynamic_slice_in_dim(sin_all[:S], row0, Sm)

            def scan_step(carry, inp):
                x, c = carry
                lid, lw = inp
                x, c = _layer_body(x, c, lid, lw, mb, cos, sin,
                                   cfg_local, max_q=1)
                return (x, c), None
            (x, cache), _ = jax.lax.scan(scan_step, (x, cache),
                                         (layer_ids, stack))
            return x, cache

        out = jnp.zeros((S, x_all.shape[-1]), x_all.dtype)
        xcur = jnp.zeros((Sm, x_all.shape[-1]), x_all.dtype)
        for t in range(n_micro + pp - 1):
            idx = t - sid
            m = jnp.clip(idx, 0, n_micro - 1)
            x_in = jnp.where(sid == 0,
                             jax.lax.dynamic_slice_in_dim(x_all, m * Sm, Sm),
                             xcur)
            active = (idx >= 0) & (idx < n_micro)
            y, cache = jax.lax.cond(
                active, run_stage, lambda x, c, _m: (x, c), x_in, cache, m)
            # the last stage deposits its finished microbatch
            deposit = active & (sid == pp - 1)
            out = jax.lax.cond(
                deposit,
                lambda o: jax.lax.dynamic_update_slice_in_dim(
                    o, y, m * Sm, axis=0),
                lambda o: o, out)
            xcur = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        # out is only filled on the last stage; broadcast it
        out = jax.lax.psum(
            jnp.where(sid == pp - 1, out, jnp.zeros_like(out)), "pp")

        sample_idx = jnp.maximum(batch.sample_token_idx, 0)
        x = jnp.take(out, sample_idx, axis=0)
        head_w = {"norm": norm, "lm_head": lm_head}
        tt, tokens, _ = _final_head(head_w, x, batch, cfg_local, tt)
        return cache, tt, tokens

    rep = jax.tree_util.tree_map(lambda _: P(), batch)
    stack_specs = {k: jax.tree_util.tree_map(
        lambda x, k=k: _stack_spec(k, x, tp), v)
        for k, v in weights_pp["stack"].items()}
    cache_spec = _cache_spec(cache, mesh)
    return shard_map(
        local, mesh=mesh,
        in_specs=(stack_specs, cache_spec, rep, P(), P(), P(), P(), P(), P()),
        out_specs=(cache_spec, P(), P()),
        check_vma=False,
    )(weights_pp["stack"], cache, batch, token_table,
      weights_pp["embed"], weights_pp["norm"], weights_pp["lm_head"],
      cos_all, sin_all)
