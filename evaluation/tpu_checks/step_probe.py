"""Pure device step-time probe: how fast is ONE jitted decode step with the
host completely out of the way?

The engine measures ~15ms/step at b32 where the HBM roofline says 4.3ms;
this separates device program time from engine host overhead (builder,
scheduler, token reads) by dispatching the real model's jitted step K times
back-to-back — inputs vary through the device-resident token table (each
step consumes the previous step's sampled token), so nothing is elidable —
and timing enqueue→block_until_ready. Dispatches are separate XLA
executions: no cross-step fusion is possible, exactly like the engine's
dispatch pattern, minus the host work between steps.

    python evaluation/tpu_checks/step_probe.py --layer-loop unroll --steps 50
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--layer-loop", default="unroll", choices=["scan", "unroll"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv-blocks", type=int, default=1024)
    ap.add_argument("--kv-len", type=int, default=160)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--bisect", default="")
    ap.add_argument("--mode", default="fused", choices=["fused", "dispatch"])
    ap.add_argument("--quant", default="none",
                    choices=["none", "int8", "int4", "fp8"])
    ap.add_argument("--kv-int8", action="store_true")
    args = ap.parse_args()
    sys.path.insert(0, ".")

    from hydrainfer_tpu.memory.token_cache import (TokenCacheBlockManager,
                                                   TokenCacheBlockManagerConfig)
    from hydrainfer_tpu.models.factory import LanguageModelBatch
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    from hydrainfer_tpu.ops.attention import PagedAttentionParams

    factory = RandomWeightFactory(args.arch, layer_loop=args.layer_loop,
                                  bisect=args.bisect, quantization=args.quant,
                                  kv_scale=0.05 if args.kv_int8 else None)
    lm = factory.getLanguageModel()
    cfg = factory.cfg
    B, BS = args.batch, 16
    mb = (args.kv_len + BS) // BS + 1

    kv_cfg = TokenCacheBlockManagerConfig(
        n_layers=cfg.n_layers, n_tensors=1, n_blocks=args.kv_blocks,
        block_size=BS, n_heads=2 * cfg.n_kv_heads, head_dim=cfg.head_dim,
        dtype="int8" if args.kv_int8 else "bf16",
        per_layer=(args.layer_loop == "unroll"), use_ref=True)
    mgr = TokenCacheBlockManager(kv_cfg, jax.devices()[0], "probe")
    cache = mgr.cache_array

    # all-decode batch: seq s decodes its token at position kv_len-1+step
    rng = np.random.default_rng(0)
    tables = np.stack([np.arange(s * mb, (s + 1) * mb) % args.kv_blocks
                       for s in range(B)]).astype(np.int32)
    kv_lens = np.full(B, args.kv_len, np.int32)
    positions = kv_lens - 1
    slots = (tables[np.arange(B), positions // BS] * BS
             + positions % BS).astype(np.int32)
    batch = LanguageModelBatch(
        token_ids=jnp.asarray(rng.integers(0, cfg.vocab_size, B), jnp.int32),
        positions=jnp.asarray(positions),
        image_features=jnp.zeros((0, cfg.hidden_size), jnp.bfloat16),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.arange(B, dtype=jnp.int32),
            q_local_ids=jnp.zeros(B, jnp.int32),
            positions=jnp.asarray(positions),
            kv_lens=jnp.asarray(kv_lens),
            block_tables=jnp.asarray(tables),
            new_kv_slot_ids=jnp.asarray(slots),
            cu_q_lens=jnp.asarray(np.arange(B + 1, dtype=np.int32)),
            num_seqs=jnp.asarray([B], jnp.int32)),
        sample_token_idx=jnp.arange(B, dtype=jnp.int32),
        # feedback loop: every step reads its tokens from the table the
        # previous step wrote — data-dependent, nothing elidable
        token_src_slots=jnp.arange(B, dtype=jnp.int32),
        sample_dst_slots=jnp.arange(B, dtype=jnp.int32),
    )
    token_table = jnp.zeros((4096,), jnp.int32)

    import functools

    from hydrainfer_tpu.models.decoder import decoder_forward

    # Two probe modes:
    #  dispatch — one XLA execution per step from a tight Python loop. On
    #    the axon tunnel each enqueue chains on the previous step's output
    #    handles, so this measures the dispatch round-trip chain (what the
    #    engine pays when its pipeline can't run ahead), NOT device time —
    #    measured 46ms/step (scan, ~45 args) to 105ms/step (unroll, ~230
    #    args): it scales with the ARG COUNT of the executable.
    #  fused — lax.scan over K steps INSIDE one jit: one dispatch, K real
    #    data-dependent steps; per-step time is true device program time.
    if args.mode == "fused":
        assert kv_cfg.use_ref, "fused probe needs the in-place Ref cache"

        # weights/batch/rope as ARGUMENTS — a closure would bake 3.5GB of
        # weights into the executable as captured constants
        @functools.partial(jax.jit, static_argnames=("k",),
                           donate_argnames=("token_table",))
        def run_k(weights, cache, batch, cos, sin, token_table, k):
            def body(tt, _):
                _, tt, tokens = decoder_forward(
                    weights, cache, batch, cos, sin, cfg,
                    max_q=1, token_table=tt)
                return tt, tokens[0]
            tt, toks = jax.lax.scan(body, token_table, None, length=k)
            return tt, toks

        # warm with the SAME k: k is a static argname, so a different value
        # would recompile inside the timed region
        token_table, toks = run_k(lm.weights, cache, batch, lm.cos_tab,
                                  lm.sin_tab, token_table, k=args.steps)
        toks.block_until_ready()
        t0 = time.perf_counter()
        token_table, toks = run_k(lm.weights, cache, batch, lm.cos_tab,
                                  lm.sin_tab, token_table, k=args.steps)
        toks.block_until_ready()
        dt = time.perf_counter() - t0
    else:
        jit_step = jax.jit(functools.partial(decoder_forward, cfg=cfg),
                           static_argnames=("max_q",),
                           donate_argnames=("token_table",))

        def step(cache, token_table):
            # (cache_out|None-for-refs, token_table, tokens)
            return jit_step(lm.weights, cache, batch, lm.cos_tab, lm.sin_tab,
                            max_q=1, token_table=token_table)

        _, token_table, tokens = step(cache, token_table)   # compile
        tokens.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.steps):
            cache_out, token_table, tokens = step(cache, token_table)
            if cache_out is not None:
                cache = cache_out
        tokens.block_until_ready()
        dt = time.perf_counter() - t0

    per_step_ms = dt / args.steps * 1e3
    print(f"mode={args.mode} layer_loop={args.layer_loop} "
          f"bisect='{args.bisect}' b{B} kv{args.kv_len} "
          f"blocks{args.kv_blocks}: {per_step_ms:.2f} ms/step "
          f"({B / (dt / args.steps):.0f} tok/s)")


if __name__ == "__main__":
    main()
