"""On-chip check of the builder decode-MHA kernel vs the upstream ragged
kernel: numeric agreement + per-call latency at the llava-7b decode shape.

    python -m evaluation.tpu_checks.mha_decode_check [--kv-dtype int8]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from hydrainfer_tpu.ops.attention import (PagedAttentionParams,
                                          paged_attention_mha_decode,
                                          paged_attention_ragged)


def build(rng, S, H, D, BS, ctx, n_blocks, q_dtype, kv_dtype, spread=32):
    mb = -(-(ctx + spread) // BS)
    kv_lens = rng.integers(ctx - spread, ctx + spread, S).astype(np.int32)
    tables = np.stack([
        rng.permutation(n_blocks)[:mb] for _ in range(S)]).astype(np.int32)
    q = (rng.standard_normal((S, H, D)) * 0.3).astype(q_dtype)
    if kv_dtype == np.int8:
        cache = rng.integers(-100, 100,
                             (1, 1, n_blocks, BS, 2 * H, D)).astype(np.int8)
    else:
        cache = (rng.standard_normal((1, 1, n_blocks, BS, 2 * H, D))
                 * 0.3).astype(kv_dtype)
    params = PagedAttentionParams(
        q_seq_ids=jnp.arange(S, dtype=jnp.int32),
        q_local_ids=jnp.zeros(S, jnp.int32),
        positions=jnp.asarray(kv_lens - 1),
        kv_lens=jnp.asarray(kv_lens),
        block_tables=jnp.asarray(tables),
        new_kv_slot_ids=jnp.full((S,), -1, jnp.int32),
        cu_q_lens=jnp.arange(S + 1, dtype=jnp.int32),
        num_seqs=jnp.asarray([S], jnp.int32))
    return jnp.asarray(q), jnp.asarray(cache), params


def timeit(fn, *args, n=50, **kw):
    out = fn(*args, **kw)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    out.block_until_ready()
    return out, (time.perf_counter() - t0) / n * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=192)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--ppb", type=int, default=0)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    kv_dtype = np.int8 if args.kv_dtype == "int8" else jnp.bfloat16
    scale = 0.05 if args.kv_dtype == "int8" else None
    S, H, D, BS = args.batch, args.heads, 128, 16
    q, cache, params = build(rng, S, H, D, BS, args.ctx, 1024,
                             jnp.bfloat16, kv_dtype)
    sm = 1.0 / float(np.sqrt(D))

    ref, t_ref = timeit(
        lambda: paged_attention_ragged(q, cache, 0, params, sm,
                                       k_scale=scale, v_scale=scale))
    new, t_new = timeit(
        lambda: paged_attention_mha_decode(q, cache, 0, params, sm,
                                           kv_scale=scale,
                                           pages_per_block=args.ppb or None))
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - new.astype(jnp.float32))))
    print(f"b{S} H{H} ctx~{args.ctx} kv={args.kv_dtype}: "
          f"upstream {t_ref:.0f} us/call, mha_decode {t_new:.0f} us/call "
          f"({t_ref / t_new:.2f}x), max_abs_err {err:.4f}")
    assert err < (0.05 if args.kv_dtype == "int8" else 0.05), err


if __name__ == "__main__":
    main()
