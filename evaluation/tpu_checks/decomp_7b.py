"""Decompose the llava-7b-lm int8+int8KV step time (VERDICT r3 #2).

Co-resident A/B is impossible at 7B (two engines don't fit one v5e HBM), so
this fits the step-time model  step_ms = F + w + kv_slope * avg_ctx  from
single-engine runs in ONE process (tunnel drift is shared within a process;
ratios across configs in one run are meaningful, absolute numbers drift):

  - ctx sweep  (prompt 32 / 128 / 384 at b32): d(step)/d(ctx) = KV-read +
    attention cost per context token; the int8-KV ideal is
    256 KB/token/seq / 819 GB/s = 0.010 ms per avg-ctx token at b32.
  - batch sweep (b16 / b32 / b64 at prompt 128): weights+dispatch amortize,
    per-token costs don't.

Usage:  python -m evaluation.tpu_checks.decomp_7b [--arch llava-7b-lm]
"""
import argparse
import gc
import json

from bench import run_bench


def one(arch, n_requests, prompt_len, max_tokens=128, tag="", **kw):
    r = run_bench(arch, n_requests, prompt_len, max_tokens,
                  token_budget=2048, quantization="int8", kv_int8=True, **kw)
    d = r["detail"]
    # decode-phase step time: tbt is per-token-per-request = per step
    row = {"tag": tag, "b": n_requests, "prompt": prompt_len,
           "avg_ctx": prompt_len + max_tokens // 2,
           "tok_per_s": r["value"],
           "step_ms": round(d["p50_tbt_s"] * 1e3, 3),
           "p50_ttft_s": d["p50_ttft_s"],
           "vs_bf16_roofline": r["vs_baseline"],
           "roofline_at_dtype": d["roofline_at_weight_dtype_tokens_per_s"]}
    print(json.dumps(row), flush=True)
    gc.collect()
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llava-7b-lm")
    ap.add_argument("--sweep", default="ctx,batch")
    ap.add_argument("--multi-step", type=int, default=0)
    args = ap.parse_args()
    rows = []
    if "ctx" in args.sweep:
        for prompt in (32, 128, 384):
            rows.append(one(args.arch, 32, prompt,
                            multi_step=args.multi_step))
    if "batch" in args.sweep:
        for b in (16, 64):
            rows.append(one(args.arch, b, 128, multi_step=args.multi_step))
    if "bisect" in args.sweep:
        # sequential single-engine ablations in ONE process (co-resident 7B
        # engines OOM a v5e; within-process the tunnel drift is shared, so
        # these ratios are usable if large)
        rows.append(one(args.arch, 32, 128, tag="base"))
        rows.append(one(args.arch, 32, 128, tag="no-attn", bisect="no-attn"))
        rows.append(one(args.arch, 32, 128, tag="no-write",
                        bisect="no-write"))
    if "ppb" in args.sweep:
        # the upstream ragged kernel's untuned-MHA fallback is bkv=128 →
        # ONE flash block DMAs every padded page (MB=32 pages = 512 tokens)
        # per sequence regardless of kv_len — 2.7x read amplification at
        # ctx 192. Smaller pages-per-block lets the kv loop stop at kv_len.
        rows.append(one(args.arch, 32, 128, tag="ppb=auto(128)"))
        for ppb in (4, 8, 16):
            rows.append(one(args.arch, 32, 128, tag=f"ppb={ppb}",
                            kv_pages_per_block=ppb))
    if "cliff" in args.sweep:
        # the prompt-384 collapse: pool 8.4GB + weights 6.7GB ~ HBM edge.
        # Same workload with a SMALLER forced pool separates memory
        # pressure from context-length cost.
        rows.append(one(args.arch, 32, 384, tag="pool=auto(2048blk)"))
        rows.append(one(args.arch, 32, 384, tag="pool=1200blk",
                        kv_blocks=1200))
        rows.append(one(args.arch, 32, 256, tag="pool=auto", max_tokens=128))
    print(json.dumps({"arch": args.arch, "rows": rows}))


if __name__ == "__main__":
    main()
