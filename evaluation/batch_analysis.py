"""Batch-size analysis + analytic roofline latency model.

Replaces the reference's evaluation/batch_analysis/batch_analysis.py:19-155
(step latency/throughput vs batch size) and
evaluation/latency_model/compute_intensity.py (bytes/FLOPs roofline model)
with the TPU equivalents. The measured sweep runs the REAL engine
(scheduler + executor + jitted step) because microbenchmarks are not
trustworthy over this TPU tunnel; the analytic model predicts the
HBM-bound decode step time from the architecture, giving the
measured-vs-roofline gap per batch size.

Usage (chip):  python -m evaluation.batch_analysis --batches 1 8 32 64
        (CPU): python -m evaluation.batch_analysis --tiny --platform cpu
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/hydrainfer_jax_cache")

import argparse
import json
import time

import numpy as np

V5E_HBM_BW = 819e9       # bytes/s
V5E_BF16_FLOPS = 197e12  # MXU peak


def analytic_decode_model(cfg, batch: int, kv_len: int, weight_bytes: int,
                          kv_dtype_bytes: int = 2):
    """HBM roofline for one decode step: every weight byte is read once per
    step (batch-shared), each sequence reads its own KV prefix. FLOPs =
    2 * params * batch (matmuls) — compute intensity tells which bound wins
    (reference: evaluation/latency_model/compute_intensity.py)."""
    kv_bytes_per_seq = (cfg.n_layers * 2 * cfg.n_kv_heads * cfg.head_dim
                        * kv_len * kv_dtype_bytes)
    bytes_total = weight_bytes + batch * kv_bytes_per_seq
    params = weight_bytes / 2  # bf16
    flops = 2 * params * batch
    t_mem = bytes_total / V5E_HBM_BW
    t_compute = flops / V5E_BF16_FLOPS
    return {
        "t_mem_ms": round(t_mem * 1e3, 3),
        "t_compute_ms": round(t_compute * 1e3, 3),
        "bound": "memory" if t_mem > t_compute else "compute",
        "compute_intensity": round(flops / bytes_total, 1),
        "roofline_step_ms": round(max(t_mem, t_compute) * 1e3, 3),
        "roofline_tokens_per_s": round(batch / max(t_mem, t_compute), 1),
    }


def measured_sweep(arch: str, batches, prompt_len: int, gen: int):
    import bench  # repo-root bench.py: the trustworthy engine harness
    rows = []
    for b in batches:
        r = bench.run_bench(arch, b, prompt_len, gen,
                            token_budget=max(2048, prompt_len * 2))
        rows.append({"batch": b, "tokens_per_s": r["value"],
                     "vs_roofline": r["vs_baseline"],
                     "p50_tbt_s": r["detail"]["p50_tbt_s"]})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32, 64])
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--model-only", action="store_true",
                    help="print only the analytic model (no engine runs)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.tiny:
        args.batches, args.prompt_len, args.gen = [1, 4], 16, 8

    from hydrainfer_tpu.models.random_init import ARCH_CONFIGS
    cfg = ARCH_CONFIGS[args.arch]
    # weight bytes from the architecture (2 bytes/param bf16) — no need to
    # materialize the model for the analytic table
    per_layer = (cfg.hidden_size * (cfg.n_qo_heads + 2 * cfg.n_kv_heads)
                 * cfg.head_dim                        # qkv
                 + cfg.n_qo_heads * cfg.head_dim * cfg.hidden_size   # o
                 + 3 * cfg.hidden_size * cfg.intermediate_size)      # mlp
    embed = cfg.vocab_size * cfg.hidden_size
    params = cfg.n_layers * per_layer + embed * (1 if cfg.tie_word_embeddings
                                                 else 2)
    weight_bytes = 2 * params

    rows = None
    if not args.model_only:
        rows = measured_sweep(args.arch, args.batches, args.prompt_len,
                              args.gen)
    analytic = {}
    for b in args.batches:
        analytic[b] = analytic_decode_model(
            cfg, b, args.prompt_len + args.gen // 2, weight_bytes)

    print(f"# Batch analysis — {args.arch} "
          f"(prompt {args.prompt_len}, gen {args.gen})\n")
    print("| batch | roofline tok/s | bound | intensity (flops/B) |"
          + (" measured tok/s | vs roofline | p50 tbt |" if rows else ""))
    print("|---|---|---|---|" + ("---|---|---|" if rows else ""))
    for i, b in enumerate(args.batches):
        a = analytic[b]
        line = (f"| {b} | {a['roofline_tokens_per_s']} | {a['bound']} "
                f"| {a['compute_intensity']} |")
        if rows:
            m = rows[i]
            line += (f" {m['tokens_per_s']} | {m['vs_roofline']} "
                     f"| {m['p50_tbt_s']}s |")
        print(line)
    print("\nDecode stays memory-bound until compute intensity reaches "
          f"~{int(V5E_BF16_FLOPS / V5E_HBM_BW)} flops/byte (v5e ridge "
          "point) — batching decode is free throughput until then, which "
          "is why the decode node wants the biggest batch the KV pool "
          "allows (reference: evaluation/batch_analysis).")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"arch": args.arch, "analytic": analytic,
                       "measured": rows}, f, indent=1)


if __name__ == "__main__":
    main()
