"""Interleaved in-process engine A/B — the only trustworthy comparison on
the tunneled TPU.

Measured fact (round 2): engine throughput for an IDENTICAL config swings
±30% between process invocations (tunnel/relay drift) — e.g. a no-attention
ablation once measured 37% SLOWER than its own baseline when run minutes
apart. Within one process the drift is shared, so this harness builds every
variant's engine side by side and interleaves measurement rounds in
alternating order (A,B / B,A / ...), then reports per-round PAIRED ratios
vs the first variant — drift cancels in the pair, slope cancels in the
alternation.

Usage (chip):
  python -m evaluation.ab_bench --rounds 4 \
      "scan;layer_loop=scan" "unroll;layer_loop=unroll" \
      "unroll-noattn;layer_loop=unroll;bisect=no-attn"

Each variant: "label;key=value;...", keys: layer_loop, bisect, attn_impl,
quant, kv_int8, kv_blocks, kv_ref, multi_step, pallas_qmm. NOTE: pallas_qmm
is baked at engine WARMUP (trace time) — list such variants so the flag is
set before their first generate().
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/hydrainfer_jax_cache")

import argparse
import json
import statistics
import string
import time

import numpy as np


def parse_variant(spec: str) -> dict:
    parts = spec.split(";")
    v = {"label": parts[0], "layer_loop": "unroll", "bisect": "",
         "attn_impl": "auto", "quant": "none", "kv_int8": False,
         "kv_blocks": 0, "kv_ref": True, "multi_step": 1,
         "pallas_qmm": False, "block_size": 16, "kv_pages_per_block": 0,
         "pipeline": "batched", "depth": 2, "post_k": 4}
    for p in parts[1:]:
        k, _, val = p.partition("=")
        assert k in v, f"unknown variant key {k}"
        v[k] = (val.lower() in ("1", "true") if isinstance(v[k], bool)
                else type(v[k])(val))
    return v


def build_engine(arch, v, n_requests, prompt_len, max_tokens, token_budget):
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.ops.quant import set_pallas_qmm
    set_pallas_qmm(v["pallas_qmm"])  # baked into this engine's jit traces
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    factory = RandomWeightFactory(
        arch, quantization=v["quant"], kv_scale=0.05 if v["kv_int8"] else None,
        layer_loop=v["layer_loop"], attention_impl=v["attn_impl"],
        bisect=v["bisect"],
        kv_pages_per_block=v["kv_pages_per_block"] or None)
    bs = v["block_size"]
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(
            max_running_requests=n_requests, priority="prefill"),
        request_processor=RequestProcessorConfig(num_request_process_workers=1),
        kv_block_size=bs,
        n_kv_blocks=v["kv_blocks"] or max(
            256 * 16 // bs, 2 * n_requests * (prompt_len + max_tokens) // bs),
        n_image_blocks=1)
    cfg.kv_cache_ref = v["kv_ref"]
    cfg.multi_step_decode = v["multi_step"]
    cfg.pipeline_mode = v["pipeline"]
    cfg.async_pipeline_depth = v["depth"]
    cfg.postprocess_batch_steps = v["post_k"]
    cfg.boot_warmup = True   # converge jit keys at boot; round 0 stays clean
    cfg.model.dtype = "bf16"
    cfg.model.attention_impl = v["attn_impl"]
    if v["kv_int8"]:
        cfg.model.kv_cache_dtype = "int8"
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    engine.node.batch_scheduler.token_budget = token_budget
    return engine


def make_requests(n, prompt_len, max_tokens, tag):
    from hydrainfer_tpu.request import Request, SamplingParameters
    rng = np.random.default_rng(hash(tag) % 2**32)
    return [Request(
        request_id=f"{tag}{i}",
        prompt="".join(rng.choice(list(string.ascii_lowercase + " "),
                                  size=prompt_len)),
        sampling_params=SamplingParameters(max_tokens=max_tokens,
                                           ignore_eos=True))
        for i in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+", help='"label;key=value;..."')
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--n-requests", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    variants = [parse_variant(s) for s in args.variants]
    engines = []
    for v in variants:
        engines.append(build_engine(args.arch, v, args.n_requests,
                                    args.prompt_len, args.max_tokens,
                                    args.token_budget))
        # compile this variant's buckets before ANY timed run
        engines[-1].generate(make_requests(
            args.n_requests, args.prompt_len, args.max_tokens,
            f"w{v['label']}"), timeout_s=1800)
        print(f"# warmed {v['label']}", flush=True)

    tputs = {v["label"]: [] for v in variants}
    order = list(range(len(variants)))
    for r in range(args.rounds):
        for i in (order if r % 2 == 0 else order[::-1]):
            v = variants[i]
            reqs = make_requests(args.n_requests, args.prompt_len,
                                 args.max_tokens, f"r{r}v{i}")
            t0 = time.perf_counter()
            outs = engines[i].generate(reqs, timeout_s=1800)
            dt = time.perf_counter() - t0
            total = sum(len(o.output_token_ids) for o in outs)
            assert total == args.n_requests * args.max_tokens
            tputs[v["label"]].append(total / dt)
        line = {v["label"]: round(tputs[v["label"]][-1], 1) for v in variants}
        print(f"# round {r}: {json.dumps(line)}", flush=True)

    base = variants[0]["label"]
    report = {"arch": args.arch, "rounds": args.rounds,
              "n_requests": args.n_requests, "variants": {}}
    for v in variants:
        ts = tputs[v["label"]]
        ratios = [t / b for t, b in zip(ts, tputs[base])]
        report["variants"][v["label"]] = {
            "median_tokens_per_s": round(statistics.median(ts), 1),
            "paired_ratio_vs_" + base: round(
                statistics.geometric_mean(ratios), 4),
            "ratio_spread": [round(min(ratios), 3), round(max(ratios), 3)],
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
