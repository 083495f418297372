"""Speculative-decoding latency A/B: low-batch greedy generation over
repetitive (lookup-friendly) prompts, spec on vs off, interleaved in one
process (separate-process A/B is meaningless on the tunnel — see
PERF_NOTES). Reports tokens/s and per-request wall time.

Usage (chip):  python -m evaluation.spec_bench --arch qwen2-vl-2b-lm
        (CPU): python -m evaluation.spec_bench --tiny --platform cpu
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/hydrainfer_jax_cache")

import argparse
import json
import time


def build_engine(arch, spec_k, n_ctx):
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    factory = RandomWeightFactory(arch, layer_loop="unroll")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8,
                                             priority="prefill"),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1),
        kv_block_size=16, n_kv_blocks=max(512, n_ctx // 4),
        n_image_blocks=1)
    cfg.model.dtype = "bf16"
    cfg.spec_ngram_k = spec_k
    return OfflineEngine(cfg, model_factory=factory, node_type="PD")


def make_requests(n, prompt, max_tokens, tag):
    from hydrainfer_tpu.request import Request, SamplingParameters
    return [Request(request_id=f"{tag}{i}", prompt=prompt,
                    sampling_params=SamplingParameters(
                        max_tokens=max_tokens, ignore_eos=True))
            for i in range(n)]


def bench(engine, n, prompt, max_tokens, tag):
    engine.generate(make_requests(n, prompt, max_tokens, tag + "w"),
                    timeout_s=1200)                       # warm compiles
    t0 = time.perf_counter()
    outs = engine.generate(make_requests(n, prompt, max_tokens, tag),
                           timeout_s=1200)
    dt = time.perf_counter() - t0
    total = sum(len(o.output_token_ids) for o in outs)
    return total / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--max-tokens", type=int, default=96)
    ap.add_argument("--spec-k", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        args.arch, args.max_tokens, args.rounds = "tiny-lm", 24, 2

    # a summarization/copy-shaped prompt: strongly lookup-friendly
    prompt = ("the quarterly report shows revenue of the quarterly report "
              "shows revenue of the division and the quarterly report ") * 3

    base = build_engine(args.arch, 0, len(prompt) + args.max_tokens)
    spec = build_engine(args.arch, args.spec_k, len(prompt) + args.max_tokens)
    rows = []
    for r in range(args.rounds):
        t_base, _ = bench(base, args.batch, prompt, args.max_tokens, f"b{r}")
        t_spec, _ = bench(spec, args.batch, prompt, args.max_tokens, f"s{r}")
        rows.append((t_base, t_spec))
        print(f"# round {r}: base {t_base:.1f} tok/s, "
              f"spec {t_spec:.1f} tok/s ({t_spec / t_base:.2f}x)")
    med = sorted(rows, key=lambda x: x[1] / x[0])[len(rows) // 2]
    print(json.dumps({
        "arch": args.arch, "batch": args.batch, "spec_k": args.spec_k,
        "base_tokens_per_s": round(med[0], 1),
        "spec_tokens_per_s": round(med[1], 1),
        "speedup": round(med[1] / med[0], 3)}))


if __name__ == "__main__":
    main()
