"""Async load generator (reference: benchmark/benchmark.py:82-133).

Fires the dataset at an OpenAI-compatible server with configurable arrival
intervals, sweeps request rates, analyzes TTFT/TPOT/throughput/SLO
attainment, dumps JSON per rate.

Usage:
  python -m benchmark.benchmark --base-url http://127.0.0.1:8000 \
      --num-requests 64 --request-rates 1 2 4 8 --interval poisson \
      --output-dir result/
"""
import argparse
import asyncio
import dataclasses
import json
import os
import time

import aiohttp

from .backend import openai_chat_stream
from .metric import BenchmarkResult, slo_attainment
from .synthetic_dataset import load_entries_json, make_synthetic_entries
from .timestamp import get_intervals


async def run_benchmark(base_url: str, entries, request_rate: float,
                        interval_method: str, trace_path=None,
                        ignore_eos: bool = True) -> BenchmarkResult:
    intervals = get_intervals(interval_method, request_rate, trace_path)
    result = BenchmarkResult(request_rate=request_rate)
    connector = aiohttp.TCPConnector(limit=0)
    timeout = aiohttp.ClientTimeout(total=None, sock_read=600)
    async with aiohttp.ClientSession(connector=connector,
                                     timeout=timeout) as session:
        tasks = []
        result.start_time = time.perf_counter()
        for i, entry in enumerate(entries):
            tasks.append(asyncio.create_task(openai_chat_stream(
                session, base_url, entry, request_id=f"r{i}",
                ignore_eos=ignore_eos)))
            await asyncio.sleep(intervals[i])

        async def watchdog():
            # stall diagnostics: a wedged run names its pending requests
            while True:
                await asyncio.sleep(60)
                pending = [f"r{i}" for i, t in enumerate(tasks) if not t.done()]
                if pending:
                    print(f"# run_benchmark waiting on {len(pending)} "
                          f"request(s): {pending[:8]}", flush=True)

        dog = asyncio.create_task(watchdog())
        try:
            result.outputs = list(await asyncio.gather(*tasks))
        finally:
            dog.cancel()
        result.end_time = time.perf_counter()
    return result


async def amain(args) -> None:
    if args.dataset_json:
        entries = load_entries_json(args.dataset_json)[: args.num_requests]
    else:
        entries = make_synthetic_entries(
            args.num_requests, image_ratio=args.image_ratio,
            prompt_len_range=(args.min_prompt_len, args.max_prompt_len),
            output_len_range=(args.min_output_len, args.max_output_len),
            seed=args.seed)

    os.makedirs(args.output_dir, exist_ok=True)
    for rate in args.request_rates:
        result = await run_benchmark(args.base_url, entries, rate,
                                     args.interval, args.trace_path,
                                     ignore_eos=not args.respect_eos)
        analysis = result.analyze()
        analysis["slo"] = slo_attainment(result, args.ttft_slo, args.tpot_slo)
        analysis["outputs"] = [
            {k: v for k, v in dataclasses.asdict(o).items()
             if k not in ("output_text",)}
            for o in result.outputs] if args.dump_outputs else None
        path = os.path.join(args.output_dir, f"rate_{rate}.json")
        with open(path, "w") as f:
            json.dump(analysis, f, indent=2)
        brief = {k: analysis[k] for k in
                 ("request_rate", "n_success", "token_throughput")}
        brief["ttft_p90"] = analysis["ttft"]["p90"] if analysis["ttft"] else None
        brief["attainment"] = analysis["slo"]["attainment"]
        print(json.dumps(brief))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:8000")
    ap.add_argument("--num-requests", type=int, default=64)
    ap.add_argument("--request-rates", type=float, nargs="+", default=[4.0])
    ap.add_argument("--interval", default="poisson",
                    choices=["poisson", "uniform", "mooncake", "azure", "burstgpt"])
    ap.add_argument("--trace-path", default=None)
    ap.add_argument("--dataset-json", default=None)
    ap.add_argument("--image-ratio", type=float, default=0.0)
    ap.add_argument("--min-prompt-len", type=int, default=32)
    ap.add_argument("--max-prompt-len", type=int, default=256)
    ap.add_argument("--min-output-len", type=int, default=32)
    ap.add_argument("--max-output-len", type=int, default=256)
    ap.add_argument("--ttft-slo", type=float, default=5.0)
    ap.add_argument("--tpot-slo", type=float, default=0.4)
    ap.add_argument("--respect-eos", action="store_true")
    ap.add_argument("--dump-outputs", action="store_true")
    ap.add_argument("--output-dir", default="result")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
