"""Disaggregation method sweep through the PROCESS cluster (CPU).

Drives one representative layout per family — epd (colocated), ep_d,
ed_p, e_p_d (reference: evaluation/slo_attainment/generate_methods.py:25-80)
— end-to-end: real OS-process nodes (spawned by ProcessCluster), a real
tiny model (random weights + tiny ViT via the random:<arch>+mm factory),
mixed text/image requests, cache migration at every stage boundary.

Reports, per method: completion, wall time, token throughput, per-request
greedy tokens (cross-method equality = the correctness signal: the same
weights must produce the same tokens no matter how the pipeline is cut),
and the per-stage latency breakdown shape.

  JAX_PLATFORMS=cpu python -m evaluation.method_sweep \
      [--out evaluation/results/method_sweep.json]
"""
import argparse
import asyncio
import json
import os
import time

import numpy as np

METHODS = {
    "epd":   [("EPD", 1)],
    "ep_d":  [("EP", 1), ("D", 1)],
    "ed_p":  [("ED", 1), ("P", 1)],
    "e_p_d": [("E", 1), ("P", 1), ("D", 1)],
}


def make_requests(n: int, max_tokens: int):
    from PIL import Image

    from hydrainfer_tpu.request import Request, SamplingParameters
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8))
    reqs = []
    for i in range(n):
        has_img = i % 2 == 0
        reqs.append(Request(
            request_id=f"m{i}",
            prompt=("<image> describe image " if has_img else "plain text ")
                   + f"request number {i} with some padding words",
            image=img if has_img else None,
            sampling_params=SamplingParameters(max_tokens=max_tokens,
                                               ignore_eos=True)))
    return reqs


async def run_method(name: str, layout, n_requests: int, max_tokens: int,
                     arrival_s: float) -> dict:
    from hydrainfer_tpu.cluster.cluster import NodeSpec
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.cluster.process_node import (ProcessCluster,
                                                     ProcessClusterConfig)
    from hydrainfer_tpu.engine.output_token_processor import \
        LogOutputTokenProcessor
    from hydrainfer_tpu.engine.request_processor import \
        RequestProcessParameters

    node = NodeConfig(kv_block_size=4, n_kv_blocks=512, n_image_blocks=32)
    node.model.name = "random:tiny-lm+mm"
    node.model.dtype = "float32"
    node.request_processor.block_size = 4
    node.request_processor.num_request_process_workers = 1
    node.batch_scheduler.max_running_requests = 8
    node.log_latency_breakdown = True

    cluster = ProcessCluster(ProcessClusterConfig(
        nodes=[NodeSpec(nt, n) for nt, n in layout],
        node=node, platform="cpu"))
    procs = [LogOutputTokenProcessor() for _ in range(n_requests)]
    reqs = make_requests(n_requests, max_tokens)
    t0 = time.perf_counter()
    try:
        await cluster.start()
        boot_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        for req, proc in zip(reqs, procs):
            await cluster.add_request(
                req, RequestProcessParameters(output_token_processors=[proc]))
            await asyncio.sleep(arrival_s)
        deadline = time.time() + 600
        while not all(p.finished for p in procs):
            assert time.time() < deadline, (
                f"{name}: stalled with "
                f"{sum(p.finished for p in procs)}/{n_requests} finished")
            await asyncio.sleep(0.05)
        wall = time.perf_counter() - t1
    finally:
        await cluster.stop()
    tokens = [p.token_ids for p in procs]
    total = sum(len(t) for t in tokens)
    return {
        "layout": [f"{nt}x{n}" for nt, n in layout],
        "boot_s": round(boot_s, 2),
        "wall_s": round(wall, 2),
        "tokens_per_s": round(total / wall, 2),
        "all_finished": all(len(t) == max_tokens for t in tokens),
        "tokens": tokens,
    }


async def amain(args):
    results = {}
    for name, layout in METHODS.items():
        print(f"== {name}: {layout}", flush=True)
        results[name] = await run_method(name, layout, args.num_requests,
                                         args.max_tokens, args.arrival_s)
        print(f"   {results[name]['tokens_per_s']} tok/s, "
              f"finished={results[name]['all_finished']}", flush=True)

    base = results["epd"]["tokens"]
    for name, r in results.items():
        r["tokens_match_epd"] = r.pop("tokens") == base
    payload = {
        "methodology": ("one representative layout per disaggregation "
                        "family, spawned OS-process nodes on CPU, tiny "
                        "random-weight model with a real ViT tower, "
                        f"{args.num_requests} mixed text/image requests at "
                        f"{args.arrival_s}s spacing; tokens_match_epd = "
                        "greedy tokens identical to the colocated layout"),
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "tokens"}
                      for k, v in results.items()}, indent=1))
    print(f"wrote {args.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation/results/method_sweep.json")
    ap.add_argument("--num-requests", type=int, default=12)
    ap.add_argument("--max-tokens", type=int, default=8)
    ap.add_argument("--arrival-s", type=float, default=0.05)
    args = ap.parse_args()
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
