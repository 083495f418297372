"""Correctness evaluation: generate deterministically through the serving
stack and dump outputs for cross-backend comparison
(reference: evaluation/test_correctness/evaluation.sh — which starts the
server, fires ignore_eos requests and diffs against vLLM dumps).

Usage:
  python -m evaluation.test_correctness --model-path /path/to/ckpt \
      --num-prompts 16 --max-tokens 32 --output result/correctness.json
  # then diff two dumps:
  python -m evaluation.test_correctness --compare a.json b.json
"""
import argparse
import json

import numpy as np


def run_generate(model_path: str, n_prompts: int, max_tokens: int,
                 dtype: str = "bf16", quantization: str = "none") -> list:
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models import ModelFactoryConfig
    from hydrainfer_tpu.request import Request, SamplingParameters

    cfg = NodeConfig(request_processor=RequestProcessorConfig(
        num_request_process_workers=1))
    cfg.model = ModelFactoryConfig(path=model_path, dtype=dtype,
                                   quantization=quantization)
    engine = OfflineEngine(cfg)
    rng = np.random.default_rng(0)
    prompts = [" ".join(rng.choice(
        ["the", "a", "of", "to", "and", "in", "is", "it", "you", "that"],
        size=rng.integers(8, 32))) for _ in range(n_prompts)]
    outs = engine.generate([
        Request(request_id=i, prompt=p,
                sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                   ignore_eos=True))
        for i, p in enumerate(prompts)], timeout_s=1200)
    return [{"prompt": p, "output_token_ids": o.output_token_ids,
             "text": o.text} for p, o in zip(prompts, outs)]


def compare(path_a: str, path_b: str) -> dict:
    with open(path_a) as f:
        a = json.load(f)
    with open(path_b) as f:
        b = json.load(f)
    n_match = sum(1 for x, y in zip(a, b)
                  if x["output_token_ids"] == y["output_token_ids"])
    first_div = []
    for x, y in zip(a, b):
        ids_a, ids_b = x["output_token_ids"], y["output_token_ids"]
        div = next((i for i, (p, q) in enumerate(zip(ids_a, ids_b)) if p != q),
                   None)
        first_div.append(div)
    return {"n": len(a), "n_exact_match": n_match,
            "match_rate": n_match / max(len(a), 1),
            "first_divergence": first_div}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path")
    ap.add_argument("--num-prompts", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--output", default="correctness.json")
    ap.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = ap.parse_args()
    if args.compare:
        print(json.dumps(compare(*args.compare), indent=2))
        return
    results = run_generate(args.model_path, args.num_prompts, args.max_tokens,
                           args.dtype, args.quant)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output} ({len(results)} prompts)")


if __name__ == "__main__":
    main()
