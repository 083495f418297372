"""Dataset shape analysis (reference: evaluation/dataset_analysis/ —
prompt/output length and modality distributions over the serving datasets,
the numbers that motivate scenario-aware routing and the EPD split).

Input: an entries JSON (benchmark/synthetic_dataset.py:load_entries_json
format) or synthetic entries. Output: a JSON summary + a markdown table of
prompt-length / output-length / image-ratio distributions and the scenario
mix under the engine's classifier thresholds.

Usage:
  python -m evaluation.dataset_analysis --entries data.json
  python -m evaluation.dataset_analysis --synthetic 512 --image-ratio 0.5
"""
import argparse
import json

import numpy as np


def analyze(entries, tokenizer=None):
    def n_tokens(prompt):
        if tokenizer is not None:
            return len(tokenizer.encode(prompt))
        return len(prompt.split())        # word-count proxy

    prompt_lens = np.asarray([n_tokens(e.prompt) for e in entries])
    out_lens = np.asarray([e.max_tokens for e in entries])
    has_image = np.asarray([e.image_base64 is not None for e in entries])

    from hydrainfer_tpu.engine.scenario import ScenarioClassifier
    clf = ScenarioClassifier()
    scenarios = {}
    for e, p in zip(entries, prompt_lens):
        s = clf.classify(n_text_tokens=int(p), n_output_tokens=e.max_tokens)
        scenarios[s.name] = scenarios.get(s.name, 0) + 1

    def dist(a):
        return {"mean": round(float(a.mean()), 1),
                "p50": int(np.percentile(a, 50)),
                "p90": int(np.percentile(a, 90)),
                "p99": int(np.percentile(a, 99)),
                "max": int(a.max())}

    return {
        "n_entries": len(entries),
        "prompt_tokens": dist(prompt_lens),
        "output_tokens": dist(out_lens),
        "image_ratio": round(float(has_image.mean()), 3),
        "scenario_mix": scenarios,
    }


def to_markdown(summary: dict) -> str:
    p, o = summary["prompt_tokens"], summary["output_tokens"]
    lines = [
        "| metric | mean | p50 | p90 | p99 | max |",
        "|---|---|---|---|---|---|",
        f"| prompt tokens | {p['mean']} | {p['p50']} | {p['p90']} | {p['p99']} | {p['max']} |",
        f"| output tokens | {o['mean']} | {o['p50']} | {o['p90']} | {o['p99']} | {o['max']} |",
        "",
        f"image ratio: **{summary['image_ratio']}** · scenario mix: "
        + ", ".join(f"{k}={v}" for k, v in sorted(summary["scenario_mix"].items())),
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", default=None, help="entries JSON path")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--image-ratio", type=float, default=0.5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from benchmark.synthetic_dataset import (load_entries_json,
                                             make_synthetic_entries)
    entries = (load_entries_json(args.entries) if args.entries
               else make_synthetic_entries(args.synthetic or 256,
                                           image_ratio=args.image_ratio))
    summary = analyze(entries)
    print(to_markdown(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
