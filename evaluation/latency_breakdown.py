"""Per-stage latency breakdown harvesting
(reference: evaluation/latency_breakdown/latency_breakdown_analysis.py:10-29).

Parses engine logs for the `<stage> time: <seconds>` lines emitted by
log_latency_breakdown (enable with cluster.node.log_latency_breakdown=true)
and prints per-stage statistics.
"""
import argparse
import json
import re
from collections import defaultdict

import numpy as np

STAGES = ("encode_queueing", "encode_execute", "ep_transfer",
          "prefill_queueing", "prefill_execute", "pd_transfer",
          "decode_queueing", "decode_execute")
LINE_RE = re.compile(r"(\w+) time: ([0-9.eE+-]+)")


def parse_log(path: str):
    per_stage = defaultdict(list)
    with open(path) as f:
        for line in f:
            m = LINE_RE.search(line)
            if m and m.group(1) in STAGES:
                per_stage[m.group(1)].append(float(m.group(2)))
    return per_stage


def summarize(per_stage) -> dict:
    out = {}
    for stage in STAGES:
        vals = per_stage.get(stage)
        if not vals:
            continue
        a = np.asarray(vals)
        out[stage] = {"n": len(vals), "mean": float(a.mean()),
                      "p50": float(np.median(a)), "p90": float(np.percentile(a, 90))}
    total = sum(v["mean"] * v["n"] for v in out.values())
    for stage, v in out.items():
        v["share"] = round(v["mean"] * v["n"] / total, 4) if total else 0.0
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_path")
    args = ap.parse_args()
    print(json.dumps(summarize(parse_log(args.log_path)), indent=2))


if __name__ == "__main__":
    main()
