"""Synthesize format-exact bursty arrival traces.

The reference replays Mooncake / Azure / BurstGPT traces through its
interval models (reference: benchmark/timestamp.py:9-60). This environment
has no egress to fetch the real dumps, so this tool writes traces in the
exact on-disk formats the loaders parse, with a Markov-modulated Poisson
process (MMPP) that reproduces the property those traces exist to test:
heavy bursts — multi-second quiet stretches punctuated by arrival storms at
~10x the mean rate. TraceIntervals rescales to the target request rate, so
only the SHAPE of the inter-arrival distribution matters here.

  python -m evaluation.make_bursty_traces --out-dir /tmp/traces
    → mooncake.jsonl   ({"timestamp": ...} per line, ms ticks)
      burstgpt.csv     (Timestamp column, seconds)
"""
import argparse
import csv
import json
import os

import numpy as np


def mmpp_timestamps(n: int, seed: int, rate_burst: float = 30.0,
                    p_enter: float = 0.01, p_exit: float = 0.04,
                    calm_sigma: float = 1.6) -> np.ndarray:
    """Two-state modulated process: bursts are fast exponential clumps
    (dwell ~1/p_exit arrivals at 30x rate), calm gaps are LOGNORMAL —
    the heavy tail is what gives real traces their interval CV^2 >> 1
    (exponential calm gaps cap the mixture near ~1.5). Yields CV^2 ~ 6-10
    vs poisson's 1.0."""
    rng = np.random.default_rng(seed)
    ts, t, burst = [], 0.0, False
    calm_mu = -calm_sigma ** 2 / 2        # mean-1 lognormal
    for _ in range(n):
        if burst:
            t += rng.exponential(1.0 / rate_burst)
        else:
            t += rng.lognormal(calm_mu, calm_sigma)
        ts.append(t)
        burst = (rng.random() >= p_exit) if burst else (rng.random() < p_enter)
    return np.asarray(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/traces")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    ts = mmpp_timestamps(args.n, args.seed)
    # Mooncake jsonl: integer millisecond timestamps
    mc = os.path.join(args.out_dir, "mooncake.jsonl")
    with open(mc, "w") as f:
        for t in ts:
            f.write(json.dumps({"timestamp": int(t * 1000),
                                "input_length": 128, "output_length": 128,
                                "hash_ids": []}) + "\n")

    ts2 = mmpp_timestamps(args.n, args.seed + 1)
    # BurstGPT csv: float second timestamps
    bg = os.path.join(args.out_dir, "burstgpt.csv")
    with open(bg, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Timestamp", "Model",
                                          "Request tokens", "Response tokens"])
        w.writeheader()
        for t in ts2:
            w.writerow({"Timestamp": round(float(t), 3), "Model": "GPT-4",
                        "Request tokens": 128, "Response tokens": 128})

    # burstiness diagnostic: squared coefficient of variation of intervals
    # (poisson = 1; these should be >> 1)
    for name, tt in (("mooncake", ts), ("burstgpt", ts2)):
        iv = np.diff(tt)
        cv2 = float(np.var(iv) / np.mean(iv) ** 2)
        print(f"{name}: n={len(tt)} interval CV^2={cv2:.2f} "
              f"(poisson=1.0)")
    print(f"wrote {mc} and {bg}")


if __name__ == "__main__":
    main()
