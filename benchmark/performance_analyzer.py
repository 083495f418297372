"""SLO attainment + goodput curves from benchmark result JSONs
(reference: benchmark/performance_analyzer.py:18-33).

Usage: python -m benchmark.performance_analyzer result/ [--plot out.png]
"""
import argparse
import glob
import json
import os


def load_results(result_dir: str):
    rows = []
    for path in sorted(glob.glob(os.path.join(result_dir, "rate_*.json"))):
        with open(path) as f:
            rows.append(json.load(f))
    rows.sort(key=lambda r: r["request_rate"])
    return rows


def summarize(rows):
    table = []
    for r in rows:
        table.append({
            "request_rate": r["request_rate"],
            "token_throughput": round(r["token_throughput"], 1),
            "ttft_p90": round(r["ttft"]["p90"], 4) if r["ttft"] else None,
            "tpot_p90": round(r["tpot"]["p90"], 5) if r["tpot"] else None,
            "attainment": round(r["slo"]["attainment"], 4),
            "goodput_tokens_per_s": round(r["slo"]["goodput_tokens_per_s"], 1),
        })
    return table


def plot(rows, out_path: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rates = [r["request_rate"] for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    axes[0].plot(rates, [r["slo"]["attainment"] for r in rows], "o-")
    axes[0].set_xlabel("request rate (req/s)")
    axes[0].set_ylabel("SLO attainment")
    axes[0].set_ylim(0, 1.05)
    axes[1].plot(rates, [r["slo"]["goodput_tokens_per_s"] for r in rows], "o-")
    axes[1].set_xlabel("request rate (req/s)")
    axes[1].set_ylabel("goodput (tokens/s)")
    axes[2].plot(rates, [r["ttft"]["p90"] if r["ttft"] else 0 for r in rows], "o-",
                 label="ttft p90")
    axes[2].plot(rates, [r["tpot"]["p90"] if r["tpot"] else 0 for r in rows], "s-",
                 label="tpot p90")
    axes[2].set_xlabel("request rate (req/s)")
    axes[2].set_ylabel("latency (s)")
    axes[2].legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("result_dir")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()
    rows = load_results(args.result_dir)
    table = summarize(rows)
    print(json.dumps(table, indent=2))
    if args.plot:
        plot(rows, args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
