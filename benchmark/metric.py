"""Benchmark result records + statistics (reference: benchmark/metric.py)."""
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class Statistics:
    max: float = 0.0
    min: float = 0.0
    mean: float = 0.0
    median: float = 0.0
    p90: float = 0.0
    p99: float = 0.0
    var: float = 0.0

    @classmethod
    def of(cls, values: List[float]) -> Optional["Statistics"]:
        if not values:
            return None
        a = np.asarray(values, dtype=np.float64)
        return cls(max=float(a.max()), min=float(a.min()), mean=float(a.mean()),
                   median=float(np.median(a)), p90=float(np.percentile(a, 90)),
                   p99=float(np.percentile(a, 99)), var=float(a.var()))

    def as_dict(self):
        return self.__dict__.copy()


@dataclass
class OnlineRequestOutput:
    request_id: str = ""
    prompt_len: int = 0
    success: bool = False
    error_msg: str = ""
    output_text: str = ""
    start_time: float = 0.0
    token_times: List[float] = field(default_factory=list)
    # derived
    total_tokens: int = 0
    latency: Optional[float] = None
    ttft: Optional[float] = None
    tpots: List[float] = field(default_factory=list)

    def finalize(self) -> None:
        self.total_tokens = len(self.token_times)
        if self.token_times:
            self.ttft = self.token_times[0] - self.start_time
            self.latency = self.token_times[-1] - self.start_time
            self.tpots = list(np.diff(self.token_times))


@dataclass
class BenchmarkResult:
    request_rate: float = 0.0
    start_time: float = 0.0
    end_time: float = 0.0
    outputs: List[OnlineRequestOutput] = field(default_factory=list)

    def analyze(self) -> dict:
        for o in self.outputs:
            o.finalize()
        ok = [o for o in self.outputs if o.success]
        wall = max(self.end_time - self.start_time, 1e-9)
        total_tokens = sum(o.total_tokens for o in ok)
        ttfts = [o.ttft for o in ok if o.ttft is not None]
        tpots = [t for o in ok for t in o.tpots]
        lats = [o.latency for o in ok if o.latency is not None]
        return {
            "request_rate": self.request_rate,
            "n_requests": len(self.outputs),
            "n_success": len(ok),
            "duration_s": wall,
            "total_output_tokens": total_tokens,
            "token_throughput": total_tokens / wall,
            "request_throughput": len(ok) / wall,
            "ttft": Statistics.of(ttfts).as_dict() if ttfts else None,
            "tpot": Statistics.of(tpots).as_dict() if tpots else None,
            "latency": Statistics.of(lats).as_dict() if lats else None,
        }


def slo_attainment(result: BenchmarkResult, ttft_slo: float,
                   tpot_slo: float, gap_p99_slo: float = 0.0) -> dict:
    """Fraction of requests meeting both SLOs + goodput
    (reference: benchmark/performance_analyzer.py:18-33).

    gap_p99_slo > 0 adds a STRICT per-token criterion: the p99 of a
    request's raw inter-token gaps must also meet it. Mean TPOT hides the
    fused-window burst (tokens arrive one K-window at a time); this is
    what a per-token SLO checker would enforce."""
    for o in result.outputs:
        o.finalize()
    ok = [o for o in result.outputs if o.success and o.ttft is not None]
    meeting = [o for o in ok
               if o.ttft <= ttft_slo
               and (not o.tpots or float(np.mean(o.tpots)) <= tpot_slo)
               and (not gap_p99_slo or not o.tpots
                    or float(np.percentile(o.tpots, 99)) <= gap_p99_slo)]
    wall = max(result.end_time - result.start_time, 1e-9)
    return {
        "request_rate": result.request_rate,
        "attainment": len(meeting) / max(len(result.outputs), 1),
        "goodput_tokens_per_s": sum(o.total_tokens for o in meeting) / wall,
        "goodput_requests_per_s": len(meeting) / wall,
    }
