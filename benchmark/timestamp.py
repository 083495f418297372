"""Request arrival processes (reference: benchmark/timestamp.py:9-60).

Poisson plus real-trace interval models (Mooncake jsonl, Azure LLM
inference CSV, BurstGPT CSV), each rescaled to a target request rate.
"""
import csv
import json
from datetime import datetime
from typing import Callable, List

import numpy as np


class PoissonIntervals:
    def __init__(self, request_rate: float, seed: int = 0):
        self.request_rate = request_rate
        self.rng = np.random.default_rng(seed)

    def __getitem__(self, index: int) -> float:
        if self.request_rate == float("inf"):
            return 0.0
        return float(self.rng.exponential(1.0 / self.request_rate))


class UniformIntervals:
    def __init__(self, request_rate: float):
        self.request_rate = request_rate

    def __getitem__(self, index: int) -> float:
        if self.request_rate == float("inf"):
            return 0.0
        return 1.0 / self.request_rate


def load_mooncake_timestamps(path: str) -> List[float]:
    out = []
    with open(path) as f:
        for line in f:
            out.append(float(json.loads(line.strip())["timestamp"]))
    return out


def load_azure_timestamps(path: str) -> List[float]:
    out = []
    with open(path, newline="") as f:
        first = None
        for row in csv.DictReader(f):
            ts = datetime.strptime(row["TIMESTAMP"][:26], "%Y-%m-%d %H:%M:%S.%f")
            if first is None:
                first = ts
            out.append((ts - first).total_seconds())
    return out


def load_burstgpt_timestamps(path: str) -> List[float]:
    with open(path, newline="") as f:
        return [float(row["Timestamp"]) for row in csv.DictReader(f)]


class TraceIntervals:
    """Replay a real trace's inter-arrival pattern rescaled so its average
    rate equals request_rate."""

    def __init__(self, timestamps: List[float], request_rate: float):
        assert len(timestamps) >= 2
        self.n = len(timestamps)
        span = timestamps[-1] - timestamps[0]
        scale = span / (self.n / request_rate)
        self.timestamps = [(t - timestamps[0]) / scale for t in timestamps]

    def __getitem__(self, index: int) -> float:
        i = index % self.n
        if i == 0:
            return 0.0
        return self.timestamps[i] - self.timestamps[i - 1]


def get_intervals(method: str, request_rate: float, trace_path: str = None,
                  seed: int = 0):
    if method == "poisson":
        return PoissonIntervals(request_rate, seed)
    if method == "uniform":
        return UniformIntervals(request_rate)
    loaders: dict[str, Callable] = {
        "mooncake": load_mooncake_timestamps,
        "azure": load_azure_timestamps,
        "burstgpt": load_burstgpt_timestamps,
    }
    if method in loaders:
        assert trace_path, f"{method} intervals need --trace-path"
        return TraceIntervals(loaders[method](trace_path), request_rate)
    raise ValueError(f"unknown interval method {method}")
