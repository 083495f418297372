"""Host-side phase profiler for the engine hot loop.

The step-ceiling trace (evaluation/results/step_ceiling_7b.json) shows a
~4.6 ms/step gap between device-busy and wall time at the 7B headline —
host work + tunnel dispatch. This module attributes that gap: spans wrap
each host phase of the fill path (schedule, batch build, H2D, dispatch,
token read, postprocess, cursor walk) and accumulate totals.

Enabled via HYDRAINFER_HOST_PROF=1 (zero overhead when off beyond one
attribute check per span). bench.py prints the report when enabled.
"""
import os
import time
from collections import defaultdict

enabled = bool(int(os.environ.get("HYDRAINFER_HOST_PROF", "0") or "0"))
# level 2: also record a (name, tag, t) event timeline (window lifecycle)
events_enabled = (os.environ.get("HYDRAINFER_HOST_PROF", "0") or "0") == "2"
totals = defaultdict(float)
counts = defaultdict(int)
events = []


def event(name: str, tag=None) -> None:
    if events_enabled:
        events.append((name, tag, time.perf_counter()))


class span:
    __slots__ = ("name", "t0")

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if enabled:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if enabled:
            totals[self.name] += time.perf_counter() - self.t0
            counts[self.name] += 1
        return False


def add(name: str, dt: float) -> None:
    if enabled:
        totals[name] += dt
        counts[name] += 1


def reset() -> None:
    totals.clear()
    counts.clear()
    events.clear()


def report() -> dict:
    return {k: {"total_s": round(v, 4), "n": counts[k],
                "mean_ms": round(1e3 * v / max(counts[k], 1), 3)}
            for k, v in sorted(totals.items(), key=lambda kv: -kv[1])}
