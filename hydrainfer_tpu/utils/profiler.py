"""Wall-clock span profiler with atexit totals report.

Behavioral parity with the reference's nvtx+wall profiler
(reference: hydrainfer/utils/profiler.py:6-31). On TPU the device-side
equivalent is jax.profiler traces; this covers host-side spans.
"""
import atexit
import collections
import contextlib
import time
from typing import Dict, Tuple

import jax

from .logger import getLogger

logger = getLogger(__name__)

_totals: Dict[str, Tuple[float, int]] = collections.defaultdict(lambda: (0.0, 0))
_enabled = False


def enable() -> None:
    global _enabled
    _enabled = True


@contextlib.contextmanager
def span(name: str):
    """Time a host-side span; accumulate totals reported at exit."""
    if not _enabled:
        yield
        return
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            total, n = _totals[name]
            _totals[name] = (total + dt, n + 1)


@atexit.register
def _report() -> None:
    if not _totals:
        return
    lines = ["profiler totals:"]
    for name, (total, n) in sorted(_totals.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"  {name}: total={total * 1e3:.2f}ms n={n} avg={total / n * 1e3:.3f}ms")
    logger.info("\n".join(lines))
