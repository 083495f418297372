"""Monotonic id allocators (reference: hydrainfer/utils counters)."""
import itertools
import threading


class Counter:
    """Thread-safe monotonically increasing counter."""

    def __init__(self, start: int = 0):
        self._it = itertools.count(start)
        self._lock = threading.Lock()

    def next(self) -> int:
        with self._lock:
            return next(self._it)

    __next__ = next


class IncreasingAllocator:
    """Allocates increasing integer ids starting from `start`."""

    def __init__(self, start: int = 0):
        self._counter = Counter(start)

    def allocate(self) -> int:
        return self._counter.next()
