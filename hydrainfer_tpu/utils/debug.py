"""Tensor probes for cross-implementation debugging
(reference: hydrainfer/utils/debug.py — save/load/compare tensor dumps used
to bisect divergences between implementations).

Two workflows:

1. In-jit probes. `probe("name", x)` inside any traced function records the
   tensor (via `jax.debug.callback`, so it works under jit/scan/shard_map
   replication) into the process-global registry. `dump(path)` writes the
   registry as an .npz; `clear()` resets it.

2. Offline comparison. `compare(path_a, path_b)` (or `compare_with(path)`
   against the live registry) prints a per-tensor max-abs/rel-diff table —
   the bisection tool: dump from the reference implementation, dump from
   this one, diff by name.

Probes are no-ops unless enabled (HYDRAINFER_DEBUG_PROBES=1 or
`enable(True)`), so call sites can stay in the code.
"""
import os
from typing import Dict, List

import numpy as np

_ENABLED = os.environ.get("HYDRAINFER_DEBUG_PROBES", "0") == "1"
_REGISTRY: Dict[str, List[np.ndarray]] = {}


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def clear() -> None:
    _REGISTRY.clear()


def _record(name: str, value) -> None:
    _REGISTRY.setdefault(name, []).append(np.asarray(value))


def probe(name: str, x):
    """Record x under `name` (appends on repeated hits, e.g. per layer or
    per scan step). Returns x unchanged so it can be used inline:
    `h = probe("post_norm", rms_norm(...))`."""
    if not _ENABLED:
        return x
    import jax
    jax.debug.callback(lambda v: _record(name, v), x)
    return x


def stats(name: str):
    """Summary of everything recorded under name."""
    vals = _REGISTRY.get(name, [])
    return [{"shape": v.shape,
             "mean": float(np.mean(v)), "std": float(np.std(v)),
             "absmax": float(np.max(np.abs(v))) if v.size else 0.0,
             "nan": int(np.isnan(v).sum()), "inf": int(np.isinf(v).sum())}
            for v in vals]


def dump(path: str) -> None:
    """Registry → one .npz (hit i of `name` saved as `name.i`)."""
    flat = {f"{k}.{i}": v for k, vs in _REGISTRY.items()
            for i, v in enumerate(vs)}
    np.savez(path, **flat)


def _load(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def compare(path_a: str, path_b: str, atol: float = 1e-5) -> List[dict]:
    return _diff(_load(path_a), _load(path_b), atol)


def compare_with(path: str, atol: float = 1e-5) -> List[dict]:
    """Diff a saved dump against the live registry."""
    live = {f"{k}.{i}": v for k, vs in _REGISTRY.items()
            for i, v in enumerate(vs)}
    return _diff(_load(path), live, atol)


def _diff(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray],
          atol: float) -> List[dict]:
    rows = []
    for k in sorted(set(a) | set(b)):
        if k not in a or k not in b:
            rows.append({"name": k, "status": "only_in_" + ("a" if k in a else "b")})
            continue
        va, vb = a[k], b[k]
        if va.shape != vb.shape:
            rows.append({"name": k, "status": "shape",
                         "a": va.shape, "b": vb.shape})
            continue
        d = np.abs(va.astype(np.float64) - vb.astype(np.float64))
        rows.append({"name": k,
                     "status": "ok" if float(d.max(initial=0)) <= atol else "DIFF",
                     "max_abs": float(d.max(initial=0)),
                     "mean_abs": float(d.mean()) if d.size else 0.0})
    for r in rows:
        print(r)
    return rows
