"""Safetensors → jnp pytree loading.

Behavioral parity with the reference's multi-file loader
(reference: hydrainfer/model/model_loader.py:11-43): load every
*.safetensors shard in a checkpoint dir, let per-model converters consume
tensors by name (with optional prefix remap), and assert completeness —
unconsumed or missing tensors are loader bugs and fail loudly.
"""
import glob
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open

from ..utils.logger import getLogger

logger = getLogger(__name__)


class WeightStore:
    """Name → tensor access with used-key tracking for completeness checks."""

    def __init__(self, path: str, cast_dtype: Optional[str] = None):
        self.path = path
        self._handles = {}
        self._key_to_file: Dict[str, str] = {}
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        assert files, f"no *.safetensors under {path}"
        for f in files:
            h = safe_open(f, framework="np")
            self._handles[f] = h
            for k in h.keys():
                self._key_to_file[k] = f
        self._used = set()
        self.cast_dtype = cast_dtype

    def keys(self) -> List[str]:
        return list(self._key_to_file)

    def has(self, name: str) -> bool:
        return name in self._key_to_file

    def get_np(self, name: str) -> np.ndarray:
        assert name in self._key_to_file, f"missing tensor {name} in {self.path}"
        self._used.add(name)
        t = self._handles[self._key_to_file[name]].get_tensor(name)
        if t.dtype == np.uint16:  # safetensors numpy framework surfaces bf16 as u16
            t = t.view(jnp.bfloat16.dtype)
        return t

    def get(self, name: str, transpose: bool = False):
        t = self.get_np(name)
        if transpose:
            t = np.ascontiguousarray(t.T)
        arr = jnp.asarray(t)
        if self.cast_dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(self.cast_dtype)
        return arr

    def linear(self, name_prefix: str, bias: bool = False):
        """HF nn.Linear stores (out, in); we store (in, out) for x @ W."""
        w = self.get(name_prefix + ".weight", transpose=True)
        if bias and self.has(name_prefix + ".bias"):
            return w, self.get(name_prefix + ".bias")
        return (w, None) if bias else w

    def fused_linear(self, prefixes: List[str], bias: bool = False):
        """Concatenate several HF linears into one (in, sum_out) matmul."""
        ws = [self.get(p + ".weight", transpose=True) for p in prefixes]
        w = jnp.concatenate(ws, axis=1)
        if bias:
            has_bias = self.has(prefixes[0] + ".bias")
            if has_bias:
                b = jnp.concatenate([self.get(p + ".bias") for p in prefixes])
                return w, b
            return w, None
        return w

    def assert_consumed(self, ignore_prefixes: tuple = ()) -> None:
        left = [k for k in self._key_to_file
                if k not in self._used and not k.startswith(ignore_prefixes)]
        if left:
            logger.warning(f"unconsumed checkpoint tensors: {left[:20]}"
                           + ("..." if len(left) > 20 else ""))
