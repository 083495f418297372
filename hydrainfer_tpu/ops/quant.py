"""Weight-only quantization (INT8 / INT4 / FP8-e4m3) for the decode hot path.

Replaces the reference's Triton FP8 quant kernels
(reference: hydrainfer/triton/per_token_group_quant_fp8_kernel.py,
w8a8_block_fp8_matmul_kernel.py) with the TPU-appropriate scheme: batched
decode is HBM-bandwidth-bound on WEIGHT reads, so weight-only quantization
(int8/fp8 = 2x, int4 = 4x fewer bytes) moves the roofline directly.
Activations stay bf16 — the dequant happens in the matmul's rhs load and
XLA fuses the convert into the dot; a Pallas fused dequant-matmul kernel
can slot in behind the same QuantizedTensor type.

Scheme: symmetric scales, group-wise where it buys quality for ~free:
  - int8: per-output-channel (near-lossless already — BASELINE.md table);
  - int4: (input-group g=128, output-channel) scales — per-column-only int4
    measured top-1 agreement 0.487 vs bf16; group-wise is table stakes for
    4-bit (reference ships only block-wise fp8: hydrainfer/triton/
    w8a8_block_fp8_matmul_kernel.py — int4 is beyond-reference);
  - fp8: per-output-channel e4m3 with amax → 448 (group scales measured a
    quality wash for fp8 — its error is mantissa-relative).
int4 packs two nibbles per int8 byte along the input axis.
"""
from dataclasses import dataclass
from typing import Union

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class QuantizedTensor:
    """q: int8 (in, out) for int8, float8_e4m3fn (in, out) for fp8, or
    (in/2, out) packed int8 for int4; scale: (out,) f32 per-column, or
    (in/group, out) f32 when group > 0."""
    q: jax.Array
    scale: jax.Array
    bits: int = 8       # static (pytree metadata); 8 for both int8 and fp8
    fmt: str = "int"    # "int" | "fp8"
    group: int = 0      # input-axis scale group size (0 = per-column only)


jax.tree_util.register_dataclass(QuantizedTensor,
                                 data_fields=["q", "scale"],
                                 meta_fields=["bits", "fmt", "group"])

GROUP_SIZE = 128        # default input-axis scale group (g=128, GPTQ-style)


def _group_for(in_dim: int, group: int) -> int:
    """Effective group size: the largest of {group, group/2, group/4} that
    divides the input dim (with >1 group), else 0 (per-column). The halving
    chain covers dims like 704 (= 64·11) that the canonical g=128 misses."""
    g = group
    while g >= max(1, group // 4):
        if g and in_dim % g == 0 and in_dim > g:
            return g
        g //= 2
    return 0


def _group_scales(wf: jax.Array, group: int, qmax: float):
    """amax scales over (input-group, output-channel) tiles; returns
    (scaled w ready to quantize, scales)."""
    in_dim, out = wf.shape
    g = wf.reshape(in_dim // group, group, out)
    scale = jnp.max(jnp.abs(g), axis=1) / qmax          # (G, out)
    scale = jnp.maximum(scale, 1e-8)
    return (g / scale[:, None, :]).reshape(in_dim, out), scale


@jax.jit
def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """(in, out) float → per-column symmetric int8. Jitted: un-jitted, the
    ~6 ops here each dispatch separately per tensor — over the tunneled
    TPU that made quantizing a 28-layer tree take minutes."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale, bits=8)


import functools


@functools.partial(jax.jit, static_argnames=("group",))
def quantize_int4(w: jax.Array, group: int = GROUP_SIZE) -> QuantizedTensor:
    """(in, out) float → symmetric int4, two values per byte along the
    input axis (in must be even). Scales are (in/group, out) when the input
    dim divides the group (the shipped default), else per-column."""
    wf = w.astype(jnp.float32)
    assert wf.shape[0] % 2 == 0, "int4 packing needs even input dim"
    grp = _group_for(wf.shape[0], group)
    if grp:
        scaled, scale = _group_scales(wf, grp, 7.0)
    else:
        scale = jnp.max(jnp.abs(wf), axis=0) / 7.0
        scale = jnp.maximum(scale, 1e-8)
        scaled = wf / scale[None, :]
    q = jnp.clip(jnp.round(scaled), -7, 7).astype(jnp.int8)
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)
    return QuantizedTensor(q=packed, scale=scale, bits=4, group=grp)


@functools.partial(jax.jit, static_argnames=("group",))
def quantize_fp8(w: jax.Array, group: int = 0) -> QuantizedTensor:
    """(in, out) float → float8_e4m3fn (amax → 448), per-output-channel
    scales by default (reference scheme: hydrainfer/triton/
    per_token_group_quant_fp8_kernel.py:6-41 ships per-group e4m3; measured
    here, group scales are a quality WASH for fp8 — e4m3 error is relative
    (mantissa-bound), so scale granularity barely moves it — while forcing
    the slower dequant-then-dot matmul. group=128 remains available for
    layout parity experiments."""
    wf = w.astype(jnp.float32)
    grp = _group_for(wf.shape[0], group)
    if grp:
        scaled, scale = _group_scales(wf, grp, 448.0)
    else:
        scale = jnp.max(jnp.abs(wf), axis=0) / 448.0
        scale = jnp.maximum(scale, 1e-12)
        scaled = wf / scale[None, :]
    q = scaled.astype(jnp.float8_e4m3fn)
    return QuantizedTensor(q=q, scale=scale, bits=8, fmt="fp8", group=grp)


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """(in/2, out) packed → (in, out) int8 in [-7, 7]."""
    lo = (packed & 0x0F).astype(jnp.int8)
    hi = ((packed >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend the nibble
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    n2, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(n2 * 2, out)


def dequantize(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    q = qt.q if qt.bits == 8 else _unpack_int4(qt.q)
    if qt.group:
        in_dim, out = q.shape
        w = (q.astype(jnp.float32).reshape(-1, qt.group, out)
             * qt.scale[:, None, :]).reshape(in_dim, out)
        return w.astype(dtype)
    return (q.astype(jnp.float32) * qt.scale[None, :]).astype(dtype)


import os

# opt-in until perf-validated per shape: the custom Pallas fused
# dequant-matmul streams int8 tiles HBM→VMEM and converts in-kernel.
# set_pallas_qmm() flips it programmatically (takes effect at the next jit
# trace — the A/B harness toggles it between engine builds).
_USE_PALLAS_QMM = os.environ.get("HYDRAINFER_PALLAS_QMM", "0") == "1"


def set_pallas_qmm(enabled: bool) -> None:
    global _USE_PALLAS_QMM
    _USE_PALLAS_QMM = enabled


def _pick_block(dim: int) -> int:
    for b in (512, 256, 128):
        if dim % b == 0:
            return b
    return 0


def qmatmul(x: jax.Array, w: Union[jax.Array, QuantizedTensor]) -> jax.Array:
    """x @ W for plain or quantized weights (the dispatch point the Pallas
    fused dequant-matmul kernel plugs into)."""
    if isinstance(w, QuantizedTensor):
        if (_USE_PALLAS_QMM and w.bits == 8 and w.fmt == "int" and x.ndim == 2
                and not w.group and jax.default_backend() == "tpu"):
            bk, bn = _pick_block(w.q.shape[0]), _pick_block(w.q.shape[1])
            if bk and bn:
                from .pallas.quant_matmul import quant_matmul_int8
                return quant_matmul_int8(x, w.q, w.scale, block_k=bk,
                                         block_n=bn, out_dtype=x.dtype)
        if w.group:
            # group scales can't fold after the dot; dequant feeds the dot's
            # rhs as a fused elementwise producer (HBM traffic stays packed)
            return jnp.dot(x, dequantize(w, x.dtype),
                           preferred_element_type=jnp.float32).astype(x.dtype)
        q = w.q if w.bits == 8 else _unpack_int4(w.q)
        # int8 rhs converts to the activation dtype inside the fused dot
        out = jnp.dot(x, q.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return (out * w.scale[None, :]).astype(x.dtype)
    return x @ w


def qmatmul_f32(x: jax.Array, w: Union[jax.Array, QuantizedTensor]) -> jax.Array:
    """Like qmatmul but keeps fp32 output (for logits)."""
    if isinstance(w, QuantizedTensor):
        if w.group:
            return jnp.dot(x, dequantize(w, x.dtype),
                           preferred_element_type=jnp.float32)
        q = w.q if w.bits == 8 else _unpack_int4(w.q)
        out = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
        return out * w.scale[None, :]
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def quantize_tree(weights, mode: str, keys=("qkv_proj", "o_proj", "gate_up",
                                            "down", "lm_head")):
    """Quantize the matmul weights of a decoder pytree in place-ish.
    mode: 'none' | 'int8' | 'int4' | 'fp8'. Norms/embeddings stay full
    precision (embedding gathers are tiny; lm_head is quantized)."""
    if mode in (None, "none", ""):
        return weights
    quant = {"int8": quantize_int8, "int4": quantize_int4,
             "fp8": quantize_fp8}[mode]
    # int4 keeps the lm_head at int8: its error lands DIRECTLY on the
    # logits (no later layer to wash it out) and it is ~2% of a 7B's
    # bytes — measured on the tiny-ckpt harness this one exemption moves
    # int4 top-1 agreement far more than any scale-granularity change
    head_quant = quantize_int8 if mode == "int4" else quant

    def convert(d):
        # idempotent: leaves already quantized (e.g. per-layer during
        # random init, to avoid holding the full bf16 AND quantized trees
        # in HBM at once — a 7B model OOMs a 16GB chip otherwise) pass through
        return {k: (quant(v) if k in keys and v is not None
                    and not isinstance(v, QuantizedTensor) else v)
                for k, v in d.items()}

    out = dict(weights)
    if "layers" in out:
        out["layers"] = [convert(lw) for lw in out["layers"]]
    if "layers_segments" in out:
        out["layers_segments"] = [convert(seg) for seg in out["layers_segments"]]
    if "last_layer" in out:
        out["last_layer"] = convert(out["last_layer"])
    if ("lm_head" in out and "lm_head" in keys
            and not isinstance(out["lm_head"], QuantizedTensor)):
        out["lm_head"] = head_quant(out["lm_head"])
    return out
