"""Device meshes and sharding rules — tensor parallelism the GSPMD way.

This supersedes the reference's explicit TP runtime
(reference: hydrainfer/model_parallel/process_group.py:51-95 and
layer/linear.py:19-115 — Row/ColumnParallelLinear with manual
scatter/all-reduce): here TP is expressed as NamedShardings on the weight
pytree and the KV cache; XLA's SPMD partitioner inserts the collectives
(the all-reduce after o_proj/down_proj falls out of sharding propagation),
and they ride the ICI because the mesh axes map onto the physical torus.

Sharding layout (megatron-style):
  - qkv_proj:  columns (head dim) over 'tp'   → q/k/v heads split per chip
  - o_proj:    rows over 'tp'                 → partial sums all-reduced
  - gate_up:   columns over 'tp'
  - down:      rows over 'tp'
  - embed / lm_head: vocab axis over 'tp' (all-gather on lookup/logits)
  - kv cache:  kv-head axis over 'tp'         → paged attention is local
  - everything else replicated
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              shape: Optional[Sequence[int]] = None,
              devices: Optional[list] = None) -> Mesh:
    """Mesh over the first n_devices. Default: all devices on the 'tp' axis."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if shape is None:
        shape = [1] * (len(axis_names) - 1) + [n]
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)


# PartitionSpecs per decoder-layer weight name (None axis = replicated).
# MoE expert stacks shard their EXPERT axis over 'tp' (expert parallelism:
# ops/moe.py:moe_ffn_ep combines shards with a psum); the router stays
# replicated — routing is (T, E), trivial next to expert weights.
DECODER_WEIGHT_RULES = {
    "qkv_proj": P(None, "tp"),
    "qkv_bias": P("tp"),
    "o_proj": P("tp", None),
    "gate_up": P(None, "tp"),
    "down": P("tp", None),
    "input_norm": P(None),
    "post_norm": P(None),
    "moe_router": P(None, None),
    "moe_router_bias": P(None),
    "moe_gate_up": P("tp", None, None),
    "moe_down": P("tp", None, None),
    # MLA (DeepSeek): q heads + absorbed up-projections shard over 'tp';
    # the compressed-latent projections and norms replicate (the latent
    # cache itself is replicated — kv head 1 cannot split)
    "q_a": P(None, None),
    "q_a_norm": P(None),
    "q_b": P(None, "tp"),
    "q_proj": P(None, "tp"),
    "kv_a": P(None, None),
    "kv_a_norm": P(None),
    "w_uk": P(None, "tp", None),
    "w_uv": P(None, "tp", None),
}


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_decoder_weights(weights: dict, mesh: Mesh) -> dict:
    """Places a decoder weight pytree on the mesh. Accepts both the
    converted-checkpoint layout ({"layers": [...]}) and the packed scan
    layout ({"layers_segments", "last_layer"}); stacked arrays get an extra
    leading replicated (layer) axis in their spec."""
    def put(x, spec):
        if x is None:
            return None
        from ..ops.quant import QuantizedTensor
        if isinstance(x, QuantizedTensor):
            # .q shards with the weight rule. A per-output-channel .scale is
            # rank-(n-1): it follows the OUTPUT axis of the spec (drop the
            # input axis, the spec's second-to-last entry). qkv P(None,'tp')
            # → scale P('tp'); o_proj P('tp',None) → scale P(None); stacked
            # variants keep their leading replicated layer axis. A GROUPED
            # scale (in/g, out) has the weight's rank and follows the full
            # spec (its group axis shards with the input axis — valid when
            # the per-shard input dim stays a multiple of g, which holds for
            # the g=128 default at every supported head_dim×tp split).
            t = tuple(spec)
            scale_spec = (P(*t) if x.scale.ndim == x.q.ndim
                          else P(*(t[:-2] + t[-1:])))
            return QuantizedTensor(
                q=jax.device_put(x.q, NamedSharding(mesh, spec)),
                scale=jax.device_put(x.scale, NamedSharding(mesh, scale_spec)),
                bits=x.bits, fmt=x.fmt)
        return jax.device_put(x, NamedSharding(mesh, spec))

    def stacked_spec(spec):
        return P(*((None,) + tuple(spec)))

    out = {
        "embed": put(weights["embed"], P("tp", None)),
        "norm": put(weights["norm"], P(None)),
        "lm_head": put(weights["lm_head"], P(None, "tp")),
    }
    if "layers" in weights:
        out["layers"] = [
            {k: put(v, DECODER_WEIGHT_RULES[k]) for k, v in lw.items()}
            for lw in weights["layers"]]
    if "layers_stacked" in weights:
        out["layers_stacked"] = {
            k: put(v, stacked_spec(DECODER_WEIGHT_RULES[k]))
            for k, v in weights["layers_stacked"].items()}
        out["last_layer"] = {
            k: put(v, DECODER_WEIGHT_RULES[k])
            for k, v in weights["last_layer"].items()}
    if "layers_segments" in weights:
        out["layers_segments"] = [
            {k: (v if k == "offset"
                 else put(v, stacked_spec(DECODER_WEIGHT_RULES[k])))
             for k, v in seg.items()}
            for seg in weights["layers_segments"]]
        out["last_layer"] = {
            k: put(v, DECODER_WEIGHT_RULES[k])
            for k, v in weights["last_layer"].items()}
    return out


def shard_kv_cache(cache, mesh: Mesh):
    """(n_layers, n_tensors, n_blocks, block_size, n_kv_heads, head_dim):
    shard the kv-head axis so each chip holds its own heads' pages. Accepts
    the per-layer list layout too (each entry sharded the same way).
    Caches whose head axis does not divide the 'tp' size (MLA: one latent
    head) replicate instead."""
    first = cache[0] if isinstance(cache, (list, tuple)) else cache
    # the head axis interleaves K/V planes (2 per kv head): the shardable
    # unit is n_kv_heads = shape[-2]//2, NOT the combined axis — splitting
    # K from V would be nonsense. Odd head axes (the single-plane MLA
    # latent cache) always replicate.
    heads = first.shape[-2]
    tp = max(1, mesh.shape.get("tp", 1))
    if heads % 2 or (heads // 2) % tp:
        spec = NamedSharding(mesh, P())
    else:
        spec = NamedSharding(mesh, P(None, None, None, None, "tp", None))
    if isinstance(cache, (list, tuple)):
        return [jax.device_put(c, spec) for c in cache]
    return jax.device_put(cache, spec)
