"""From-scratch CLIP vision transformer (functional, TPU-first).

Behavioral parity with the reference's CLIP tower
(reference: hydrainfer/model/clip.py:56-138): patch+class+position
embeddings, pre-layernorm, N encoder layers with early exit at the feature
layer, optional last-layer attention scores for focal token pruning.

TPU-first choices: the patch conv is an unfold+matmul (one big MXU matmul
instead of a convolution), attention is dense batched einsum over all images
at once, and the whole tower runs in a single jit.
"""
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.activation import quick_gelu
from ..ops.norm import layer_norm
from .weight_loader import WeightStore


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int
    intermediate_size: int
    n_layers: int            # layers to RUN (early exit applied already)
    n_heads: int
    image_size: int
    patch_size: int
    layer_norm_eps: float = 1e-5

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def clip_config_from_hf(cfg: dict, vision_feature_layer: int = -2) -> CLIPVisionConfig:
    n_total = cfg["num_hidden_layers"]
    # feature_layer -2 == run all but the last layer (hidden_states index)
    n_run = n_total + 1 + vision_feature_layer if vision_feature_layer < 0 else vision_feature_layer
    return CLIPVisionConfig(
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        n_layers=n_run,
        n_heads=cfg["num_attention_heads"],
        image_size=cfg["image_size"],
        patch_size=cfg["patch_size"],
        layer_norm_eps=float(cfg.get("layer_norm_eps", 1e-5)),
    )


def convert_clip_weights(store: WeightStore, cfg: CLIPVisionConfig,
                         prefix: str) -> dict:
    """prefix example: 'model.vision_tower.vision_model.'"""
    p = prefix
    conv = store.get_np(p + "embeddings.patch_embedding.weight")  # (hid, 3, P, P)
    import numpy as np
    patch_w = jnp.asarray(np.ascontiguousarray(
        conv.reshape(conv.shape[0], -1).T))  # (3*P*P, hidden), (c,i,j) order
    w = {
        "patch_embed": patch_w,
        "class_embed": store.get(p + "embeddings.class_embedding"),
        "pos_embed": store.get(p + "embeddings.position_embedding.weight"),
        "pre_norm": (store.get(p + "pre_layrnorm.weight"),
                     store.get(p + "pre_layrnorm.bias")),
        "layers": [],
    }
    for l in range(cfg.n_layers):
        lp = f"{p}encoder.layers.{l}."
        qkv, qkv_b = store.fused_linear(
            [lp + "self_attn.q_proj", lp + "self_attn.k_proj", lp + "self_attn.v_proj"],
            bias=True)
        out_w, out_b = store.linear(lp + "self_attn.out_proj", bias=True)
        fc1_w, fc1_b = store.linear(lp + "mlp.fc1", bias=True)
        fc2_w, fc2_b = store.linear(lp + "mlp.fc2", bias=True)
        w["layers"].append({
            "ln1": (store.get(lp + "layer_norm1.weight"), store.get(lp + "layer_norm1.bias")),
            "qkv": (qkv, qkv_b),
            "out": (out_w, out_b),
            "ln2": (store.get(lp + "layer_norm2.weight"), store.get(lp + "layer_norm2.bias")),
            "fc1": (fc1_w, fc1_b),
            "fc2": (fc2_w, fc2_b),
        })
    return w


def _dense_mha(x: jax.Array, qkv, out, n_heads: int, return_scores: bool
               ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Bidirectional batched MHA: x (N, L, hidden)."""
    N, L, hidden = x.shape
    D = hidden // n_heads
    w, b = qkv
    proj = x @ w + b
    q, k, v = jnp.split(proj, 3, axis=-1)
    q = q.reshape(N, L, n_heads, D)
    k = k.reshape(N, L, n_heads, D)
    v = v.reshape(N, L, n_heads, D)
    scores = jnp.einsum("nqhd,nkhd->nhqk", q.astype(jnp.float32) * (D ** -0.5),
                        k.astype(jnp.float32))
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", p, v.astype(jnp.float32)).astype(x.dtype)
    ow, ob = out
    o = o.reshape(N, L, hidden) @ ow + ob
    return o, (p if return_scores else None)


def clip_embed(weights: dict, pixel_values: jax.Array,
               cfg: CLIPVisionConfig) -> jax.Array:
    """Patch/class/position embeddings + pre-norm:
    (N, 3, H, W) → (N, 1 + n_patches, hidden)."""
    N = pixel_values.shape[0]
    P = cfg.patch_size
    g = cfg.image_size // P
    # unfold into patch vectors in (c, i, j) order, patches row-major
    x = pixel_values.reshape(N, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * P * P)
    x = jnp.dot(x, weights["patch_embed"],
                preferred_element_type=jnp.float32).astype(pixel_values.dtype)
    cls = jnp.broadcast_to(weights["class_embed"], (N, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + weights["pos_embed"][None]
    return layer_norm(x, *weights["pre_norm"], cfg.layer_norm_eps)


def clip_run_layers(layers: list, x: jax.Array, cfg: CLIPVisionConfig,
                    score_layer: int = -1
                    ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Run a SLICE of encoder layers over hidden states (the unit of
    layer-chunked encode — engine/executor.py splits one image's tower
    across steps so an encode never blocks the decode queue for the full
    tower duration). score_layer: local index whose attention scores to
    return (-1 = none)."""
    scores = None
    for l, lw in enumerate(layers):
        h = layer_norm(x, *lw["ln1"], cfg.layer_norm_eps)
        attn, s = _dense_mha(h, lw["qkv"], lw["out"], cfg.n_heads,
                             l == score_layer)
        if s is not None:
            scores = s
        x = x + attn
        h = layer_norm(x, *lw["ln2"], cfg.layer_norm_eps)
        h = quick_gelu(h @ lw["fc1"][0] + lw["fc1"][1])
        x = x + (h @ lw["fc2"][0] + lw["fc2"][1])
    return x, scores


def clip_forward(weights: dict, pixel_values: jax.Array, cfg: CLIPVisionConfig,
                 return_scores: bool = False
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """pixel_values: (N, 3, H, W) → hidden states (N, 1 + n_patches, hidden).

    The class token is position 0 (dropped later by feature select)."""
    x = clip_embed(weights, pixel_values, cfg)
    return clip_run_layers(weights["layers"], x, cfg,
                           score_layer=cfg.n_layers - 1 if return_scores
                           else -1)
