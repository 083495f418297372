"""InternVL2: InternViT + pixel-shuffle downsample + MLP projector + LM.

From-scratch functional equivalent of the reference's InternVL
(reference: hydrainfer/model/internvl.py — InternViT with layer-scale and
optional qk-norm (:24-66 config dataclasses), pixel shuffle (:332-343),
InternLM2 LM with fused wqkv GQA (:185-225), dynamic tiling preprocessor
(:486-559)). Supports both the HF-native InternVL checkpoint naming
(model.vision_tower...) and the original InternVLChatModel naming
(vision_model... / language_model...), including the InternLM2 wqkv layout.
"""
import json
import os
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import layer_norm, rms_norm
from .factory import (ImageProcessor, ImageTokenCalculator,
                      LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .llama import LlamaForCausalLM, convert_llama_weights, decoder_config_from_hf
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore

TILE_BUCKETS = [2, 4, 8, 16, 32]


@dataclass(frozen=True)
class InternViTConfig:
    hidden_size: int
    intermediate_size: int
    n_layers: int
    n_heads: int
    image_size: int
    patch_size: int
    qk_normalization: bool = False
    layer_norm_eps: float = 1e-6
    norm_type: str = "layer_norm"   # 26B uses rms_norm

    @property
    def n_patches_side(self) -> int:
        return self.image_size // self.patch_size


def convert_internvit_weights(store: WeightStore, cfg: InternViTConfig,
                              prefix: str, hf_style: bool) -> dict:
    """hf_style: model.vision_tower.* naming; else original vision_model.*"""
    p = prefix
    if hf_style:
        conv = store.get_np(p + "embeddings.patch_embeddings.projection.weight")
        conv_b = store.get(p + "embeddings.patch_embeddings.projection.bias")
        cls = store.get(p + "embeddings.cls_token").reshape(-1)
        pos = store.get(p + "embeddings.position_embeddings")[0]
    else:
        conv = store.get_np(p + "embeddings.patch_embedding.weight")
        conv_b = store.get(p + "embeddings.patch_embedding.bias")
        cls = store.get(p + "embeddings.class_embedding").reshape(-1)
        pos = store.get(p + "embeddings.position_embedding")[0]
    w = {
        "patch_embed": jnp.asarray(np.ascontiguousarray(
            conv.reshape(conv.shape[0], -1).T)),
        "patch_bias": conv_b,
        "cls": cls,
        "pos": pos,
        "layers": [],
    }
    for i in range(cfg.n_layers):
        if hf_style:
            lp = f"{p}encoder.layer.{i}."
            qkv = store.fused_linear([lp + "attention.q_proj",
                                      lp + "attention.k_proj",
                                      lp + "attention.v_proj"], bias=True)
            lw = {
                "qkv": qkv,
                "proj": store.linear(lp + "attention.projection_layer", bias=True),
                "ls1": store.get(lp + "lambda_1"),
                "ls2": store.get(lp + "lambda_2"),
                "norm1": _norm_pair(store, lp + "layernorm_before", cfg),
                "norm2": _norm_pair(store, lp + "layernorm_after", cfg),
                "fc1": store.linear(lp + "mlp.fc1", bias=True),
                "fc2": store.linear(lp + "mlp.fc2", bias=True),
            }
            if cfg.qk_normalization:
                lw["q_norm"] = store.get(lp + "attention.q_norm.weight")
                lw["k_norm"] = store.get(lp + "attention.k_norm.weight")
        else:
            lp = f"{p}encoder.layers.{i}."
            lw = {
                "qkv": store.linear(lp + "attn.qkv", bias=True),
                "proj": store.linear(lp + "attn.proj", bias=True),
                "ls1": store.get(lp + "ls1"),
                "ls2": store.get(lp + "ls2"),
                "norm1": _norm_pair(store, lp + "norm1", cfg),
                "norm2": _norm_pair(store, lp + "norm2", cfg),
                "fc1": store.linear(lp + "mlp.fc1", bias=True),
                "fc2": store.linear(lp + "mlp.fc2", bias=True),
            }
            if cfg.qk_normalization:
                lw["q_norm"] = store.get(lp + "attn.q_norm.weight")
                lw["k_norm"] = store.get(lp + "attn.k_norm.weight")
        w["layers"].append(lw)
    return w


def _norm_pair(store, name, cfg):
    if store.has(name + ".bias"):
        return (store.get(name + ".weight"), store.get(name + ".bias"))
    return (store.get(name + ".weight"), None)


def _vit_norm(x, pair, cfg):
    w, b = pair
    if b is None:
        return rms_norm(x, w, cfg.layer_norm_eps)
    return layer_norm(x, w, b, cfg.layer_norm_eps)


def internvit_forward(weights: dict, pixel_values: jax.Array,
                      cfg: InternViTConfig) -> jax.Array:
    """pixel_values: (N, 3, S, S) tiles → hidden (N, 1+P², d)."""
    N = pixel_values.shape[0]
    P = cfg.patch_size
    g = cfg.n_patches_side
    x = pixel_values.reshape(N, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, g * g, 3 * P * P)
    x = jnp.dot(x, weights["patch_embed"],
                preferred_element_type=jnp.float32).astype(pixel_values.dtype)
    x = x + weights["patch_bias"]
    cls = jnp.broadcast_to(weights["cls"], (N, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + weights["pos"][None]

    H = cfg.n_heads
    D = cfg.hidden_size // H
    L = x.shape[1]
    for lw in weights["layers"]:
        h = _vit_norm(x, lw["norm1"], cfg)
        qw, qb = lw["qkv"]
        qkv = h @ qw + (qb if qb is not None else 0)
        q, k, v = jnp.split(qkv.reshape(N, L, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if "q_norm" in lw:
            # qk-norm is applied over the flattened head dim (InternViT-6B)
            q = rms_norm(q.reshape(N, L, H * D), lw["q_norm"],
                         cfg.layer_norm_eps).reshape(N, L, H, D)
            k = rms_norm(k.reshape(N, L, H * D), lw["k_norm"],
                         cfg.layer_norm_eps).reshape(N, L, H, D)
        scores = jnp.einsum("nqhd,nkhd->nhqk", q.astype(jnp.float32) * D ** -0.5,
                            k.astype(jnp.float32))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("nhqk,nkhd->nqhd", probs,
                          v.astype(jnp.float32)).astype(x.dtype)
        pw, pb = lw["proj"]
        x = x + (attn.reshape(N, L, H * D) @ pw + pb) * lw["ls1"]
        h = _vit_norm(x, lw["norm2"], cfg)
        f1w, f1b = lw["fc1"]
        f2w, f2b = lw["fc2"]
        x = x + (jax.nn.gelu(h @ f1w + f1b, approximate=False) @ f2w + f2b) * lw["ls2"]
    return x


def pixel_shuffle_downsample(feats: jax.Array, side: int,
                             scale: float = 0.5) -> jax.Array:
    """(N, side², d) → (N, (side*scale)², d/scale²), HF pixel_shuffle-exact."""
    N, _, d = feats.shape
    s = int(1 / scale)
    x = feats.reshape(N, side, side, d)
    x = x.reshape(N, side, side // s, d * s)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(N, side // s, side // s, d * s * s)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(N, (side // s) ** 2, d * s * s)


# ---------------- dynamic tiling (reference: internvl.py:486-559) ----------

def find_closest_aspect_ratio(aspect: float, ratios, width, height, tile_size):
    best, best_diff, area = (1, 1), float("inf"), width * height
    for r in ratios:
        target = r[0] / r[1]
        diff = abs(aspect - target)
        if diff < best_diff or (diff == best_diff
                                and area > 0.5 * tile_size ** 2 * r[0] * r[1]):
            best, best_diff = r, diff
    return best


def dynamic_tile(image, tile_size: int = 448, min_num: int = 1,
                 max_num: int = 12, use_thumbnail: bool = True):
    """Split an image into aspect-preserving tiles (+ optional thumbnail)."""
    ow, oh = image.size
    aspect = ow / oh
    ratios = sorted({(i, j) for n in range(min_num, max_num + 1)
                     for i in range(1, n + 1) for j in range(1, n + 1)
                     if min_num <= i * j <= max_num}, key=lambda r: r[0] * r[1])
    r = find_closest_aspect_ratio(aspect, ratios, ow, oh, tile_size)
    tw, th = tile_size * r[0], tile_size * r[1]
    n_tiles = r[0] * r[1]
    resized = image.resize((tw, th))
    tiles = []
    cols = tw // tile_size
    for i in range(n_tiles):
        x0 = (i % cols) * tile_size
        y0 = (i // cols) * tile_size
        tiles.append(resized.crop((x0, y0, x0 + tile_size, y0 + tile_size)))
    if use_thumbnail and len(tiles) > 1:
        tiles.append(image.resize((tile_size, tile_size)))
    return tiles


class InternVLImageTokenCalculator(ImageTokenCalculator):
    def __init__(self, tokens_per_tile: int, tile_size: int = 448,
                 max_num: int = 12, use_thumbnail: bool = True):
        self.tokens_per_tile = tokens_per_tile
        self.tile_size = tile_size
        self.max_num = max_num
        self.use_thumbnail = use_thumbnail

    def n_tiles(self, image_size: Tuple[int, int]) -> int:
        h, w = image_size
        ratios = sorted({(i, j) for n in range(1, self.max_num + 1)
                         for i in range(1, n + 1) for j in range(1, n + 1)
                         if 1 <= i * j <= self.max_num}, key=lambda r: r[0] * r[1])
        r = find_closest_aspect_ratio(w / h, ratios, w, h, self.tile_size)
        n = r[0] * r[1]
        return n + (1 if self.use_thumbnail and n > 1 else 0)

    def get_num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        return self.n_tiles(image_size) * self.tokens_per_tile


class InternVLVisionModel(VisionModel):
    def __init__(self, weights: dict, vit_cfg: InternViTConfig,
                 downsample_ratio: float = 0.5):
        self.weights = weights      # {"vit", "proj_norm", "proj1", "proj2"}
        self.cfg = vit_cfg
        self.downsample_ratio = downsample_ratio
        self._jit = jax.jit(self._forward)

    def _forward(self, weights, tiles):
        hidden = internvit_forward(weights["vit"], tiles, self.cfg)[:, 1:]
        feats = pixel_shuffle_downsample(hidden, self.cfg.n_patches_side,
                                         self.downsample_ratio)
        x = layer_norm(feats, *weights["proj_norm"])
        (w1, b1), (w2, b2) = weights["proj1"], weights["proj2"]
        x = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return x @ w2 + b2

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        import bisect
        n = pixel_values.shape[0]
        i = bisect.bisect_left(TILE_BUCKETS, n)
        Np = TILE_BUCKETS[i] if i < len(TILE_BUCKETS) else n
        tiles = jnp.pad(pixel_values, ((0, Np - n), (0, 0), (0, 0), (0, 0)))
        feats = self._jit(self.weights, tiles)
        return VisionModelOutput(
            image_features=feats[:n].reshape(1, -1, feats.shape[-1]))


class InternVLImageProcessorAdapter(ImageProcessor):
    def __init__(self, tile_size: int = 448, max_num: int = 12,
                 image_mean=(0.485, 0.456, 0.406),
                 image_std=(0.229, 0.224, 0.225)):
        self.tile_size = tile_size
        self.max_num = max_num
        self.mean = np.asarray(image_mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(image_std, np.float32).reshape(3, 1, 1)

    def process(self, image) -> jax.Array:
        tiles = dynamic_tile(image.convert("RGB"), self.tile_size,
                             max_num=self.max_num)
        arrs = []
        for t in tiles:
            a = np.asarray(t, np.float32).transpose(2, 0, 1) / 255.0
            arrs.append((a - self.mean) / self.std)
        return jnp.asarray(np.stack(arrs))  # (n_tiles, 3, S, S)


def convert_internlm2_weights(store: WeightStore, cfg, prefix: str,
                              lm_head_name: str = "language_model.output") -> dict:
    """Original InternLM2 naming with fused wqkv
    (reference: internvl.py:185-225). wqkv rows are grouped per kv-head:
    [q_0..q_{r-1}, k, v] × n_kv_heads where r = n_qo_heads/n_kv_heads."""
    r = cfg.n_qo_heads // cfg.n_kv_heads
    w = {"embed": store.get(f"{prefix}model.tok_embeddings.weight"), "layers": []}
    for l in range(cfg.n_layers):
        p = f"{prefix}model.layers.{l}."
        wqkv = store.get_np(p + "attention.wqkv.weight")  # ((r+2)*KV*D, hidden)
        kv, D, hid = cfg.n_kv_heads, cfg.head_dim, cfg.hidden_size
        wqkv = wqkv.reshape(kv, r + 2, D, hid)
        q = wqkv[:, :r].reshape(kv * r * D, hid)
        k = wqkv[:, r].reshape(kv * D, hid)
        v = wqkv[:, r + 1].reshape(kv * D, hid)
        fused = jnp.asarray(np.ascontiguousarray(
            np.concatenate([q, k, v], axis=0).T))
        w["layers"].append({
            "qkv_proj": fused,
            "o_proj": store.linear(p + "attention.wo"),
            "gate_up": store.fused_linear([p + "feed_forward.w1",
                                           p + "feed_forward.w3"]),
            "down": store.linear(p + "feed_forward.w2"),
            "input_norm": store.get(p + "attention_norm.weight"),
            "post_norm": store.get(p + "ffn_norm.weight"),
        })
    w["norm"] = store.get(f"{prefix}model.norm.weight")
    w["lm_head"] = store.linear(lm_head_name)
    return w


class InternVLModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        v = self.hf_cfg["vision_config"]
        self.hf_style = (self.hf_cfg.get("model_type") == "internvl")
        self.vit_cfg = InternViTConfig(
            hidden_size=v["hidden_size"],
            intermediate_size=v["intermediate_size"],
            n_layers=v["num_hidden_layers"],
            n_heads=v["num_attention_heads"],
            image_size=(v["image_size"][0] if isinstance(v.get("image_size"), list)
                        else v.get("image_size", 448)),
            patch_size=(v["patch_size"][0] if isinstance(v.get("patch_size"), list)
                        else v.get("patch_size", 14)),
            qk_normalization=bool(v.get("qk_normalization", False)),
            norm_type=v.get("norm_type", "layer_norm"))
        self.downsample_ratio = float(self.hf_cfg.get("downsample_ratio", 0.5))
        text_cfg = self.hf_cfg.get("text_config") or self.hf_cfg.get("llm_config")
        self.text_cfg = text_cfg
        self.lm_type = text_cfg.get("model_type", "llama")
        self.decoder_cfg = decoder_config_from_hf(
            text_cfg, config.attention_impl, layer_loop=config.layer_loop)
        self._store = None
        self._lm = None
        self._vm = None

    def _get_store(self):
        if self._store is None:
            self._store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
        return self._store

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            store = self._get_store()
            if self.lm_type == "internlm2":
                weights = convert_internlm2_weights(store, self.decoder_cfg,
                                                    "language_model.")
            elif store.has("model.language_model.embed_tokens.weight"):
                weights = convert_llama_weights(store, self.decoder_cfg,
                                                prefix="model.language_model.",
                                                lm_head_name="lm_head")
            else:
                weights = convert_llama_weights(store, self.decoder_cfg,
                                                prefix="language_model.model.",
                                                lm_head_name="language_model.lm_head")
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self) -> InternVLVisionModel:
        if self._vm is None:
            store = self._get_store()
            if self.hf_style:
                vprefix = ("model.vision_tower."
                           if store.has("model.vision_tower.embeddings.cls_token")
                           else "vision_tower.")
                proj = ("model.multi_modal_projector."
                        if store.has("model.multi_modal_projector.layer_norm.weight")
                        else "multi_modal_projector.")
                vit = convert_internvit_weights(store, self.vit_cfg,
                                                vprefix, True)
                weights = {
                    "vit": vit,
                    "proj_norm": (store.get(proj + "layer_norm.weight"),
                                  store.get(proj + "layer_norm.bias")),
                    "proj1": store.linear(proj + "linear_1", bias=True),
                    "proj2": store.linear(proj + "linear_2", bias=True),
                }
            else:
                vit = convert_internvit_weights(store, self.vit_cfg,
                                                "vision_model.", False)
                weights = {
                    "vit": vit,
                    "proj_norm": (store.get("mlp1.0.weight"),
                                  store.get("mlp1.0.bias")),
                    "proj1": store.linear("mlp1.1", bias=True),
                    "proj2": store.linear("mlp1.3", bias=True),
                }
            self._vm = InternVLVisionModel(weights, self.vit_cfg,
                                           self.downsample_ratio)
        return self._vm

    def _tokens_per_tile(self) -> int:
        side = self.vit_cfg.n_patches_side
        return int((side * self.downsample_ratio) ** 2)

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig(
            image_token="<image>",
            image_token_id=self.hf_cfg.get("image_token_id",
                                           self.hf_cfg.get("image_token_index", 92546)),
            image_token_calculator=InternVLImageTokenCalculator(
                self._tokens_per_tile(), self.vit_cfg.image_size,
                self.hf_cfg.get("max_dynamic_patch", 12),
                self.hf_cfg.get("use_thumbnail", True)))

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=self.text_cfg.get("eos_token_id", 2),
            hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self) -> InternVLImageProcessorAdapter:
        return InternVLImageProcessorAdapter(
            self.vit_cfg.image_size, self.hf_cfg.get("max_dynamic_patch", 12))

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
