"""DeepSeek-VL2: SigLIP ViT + downsample MLP projector + DeepSeek MoE LM.

From-scratch functional equivalent of the reference's DeepSeek-VL2
(reference: hydrainfer/model/deepseek_vl2.py — timm SigLIP tower, 2x2
token-downsample MlpProjector (:51-100), global+local tile merge with
image_newline / view_separator embeddings (:148-240), tile-based token
calculator (:26-48); vendored processor under transformers_utils/). The
processor (aspect-ratio tiling + global view) is implemented directly.
"""
import json
import math
import os
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norm import layer_norm
from .deepseek_v3 import DeepSeekModelFactory, convert_deepseek_weights, deepseek_decoder_config
from .factory import (ImageProcessor, ImageTokenCalculator,
                      LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .llama import LlamaForCausalLM
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore

TILE_BUCKETS = [2, 4, 8, 16, 32]


@dataclass(frozen=True)
class SigLIPConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    n_layers: int = 27
    n_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

    @property
    def n_patches_side(self) -> int:
        # timm dynamic_img_pad pads 384/14 → 28 patches per side
        return math.ceil(self.image_size / self.patch_size)


def convert_siglip_weights(store: WeightStore, cfg: SigLIPConfig,
                           prefix: str = "vision.") -> dict:
    p = prefix
    conv = store.get_np(p + "patch_embed.proj.weight")  # (d, 3, P, P)
    w = {
        "patch_embed": jnp.asarray(np.ascontiguousarray(
            conv.reshape(conv.shape[0], -1).T)),
        "patch_bias": store.get(p + "patch_embed.proj.bias"),
        "pos": store.get(p + "pos_embed")[0],
        "layers": [],
        "norm": (store.get(p + "norm.weight"), store.get(p + "norm.bias")),
    }
    for i in range(cfg.n_layers):
        lp = f"{p}blocks.{i}."
        w["layers"].append({
            "ln1": (store.get(lp + "norm1.weight"), store.get(lp + "norm1.bias")),
            "qkv": store.linear(lp + "attn.qkv", bias=True),
            "proj": store.linear(lp + "attn.proj", bias=True),
            "ln2": (store.get(lp + "norm2.weight"), store.get(lp + "norm2.bias")),
            "fc1": store.linear(lp + "mlp.fc1", bias=True),
            "fc2": store.linear(lp + "mlp.fc2", bias=True),
        })
    return w


def siglip_forward(weights: dict, pixel_values: jax.Array,
                   cfg: SigLIPConfig) -> jax.Array:
    """(N, 3, S, S) tiles → patch tokens (N, n_side², d). No class token."""
    N = pixel_values.shape[0]
    P = cfg.patch_size
    g = cfg.n_patches_side
    pad = g * P - cfg.image_size
    x = pixel_values
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, pad)))
    x = x.reshape(N, 3, g, P, g, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(N, g * g, 3 * P * P)
    x = jnp.dot(x, weights["patch_embed"],
                preferred_element_type=jnp.float32).astype(pixel_values.dtype)
    x = x + weights["patch_bias"] + weights["pos"][None]

    H = cfg.n_heads
    D = cfg.hidden_size // H
    L = x.shape[1]
    for lw in weights["layers"]:
        h = layer_norm(x, *lw["ln1"], cfg.layer_norm_eps)
        qw, qb = lw["qkv"]
        qkv = h @ qw + qb
        q, k, v = jnp.split(qkv.reshape(N, L, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        s = jnp.einsum("nqhd,nkhd->nhqk", q.astype(jnp.float32) * D ** -0.5,
                       k.astype(jnp.float32))
        probs = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("nhqk,nkhd->nqhd", probs,
                          v.astype(jnp.float32)).astype(x.dtype)
        pw, pb = lw["proj"]
        x = x + (attn.reshape(N, L, H * D) @ pw + pb)
        h = layer_norm(x, *lw["ln2"], cfg.layer_norm_eps)
        f1w, f1b = lw["fc1"]
        f2w, f2b = lw["fc2"]
        x = x + (jax.nn.gelu((h @ f1w + f1b).astype(jnp.float32),
                             approximate=True).astype(x.dtype) @ f2w + f2b)
    return layer_norm(x, *weights["norm"], cfg.layer_norm_eps)


def mlp_projector_forward(weights: List, feats: jax.Array,
                          downsample: int = 2) -> jax.Array:
    """(N, hw, d) → 2x2-concat downsample → MLP → (N, hw/4, n_embed)
    (reference: deepseek_vl2.py:51-100)."""
    N, hw, d = feats.shape
    side = int(hw ** 0.5)
    pad = (downsample - side % downsample) % downsample
    x = feats.reshape(N, side, side, d)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    s = side + pad
    # unfold k=stride=downsample, channel-major patch vector like F.unfold:
    # for each output cell, the vector is [c-major over (dy, dx)] → we build
    # (N, s/ds, ds, s/ds, ds, d) → (N, cells, ds*ds*d) with (dy,dx) minor
    x = x.reshape(N, s // downsample, downsample, s // downsample, downsample, d)
    x = x.transpose(0, 1, 3, 5, 2, 4)     # (N, gy, gx, d, dy, dx) — c-major
    x = x.reshape(N, (s // downsample) ** 2, d * downsample * downsample)
    for i, (w, b) in enumerate(weights):
        if i > 0:
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(feats.dtype)
        x = x @ w + b
    return x


class DeepSeekVL2ImageTokenCalculator(ImageTokenCalculator):
    def __init__(self, candidate_resolutions, image_size: int = 384,
                 patch_size: int = 14, downsample_ratio: int = 2):
        self.candidates = candidate_resolutions
        self.image_size = image_size
        self.h = math.ceil((image_size // patch_size) / downsample_ratio)

    def select_best_resolution(self, wh: Tuple[int, int]) -> Tuple[int, int]:
        """(width, height) → best (width, height) from the candidates
        (max effective, min waste — reference processor semantics)."""
        ow, oh = wh
        best, best_eff, best_waste = None, 0, float("inf")
        for bw, bh in self.candidates:
            scale = min(bw / ow, bh / oh)
            eff = min(int(ow * scale) * int(oh * scale), ow * oh)
            waste = bw * bh - eff
            if eff > best_eff or (eff == best_eff and waste < best_waste):
                best, best_eff, best_waste = (bw, bh), eff, waste
        return best

    def tiles(self, image_size: Tuple[int, int]) -> Tuple[int, int]:
        height, width = image_size
        bw, bh = self.select_best_resolution((width, height))
        return bw // self.image_size, bh // self.image_size

    def get_num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        nw, nh = self.tiles(image_size)
        h = w = self.h
        return h * (w + 1) + (nh * h) * (nw * w + 1) + 1


class DeepSeekVL2VisionModel(VisionModel):
    def __init__(self, weights: dict, cfg: SigLIPConfig,
                 calculator: DeepSeekVL2ImageTokenCalculator,
                 downsample: int = 2, global_view_pos: str = "head"):
        self.weights = weights    # {"vit", "proj" [(w,b)...], "newline", "view_sep"}
        self.cfg = cfg
        self.calc = calculator
        self.downsample = downsample
        self.global_view_pos = global_view_pos
        self._jit = jax.jit(self._forward)

    def _forward(self, weights, tiles):
        feats = siglip_forward(weights["vit"], tiles, self.cfg)
        return mlp_projector_forward(weights["proj"], feats, self.downsample)

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        import bisect
        n = pixel_values.shape[0]
        i = bisect.bisect_left(TILE_BUCKETS, n)
        Np = TILE_BUCKETS[i] if i < len(TILE_BUCKETS) else n
        tiles = jnp.pad(pixel_values, ((0, Np - n), (0, 0), (0, 0), (0, 0)))
        embeds = self._jit(self.weights, tiles)     # (Np, hw/4, D)
        h = w = int(embeds.shape[1] ** 0.5)
        d = embeds.shape[-1]
        newline = self.weights["newline"].astype(embeds.dtype)
        view_sep = self.weights["view_sep"].astype(embeds.dtype)

        out = []
        tile_idx = 0
        for hw_size in params.original_image_sizes:
            nw, nh = self.calc.tiles(hw_size)
            g = embeds[tile_idx].reshape(h, w, d)
            g = jnp.concatenate(
                [g, jnp.broadcast_to(newline, (h, 1, d))], axis=1).reshape(-1, d)
            local = embeds[tile_idx + 1: tile_idx + 1 + nw * nh]
            tile_idx += 1 + nw * nh
            local = local.reshape(nh, nw, h, w, d).transpose(0, 2, 1, 3, 4)
            local = local.reshape(nh * h, nw * w, d)
            local = jnp.concatenate(
                [local, jnp.broadcast_to(newline, (nh * h, 1, d))],
                axis=1).reshape(-1, d)
            if self.global_view_pos == "head":
                merged = jnp.concatenate([g, view_sep[None], local], axis=0)
            else:
                merged = jnp.concatenate([local, view_sep[None], g], axis=0)
            out.append(merged)
        return VisionModelOutput(
            image_features=jnp.concatenate(out, axis=0)[None])


class DeepSeekVL2ImageProcessorAdapter(ImageProcessor):
    """Global 384 view + aspect-ratio local tiles, mean-padded
    (reference: transformers_utils/deepseek_vl2_processor.py behavior)."""

    def __init__(self, calculator: DeepSeekVL2ImageTokenCalculator,
                 image_mean=(0.5, 0.5, 0.5), image_std=(0.5, 0.5, 0.5)):
        self.calc = calculator
        self.mean = np.asarray(image_mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(image_std, np.float32).reshape(3, 1, 1)

    def _fit_pad(self, image, tw: int, th: int):
        from PIL import Image as PILImage
        ow, oh = image.size
        scale = min(tw / ow, th / oh)
        nw, nh = max(1, int(ow * scale)), max(1, int(oh * scale))
        resized = image.resize((nw, nh))
        canvas = PILImage.new("RGB", (tw, th),
                              tuple(int(m * 255) for m in self.mean[:, 0, 0]))
        canvas.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
        return canvas

    def _to_array(self, img):
        a = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        return (a - self.mean) / self.std

    def process(self, image) -> jax.Array:
        image = image.convert("RGB")
        s = self.calc.image_size
        bw, bh = self.calc.select_best_resolution(image.size)
        views = [self._to_array(self._fit_pad(image, s, s))]   # global first
        tiled = self._fit_pad(image, bw, bh)
        for ty in range(bh // s):
            for tx in range(bw // s):
                views.append(self._to_array(
                    tiled.crop((tx * s, ty * s, (tx + 1) * s, (ty + 1) * s))))
        return jnp.asarray(np.stack(views))


class DeepSeekVL2ModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        v = self.hf_cfg.get("vision_config", {})
        params = v.get("params", v)
        self.vit_cfg = SigLIPConfig(
            hidden_size=params.get("width", params.get("hidden_size", 1152)),
            intermediate_size=params.get("intermediate_size",
                                         int(params.get("width", 1152) * 3.7362)),
            n_layers=params.get("layers", params.get("num_hidden_layers", 27)),
            n_heads=params.get("heads", params.get("num_attention_heads", 16)),
            image_size=params.get("image_size", 384),
            patch_size=params.get("patch_size", 14))
        proj = self.hf_cfg.get("projector_config", {})
        self.proj_depth = proj.get("depth", 2)
        self.downsample = proj.get("downsample_ratio", 2)
        self.n_embed = proj.get("n_embed", 1280)
        self.candidates = self.hf_cfg.get(
            "candidate_resolutions", [[384, 384], [384, 768], [768, 384],
                                      [768, 768], [384, 1152], [1152, 384]])
        self.text_cfg = self.hf_cfg.get("language_config",
                                        self.hf_cfg.get("text_config", {}))
        self.decoder_cfg = deepseek_decoder_config(
            self.text_cfg, config.attention_impl, layer_loop=config.layer_loop)
        self._store = None
        self._lm = None
        self._vm = None

    def _get_store(self):
        if self._store is None:
            self._store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
        return self._store

    def _calculator(self) -> DeepSeekVL2ImageTokenCalculator:
        return DeepSeekVL2ImageTokenCalculator(
            self.candidates, self.vit_cfg.image_size, self.vit_cfg.patch_size,
            self.downsample)

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            weights = convert_deepseek_weights(
                self._get_store(), self.decoder_cfg, self.text_cfg,
                prefix="language.model.", lm_head_name="language.lm_head")
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self) -> DeepSeekVL2VisionModel:
        if self._vm is None:
            store = self._get_store()
            n_mid = self.n_embed * self.hf_cfg.get("projector_config", {}).get("mlp_ratio", 1)
            proj_layers = []
            for i in range(0, 2 * self.proj_depth - 1, 2):
                proj_layers.append(store.linear(f"projector.layers.{i}", bias=True))
            weights = {
                "vit": convert_siglip_weights(store, self.vit_cfg, "vision."),
                "proj": proj_layers,
                "newline": store.get("image_newline"),
                "view_sep": store.get("view_seperator"),
            }
            self._vm = DeepSeekVL2VisionModel(
                weights, self.vit_cfg, self._calculator(), self.downsample,
                self.hf_cfg.get("global_view_pos", "head"))
        return self._vm

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig(
            image_token="<image>",
            image_token_id=self.hf_cfg.get("image_token_id", 128815),
            image_token_calculator=self._calculator())

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=self.text_cfg.get("eos_token_id", 1),
            hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self) -> DeepSeekVL2ImageProcessorAdapter:
        return DeepSeekVL2ImageProcessorAdapter(self._calculator())

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
