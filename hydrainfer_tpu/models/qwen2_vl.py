"""Qwen2-VL: ViT with 2D vision RoPE + patch merger, Qwen2 LM with M-RoPE.

From-scratch functional equivalent of the reference's Qwen2-VL
(reference: hydrainfer/model/qwen2_vl.py:41-190 vision tower with 2D rope
and varlen attention over the patch grid, patch merger), going BEYOND it on
the LM side: the reference reuses standard 1D RoPE (:230-238) so its
multimodal logits diverge from HF; here the LM runs HF-exact M-RoPE
(ops/rope.py:mrope_gather + 3-axis position streams end to end through the
engine), multimodal generation token-exact vs HF.

The vision tower runs as one jitted function over flat patches
(n_patches, temporal*3*patch²) with per-patch 2D rope tables and
image-segment masked attention; patch-count buckets keep the jit cache
small for anyres inputs.
"""
import json
import math
import os
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activation import quick_gelu
from ..ops.attention import mha_varlen
from ..ops.norm import layer_norm
from .factory import (ImageProcessor, ImageTokenCalculator,
                      LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .llama import LlamaForCausalLM, convert_llama_weights, decoder_config_from_hf
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore

PATCH_BUCKETS = [64, 256, 1024, 4096, 16384]


@dataclass(frozen=True)
class Qwen2VisionConfig:
    depth: int
    embed_dim: int
    hidden_size: int        # LM hidden (merger output)
    num_heads: int
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: float = 4.0
    in_channels: int = 3

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """HF Qwen2-VL resize rule: round to multiples of `factor` within the
    pixel budget (reference: qwen2_vl.py:32-39)."""
    h_bar = max(factor, round(height / factor) * factor)
    w_bar = max(factor, round(width / factor) * factor)
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


class Qwen2VLImageTokenCalculator(ImageTokenCalculator):
    def __init__(self, patch_size: int = 14, merge_size: int = 2):
        self.patch_size = patch_size
        self.merge_size = merge_size

    def get_num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        h, w = smart_resize(image_size[0], image_size[1],
                            factor=self.patch_size * self.merge_size)
        return (h // self.patch_size) * (w // self.patch_size) \
            // (self.merge_size ** 2)

    def get_image_grid(self, image_size: Tuple[int, int]):
        """Merged-token (t, h, w) grid for M-RoPE position ladders (the
        merger emits tokens in merged-grid row-major order)."""
        h, w = smart_resize(image_size[0], image_size[1],
                            factor=self.patch_size * self.merge_size)
        return (1, h // self.patch_size // self.merge_size,
                w // self.patch_size // self.merge_size)


def vision_rope_tables(grids: List[Tuple[int, int, int]],
                       head_dim: int, merge_size: int,
                       pad_to: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-patch cos/sin of the 2D rope, in the merged-block patch order the
    HF processor emits. grids: [(t, h, w)] in patches."""
    half = head_dim // 4  # per-axis rotary dims
    inv = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) * 2 / (head_dim // 2)))
    pos_list = []
    for t, h, w in grids:
        hpos = np.arange(h)[:, None] * np.ones((1, w), np.int64)
        wpos = np.ones((h, 1), np.int64) * np.arange(w)[None, :]
        def blockify(p):
            p = p.reshape(h // merge_size, merge_size, w // merge_size, merge_size)
            return p.transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([blockify(hpos), blockify(wpos)], axis=-1)  # (h*w, 2)
        pos_list.append(np.tile(pos, (t, 1)))
    pos = np.concatenate(pos_list, axis=0) if pos_list else np.zeros((0, 2), np.int64)
    freqs = np.concatenate([pos[:, 0:1] * inv[None], pos[:, 1:2] * inv[None]],
                           axis=1)                       # (P, head_dim/2)
    emb = np.concatenate([freqs, freqs], axis=1)          # (P, head_dim)
    cos, sin = np.cos(emb), np.sin(emb)
    if pad_to > len(cos):
        cos = np.pad(cos, ((0, pad_to - len(cos)), (0, 0)), constant_values=1.0)
        sin = np.pad(sin, ((0, pad_to - len(sin)), (0, 0)))
    return cos.astype(np.float32), sin.astype(np.float32)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def convert_qwen2_vision_weights(store: WeightStore, cfg: Qwen2VisionConfig,
                                 prefix: str) -> dict:
    p = prefix
    conv = store.get_np(p + "patch_embed.proj.weight")  # (embed, 3, T, P, P)
    patch_w = jnp.asarray(np.ascontiguousarray(
        conv.reshape(conv.shape[0], -1).T))
    w = {"patch_embed": patch_w, "blocks": []}
    for i in range(cfg.depth):
        bp = f"{p}blocks.{i}."
        w["blocks"].append({
            "ln1": (store.get(bp + "norm1.weight"), store.get(bp + "norm1.bias")),
            "qkv": store.linear(bp + "attn.qkv", bias=True),
            "proj": store.linear(bp + "attn.proj", bias=True),
            "ln2": (store.get(bp + "norm2.weight"), store.get(bp + "norm2.bias")),
            "fc1": store.linear(bp + "mlp.fc1", bias=True),
            "fc2": store.linear(bp + "mlp.fc2", bias=True),
        })
    w["merger"] = {
        "ln_q": (store.get(p + "merger.ln_q.weight"), store.get(p + "merger.ln_q.bias")),
        "mlp0": store.linear(p + "merger.mlp.0", bias=True),
        "mlp2": store.linear(p + "merger.mlp.2", bias=True),
    }
    return w


def qwen2_vision_forward(weights: dict, patches: jax.Array,
                         seq_ids: jax.Array, cos: jax.Array, sin: jax.Array,
                         cfg: Qwen2VisionConfig) -> jax.Array:
    """patches: (P, patch_dim) flat across images, merged-block order;
    seq_ids: (P,) image index per patch (-1 pad); cos/sin: (P, head_dim).
    Returns merged features (P // merge², lm_hidden)."""
    P = patches.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    x = jnp.dot(patches, weights["patch_embed"],
                preferred_element_type=jnp.float32).astype(patches.dtype)
    for bw in weights["blocks"]:
        h = layer_norm(x, *bw["ln1"], 1e-6)
        qkv_w, qkv_b = bw["qkv"]
        qkv = h @ qkv_w + qkv_b
        q, k, v = jnp.split(qkv.reshape(P, 3, H, D), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]
        cf, sf = cos[:, None, :], sin[:, None, :]
        q = (q * cf + _rotate_half(q) * sf).astype(x.dtype)
        k = (k * cf + _rotate_half(k) * sf).astype(x.dtype)
        attn, _ = mha_varlen(q, k, v, seq_ids)
        pw, pb = bw["proj"]
        x = x + (attn.reshape(P, H * D) @ pw + pb)
        h = layer_norm(x, *bw["ln2"], 1e-6)
        f1w, f1b = bw["fc1"]
        f2w, f2b = bw["fc2"]
        x = x + (quick_gelu(h @ f1w + f1b) @ f2w + f2b)

    # merger: 2x2 consecutive patches (merged-block order) → one token
    m = weights["merger"]
    x = layer_norm(x, *m["ln_q"], 1e-6)
    g = cfg.spatial_merge_size ** 2
    x = x.reshape(P // g, g * cfg.embed_dim)
    w0, b0 = m["mlp0"]
    w2, b2 = m["mlp2"]
    x = jax.nn.gelu(x @ w0 + b0, approximate=False)
    return x @ w2 + b2


class Qwen2VLVisionModel(VisionModel):
    def __init__(self, weights: dict, cfg: Qwen2VisionConfig):
        self.weights = weights
        self.cfg = cfg
        self._jit = jax.jit(qwen2_vision_forward, static_argnames=("cfg",))

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        """pixel_values: (total_patches, patch_dim) concatenated across
        images; grids derived from params.original_image_sizes."""
        import bisect
        grids = []
        for (h, w) in params.original_image_sizes:
            rh, rw = smart_resize(h, w, factor=self.cfg.patch_size
                                  * self.cfg.spatial_merge_size)
            grids.append((1, rh // self.cfg.patch_size, rw // self.cfg.patch_size))
        n_patches = sum(t * h * w for t, h, w in grids)
        assert n_patches == pixel_values.shape[0], \
            f"patches {pixel_values.shape[0]} != grids {n_patches}"
        g = self.cfg.spatial_merge_size ** 2
        i = bisect.bisect_left(PATCH_BUCKETS, n_patches)
        P = PATCH_BUCKETS[i] if i < len(PATCH_BUCKETS) else n_patches
        seq_ids = np.full(P, -1, np.int32)
        t0 = 0
        for img, (t, h, w) in enumerate(grids):
            seq_ids[t0:t0 + t * h * w] = img
            t0 += t * h * w
        cos, sin = vision_rope_tables(grids, self.cfg.head_dim,
                                      self.cfg.spatial_merge_size, P)
        patches = jnp.pad(pixel_values, ((0, P - n_patches), (0, 0)))
        feats = self._jit(self.weights, patches, jnp.asarray(seq_ids),
                          jnp.asarray(cos), jnp.asarray(sin), cfg=self.cfg)
        # only the first n_patches/g rows are real; executor writes exactly
        # the cache slots it asked for, so return the valid prefix reshaped
        # as one "image" per request handled upstream
        return VisionModelOutput(image_features=feats[None, : n_patches // g])


class Qwen2VLImageProcessorAdapter(ImageProcessor):
    """Flatten an image into Qwen2-VL patch vectors (merged-block order),
    matching the HF image processor's layout."""

    def __init__(self, cfg: Qwen2VisionConfig,
                 image_mean=(0.48145466, 0.4578275, 0.40821073),
                 image_std=(0.26862954, 0.26130258, 0.27577711)):
        self.cfg = cfg
        self.mean = np.asarray(image_mean, np.float32).reshape(3, 1, 1)
        self.std = np.asarray(image_std, np.float32).reshape(3, 1, 1)

    def process(self, image) -> jax.Array:
        c = self.cfg
        h, w = smart_resize(image.height, image.width,
                            factor=c.patch_size * c.spatial_merge_size)
        img = image.convert("RGB").resize((w, h))
        arr = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        arr = (arr - self.mean) / self.std                     # (3, h, w)
        arr = np.tile(arr[None], (c.temporal_patch_size, 1, 1, 1))  # (T,3,h,w)
        gh, gw = h // c.patch_size, w // c.patch_size
        m, ps = c.spatial_merge_size, c.patch_size
        arr = arr.reshape(c.temporal_patch_size, 3, gh // m, m, ps, gw // m, m, ps)
        # (block_h, block_w, merge_h, merge_w, 3, T, ps, ps) patch-major
        arr = arr.transpose(2, 5, 3, 6, 1, 0, 4, 7)
        patches = arr.reshape(gh * gw, c.in_channels * c.temporal_patch_size * ps * ps)
        return jnp.asarray(patches)


class Qwen2VLModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        v = self.hf_cfg["vision_config"]
        self.vision_cfg = Qwen2VisionConfig(
            depth=v["depth"], embed_dim=v.get("embed_dim", v.get("hidden_size")),
            hidden_size=v.get("hidden_size") or self.hf_cfg["hidden_size"],
            num_heads=v["num_heads"], patch_size=v.get("patch_size", 14),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            mlp_ratio=v.get("mlp_ratio", 4.0))
        text_cfg = dict(self.hf_cfg)
        text_cfg["model_type"] = "qwen2"
        self.decoder_cfg = decoder_config_from_hf(
            text_cfg, config.attention_impl, layer_loop=config.layer_loop)
        # M-RoPE: HF stores the (t, h, w) frequency sections in rope_scaling
        rs = self.hf_cfg.get("rope_scaling") or {}
        self.mrope_section = tuple(rs.get("mrope_section", ()))
        if self.mrope_section:
            import dataclasses
            self.decoder_cfg = dataclasses.replace(
                self.decoder_cfg, mrope_section=self.mrope_section)
        self._store = None
        self._lm = None
        self._vm = None

    def _get_store(self):
        if self._store is None:
            self._store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
        return self._store

    def _prefixes(self):
        if self._get_store().has("model.language_model.embed_tokens.weight"):
            return "model.language_model.", "model.visual.", "lm_head"
        return "model.", "visual.", "lm_head"

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            lm_prefix, _, head = self._prefixes()
            weights = convert_llama_weights(self._get_store(), self.decoder_cfg,
                                            prefix=lm_prefix, lm_head_name=head)
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self) -> Qwen2VLVisionModel:
        if self._vm is None:
            _, vprefix, _ = self._prefixes()
            weights = convert_qwen2_vision_weights(self._get_store(),
                                                   self.vision_cfg, vprefix)
            self._vm = Qwen2VLVisionModel(weights, self.vision_cfg)
        return self._vm

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig(
            image_token="<|vision_start|><|image_pad|><|vision_end|>",
            image_token_id=self.hf_cfg.get("image_token_id", 151655),
            image_token_calculator=Qwen2VLImageTokenCalculator(
                self.vision_cfg.patch_size, self.vision_cfg.spatial_merge_size))

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=self.hf_cfg.get("eos_token_id", 151645),
            hidden_size=c.hidden_size, vocab_size=c.vocab_size,
            mrope_section=self.mrope_section)

    def getProcessor(self) -> Qwen2VLImageProcessorAdapter:
        return Qwen2VLImageProcessorAdapter(self.vision_cfg)

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
