"""LLaVA-NeXT (1.6): anyres tiling — base tile + grid tiles, spatial unpad,
newline tokens.

Behavioral parity with the reference's LLaVA-NeXT
(reference: hydrainfer/model/llavanext.py:19-52 resolution-dependent token
count, :99-125 `_merge_image_patch_embeddings` spatial unpad + newline):
the CLIP tower runs over all tiles in one jitted batch; the per-image merge
(grid reshape → unpad → newline column → flatten, HF-exact) is thin host
orchestration of device ops since tile counts are dynamic by design.
"""
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .clip import clip_forward
from .factory import (ImageTokenCalculator, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .llava import HFImageProcessorAdapter, LlavaModelFactory

TILE_BUCKETS = [4, 8, 16, 32, 64]


def select_best_resolution(original_hw: Tuple[int, int],
                           pinpoints: Sequence[Sequence[int]]) -> Tuple[int, int]:
    """Max effective resolution, then min waste (HF-exact)."""
    oh, ow = original_hw
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = h * w - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


def anyres_geometry(original_hw: Tuple[int, int],
                    pinpoints: Sequence[Sequence[int]],
                    tile_size: int, n_side: int):
    """→ (grid_h, grid_w, unpadded_h, unpadded_w) in feature cells."""
    best_h, best_w = select_best_resolution(original_hw, pinpoints)
    gh, gw = best_h // tile_size, best_w // tile_size
    cur_h, cur_w = gh * n_side, gw * n_side
    oh, ow = original_hw
    if ow / oh > cur_w / cur_h:
        scale = cur_w / ow
        new_h = int(round(oh * scale, 7))
        pad = (cur_h - new_h) // 2
        return gh, gw, cur_h - 2 * pad, cur_w
    scale = cur_h / oh
    new_w = int(round(ow * scale, 7))
    pad = (cur_w - new_w) // 2
    return gh, gw, cur_h, cur_w - 2 * pad


class LlavaNextImageTokenCalculator(ImageTokenCalculator):
    def __init__(self, pinpoints, tile_size: int, n_side: int):
        self.pinpoints = pinpoints
        self.tile_size = tile_size
        self.n_side = n_side

    def get_num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        gh, gw, uh, uw = anyres_geometry(image_size, self.pinpoints,
                                         self.tile_size, self.n_side)
        return self.n_side ** 2 + uh * (uw + 1)


class LlavaNextVisionModel(VisionModel):
    """CLIP over all tiles → per-image anyres merge."""

    def __init__(self, weights: dict, clip_cfg, pinpoints,
                 select_strategy: str = "default"):
        self.weights = weights       # {"clip", "proj1", "proj2", "newline"}
        self.clip_cfg = clip_cfg
        self.pinpoints = pinpoints
        self.select_strategy = select_strategy
        self.n_side = clip_cfg.image_size // clip_cfg.patch_size
        self._jit = jax.jit(self._tiles_forward)

    def _tiles_forward(self, weights, pixel_values):
        hidden, _ = clip_forward(weights["clip"], pixel_values, self.clip_cfg)
        if self.select_strategy == "default":
            hidden = hidden[:, 1:]
        (w1, b1), (w2, b2) = weights["proj1"], weights["proj2"]
        h = jax.nn.gelu(hidden @ w1 + b1, approximate=False)
        return h @ w2 + b2                      # (n_tiles, n_side², lm_hidden)

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        """pixel_values: (total_tiles, 3, S, S) concatenated per image; the
        per-image tile counts derive from original_image_sizes."""
        import bisect
        sizes = params.original_image_sizes
        tile_counts = []
        for hw in sizes:
            gh, gw, _, _ = anyres_geometry(hw, self.pinpoints,
                                           self.clip_cfg.image_size, self.n_side)
            tile_counts.append(1 + gh * gw)
        total = sum(tile_counts)
        assert total == pixel_values.shape[0], \
            f"tiles {pixel_values.shape[0]} != expected {total}"
        i = bisect.bisect_left(TILE_BUCKETS, total)
        Np = TILE_BUCKETS[i] if i < len(TILE_BUCKETS) else total
        tiles = jnp.pad(pixel_values, ((0, Np - total), (0, 0), (0, 0), (0, 0)))
        feats = self._jit(self.weights, tiles)   # (Np, n_side², d)

        merged = []
        t0 = 0
        for hw, n_tiles in zip(sizes, tile_counts):
            merged.append(self._merge(feats[t0:t0 + n_tiles], hw))
            t0 += n_tiles
        out = jnp.concatenate(merged, axis=0)
        return VisionModelOutput(image_features=out[None])

    def _merge(self, tile_feats: jax.Array, original_hw) -> jax.Array:
        """(1+gh*gw, n_side², d) → (n_tokens, d), HF pack_image_features-exact."""
        n = self.n_side
        d = tile_feats.shape[-1]
        gh, gw, uh, uw = anyres_geometry(original_hw, self.pinpoints,
                                         self.clip_cfg.image_size, n)
        base = tile_feats[0]
        grid = tile_feats[1:1 + gh * gw].reshape(gh, gw, n, n, d)
        grid = grid.transpose(0, 2, 1, 3, 4).reshape(gh * n, gw * n, d)
        # unpad (centered crop to the original aspect ratio)
        top = (gh * n - uh) // 2
        left = (gw * n - uw) // 2
        grid = grid[top:top + uh, left:left + uw]
        newline = jnp.broadcast_to(self.weights["newline"].astype(grid.dtype),
                                   (uh, 1, d))
        grid = jnp.concatenate([grid, newline], axis=1).reshape(uh * (uw + 1), d)
        return jnp.concatenate([base, grid], axis=0)


class LlavaNextModelFactory(LlavaModelFactory):
    """Extends the LLaVA factory with anyres vision."""

    def __init__(self, config, context):
        super().__init__(config, context)
        self.pinpoints = self.hf_cfg.get("image_grid_pinpoints") or [
            [336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]

    def getVisionModel(self) -> LlavaNextVisionModel:
        if self._vm is None:
            store = self._get_store()
            _, clip_prefix, proj_prefix, _ = self._prefixes()
            from .clip import convert_clip_weights
            newline_name = ("model.image_newline"
                            if store.has("model.image_newline") else "image_newline")
            weights = {
                "clip": convert_clip_weights(store, self.clip_cfg, clip_prefix),
                "proj1": store.linear(proj_prefix + "linear_1", bias=True),
                "proj2": store.linear(proj_prefix + "linear_2", bias=True),
                "newline": store.get(newline_name),
            }
            self._vm = LlavaNextVisionModel(
                weights, self.clip_cfg, self.pinpoints,
                self.hf_cfg.get("vision_feature_select_strategy", "default"))
        return self._vm

    def getVisionModelConfig(self) -> VisionModelConfig:
        n_side = self.clip_cfg.image_size // self.clip_cfg.patch_size
        return VisionModelConfig(
            image_token="<image>",
            image_token_id=self.hf_cfg.get("image_token_index", 32000),
            image_token_calculator=LlavaNextImageTokenCalculator(
                self.pinpoints, self.clip_cfg.image_size, n_side))

    def getProcessor(self) -> HFImageProcessorAdapter:
        from transformers.models.llava_next.image_processing_llava_next import (
            LlavaNextImageProcessor)
        try:
            from transformers import AutoImageProcessor
            proc = AutoImageProcessor.from_pretrained(self.config.path)
        except Exception:
            s = self.clip_cfg.image_size
            proc = LlavaNextImageProcessor(
                image_grid_pinpoints=[list(p) for p in self.pinpoints],
                size={"shortest_edge": s}, crop_size={"height": s, "width": s})
        return HFImageProcessorAdapter(proc)
