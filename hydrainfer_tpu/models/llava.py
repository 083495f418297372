"""LLaVA-1.5: CLIP tower + 2-layer GELU projector + Llama LM.

Behavioral parity with the reference's LLaVA factory
(reference: hydrainfer/model/llava.py:30-221): feature-select layer -2,
class-token drop, projector to LM hidden, image features overwrite the
<image> token embeddings, chat template, streaming decode.
"""
import json
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .clip import (CLIPVisionConfig, clip_config_from_hf, clip_forward,
                   convert_clip_weights)
from .factory import (ImageProcessor, ImageTokenCalculator,
                      LanguageModelConfig, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .llama import LlamaForCausalLM, convert_llama_weights, decoder_config_from_hf
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore

# llava-1.5 conversation template (vicuna style), used when the tokenizer
# ships no chat template of its own.
LLAVA_CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{% if message.role == 'user' %}USER: {{ message.content }}\n"
    "{% elif message.role == 'assistant' %}ASSISTANT: {{ message.content }}</s>"
    "{% elif message.role == 'system' %}{{ message.content }}\n"
    "{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}ASSISTANT:{% endif %}"
)


class LlavaImageTokenCalculator(ImageTokenCalculator):
    def __init__(self, n_tokens: int):
        self.n_tokens = n_tokens

    def get_num_image_tokens(self, image_size):
        return self.n_tokens


class LlavaVisionModel(VisionModel):
    """CLIP → feature select (drop class token) → MLP projector."""

    # every image is the same (3, H, W) tensor and original_image_sizes is
    # ignored, so the executor may pad the encode batch to pow2 buckets
    # (jit-key convergence; pad rows' features are dropped at scatter)
    fixed_resolution = True

    def __init__(self, weights: dict, clip_cfg: CLIPVisionConfig,
                 select_strategy: str = "default"):
        self.weights = weights
        self.clip_cfg = clip_cfg
        self.select_strategy = select_strategy
        self._jit = jax.jit(self._forward, static_argnames=("return_scores",))

    def _forward(self, weights, pixel_values, return_scores=False):
        hidden, scores = clip_forward(weights["clip"], pixel_values,
                                      self.clip_cfg, return_scores)
        if self.select_strategy == "default":
            hidden = hidden[:, 1:]  # drop class token
        (w1, b1), (w2, b2) = weights["proj1"], weights["proj2"]
        h = jax.nn.gelu(hidden @ w1 + b1, approximate=False)
        return h @ w2 + b2, scores

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        feats, scores = self._jit(self.weights, pixel_values,
                                  params.return_last_layer_attention)
        return VisionModelOutput(image_features=feats, scores=scores)

    # ---- layer-chunked encode (engine/executor.py state machine) ----
    # Splitting the tower across engine steps lets decode windows enter
    # the device queue BETWEEN segments instead of waiting out the whole
    # ViT forward (the head-of-line interference the EPD split exists for;
    # reference motivation: hydrainfer/engine/profiler.py:195-240).

    def encode_segments(self, chunk_layers: int) -> int:
        n = len(self.weights["clip"]["layers"])
        return -(-n // max(1, chunk_layers))

    def forward_embed(self, pixel_values: jax.Array) -> jax.Array:
        if not hasattr(self, "_jit_embed"):
            from .clip import clip_embed
            self._jit_embed = jax.jit(
                lambda w, px: clip_embed(w["clip"], px, self.clip_cfg))
        return self._jit_embed(self.weights, pixel_values)

    def forward_segment(self, hidden: jax.Array, seg: int,
                        chunk_layers: int) -> jax.Array:
        from .clip import clip_run_layers
        layers = self.weights["clip"]["layers"][
            seg * chunk_layers:(seg + 1) * chunk_layers]
        if not hasattr(self, "_jit_seg"):
            # one compile per distinct segment LENGTH (the layer dicts ride
            # as pytree args, so every equal-length segment shares a key)
            self._jit_seg = jax.jit(
                lambda ls, x: clip_run_layers(ls, x, self.clip_cfg)[0])
        return self._jit_seg(layers, hidden)

    def forward_project(self, hidden: jax.Array) -> jax.Array:
        if not hasattr(self, "_jit_proj"):
            def proj(w, h):
                if self.select_strategy == "default":
                    h = h[:, 1:]  # drop class token
                (w1, b1), (w2, b2) = w["proj1"], w["proj2"]
                h = jax.nn.gelu(h @ w1 + b1, approximate=False)
                return h @ w2 + b2
            self._jit_proj = jax.jit(proj)
        return self._jit_proj(self.weights, hidden)


class HFImageProcessorAdapter(ImageProcessor):
    def __init__(self, hf_image_processor):
        self.proc = hf_image_processor

    def process(self, image) -> jax.Array:
        out = self.proc(images=image, return_tensors="np")
        return jnp.asarray(out["pixel_values"][0])


class LlavaModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        self.text_cfg = self.hf_cfg["text_config"]
        if "vocab_size" not in self.text_cfg:
            self.text_cfg["vocab_size"] = self.hf_cfg.get("vocab_size", 32000)
        self.decoder_cfg = decoder_config_from_hf(
            self.text_cfg, config.attention_impl, layer_loop=config.layer_loop)
        self.clip_cfg = clip_config_from_hf(
            self.hf_cfg["vision_config"],
            self.hf_cfg.get("vision_feature_layer", -2))
        self._store = None
        self._lm = None
        self._vm = None

    def _get_store(self) -> WeightStore:
        if self._store is None:
            self._store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
        return self._store

    def _prefixes(self):
        store = self._get_store()
        # transformers >= 4.52 nests everything under "model."; older
        # checkpoints (and the HF hub llava-1.5 weights) use the flat names.
        if store.has("model.language_model.embed_tokens.weight"):
            return "model.language_model.", "model.vision_tower.vision_model.", \
                   "model.multi_modal_projector.", "lm_head"
        return "language_model.model.", "vision_tower.vision_model.", \
               "multi_modal_projector.", "language_model.lm_head"

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            lm_prefix, _, _, head = self._prefixes()
            weights = convert_llama_weights(self._get_store(), self.decoder_cfg,
                                            prefix=lm_prefix, lm_head_name=head)
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self) -> LlavaVisionModel:
        if self._vm is None:
            store = self._get_store()
            _, clip_prefix, proj_prefix, _ = self._prefixes()
            weights = {
                "clip": convert_clip_weights(store, self.clip_cfg, clip_prefix),
                "proj1": store.linear(proj_prefix + "linear_1", bias=True),
                "proj2": store.linear(proj_prefix + "linear_2", bias=True),
            }
            self._vm = LlavaVisionModel(
                weights, self.clip_cfg,
                self.hf_cfg.get("vision_feature_select_strategy", "default"))
        return self._vm

    def getVisionModelConfig(self) -> VisionModelConfig:
        n_tokens = self.clip_cfg.n_patches
        if self.hf_cfg.get("vision_feature_select_strategy", "default") != "default":
            n_tokens += 1
        return VisionModelConfig(
            image_token="<image>",
            image_token_id=self.hf_cfg.get("image_token_index", 32000),
            image_token_calculator=LlavaImageTokenCalculator(n_tokens))

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        eos = self.text_cfg.get("eos_token_id", 2)
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=eos, hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self) -> HFImageProcessorAdapter:
        from transformers import AutoImageProcessor
        return HFImageProcessorAdapter(
            AutoImageProcessor.from_pretrained(self.config.path))

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(self.config.path)
        template = tok.chat_template or LLAVA_CHAT_TEMPLATE
        return HFTokenizerAdapter(tok, chat_template=template)
