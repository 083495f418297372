"""Model contracts + architecture-dispatched factory.

Behavioral parity with the reference's ModelFactory layer
(reference: hydrainfer/model/model_factory.py:19-158, parameters.py), adapted
to the functional-core design: models hold immutable weight pytrees and
expose pure step functions that thread the paged cache through jit.

The LanguageModelBatch here plays the role of the reference's
LanguageModelParameters (reference: hydrainfer/model/parameters.py:21-29) —
every field is a padded, static-shape device array so the whole step jits.
"""
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import PagedAttentionParams
from ..utils.logger import getLogger

logger = getLogger(__name__)


class ImageTokenCalculator:
    """Number of feature tokens the vision tower emits for an image size."""

    def get_num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        raise NotImplementedError


@dataclass
class VisionModelConfig:
    image_token: str                      # e.g. "<image>"
    image_token_id: int
    image_token_calculator: ImageTokenCalculator


@dataclass
class LanguageModelConfig:
    n_layers: int
    max_position_embeddings: int
    n_qo_heads: int
    n_kv_heads: int
    head_dim: int
    eos_token_id: int
    hidden_size: int = 0
    vocab_size: int = 0


@dataclass
class VisionModelParameters:
    return_last_layer_attention: bool = False
    original_image_sizes: Optional[List[Tuple[int, int]]] = None


@dataclass
class VisionModelOutput:
    image_features: Optional[jax.Array] = None  # (n_images, n_tokens, lm_hidden)
    scores: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LanguageModelBatch:
    """One fill step's device-side inputs (all padded to shape buckets).

    token_ids:        (T,) int32 — image positions carry image_token_id
    positions:        (T,) int32
    image_features:   (Ti, hidden) — features to splice into the embedding
    image_dst_idx:    (Ti,) int32 flat-token index to overwrite; -1 = pad
    attention:        PagedAttentionParams for every layer
    sample_token_idx: (S,) int32 flat-token index whose logits are sampled
                      per sequence; -1 = this slot samples nothing
    """
    token_ids: jax.Array
    positions: jax.Array
    image_features: jax.Array
    image_dst_idx: jax.Array
    attention: PagedAttentionParams
    sample_token_idx: jax.Array


@dataclass
class LanguageModelOutput:
    sample_token_ids: jax.Array = None  # (S,) int32
    cache: jax.Array = None             # the updated (donated) kv cache


class VisionModel:
    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        raise NotImplementedError


class LanguageModel:
    def forward(self, cache: jax.Array, batch: LanguageModelBatch,
                max_q: int) -> LanguageModelOutput:
        raise NotImplementedError


class Tokenizer:
    def encode(self, prompt: str) -> List[int]:
        raise NotImplementedError

    def decode(self, token_id: int) -> str:
        raise NotImplementedError

    def apply_chat_template(self, messages: List[dict]) -> str:
        raise NotImplementedError


class ImageProcessor:
    def process(self, image) -> jax.Array:
        raise NotImplementedError


@dataclass
class ModelParamsCount:
    vision_model_params: int
    language_model_params: int


class ModelFactory:
    def getVisionModel(self) -> VisionModel:
        raise NotImplementedError

    def getLanguageModel(self) -> LanguageModel:
        raise NotImplementedError

    def getVisionModelConfig(self) -> VisionModelConfig:
        raise NotImplementedError

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        raise NotImplementedError

    def getProcessor(self) -> ImageProcessor:
        raise NotImplementedError

    def getTokenizer(self) -> Tokenizer:
        raise NotImplementedError

    def getModelParamsCount(self) -> ModelParamsCount:
        vm = getattr(self.getVisionModel(), "weights", {})
        lm = getattr(self.getLanguageModel(), "weights", {})
        count = lambda tree: sum(x.size for x in jax.tree_util.tree_leaves(tree))
        return ModelParamsCount(count(vm), count(lm))


@dataclass
class ModelFactoryConfig:
    path: str = ""
    name: str = ""                  # "fake" selects the weightless test factory
    dtype: str = "auto"
    # attention implementation: auto | jnp | pallas
    attention_impl: str = "auto"


@dataclass
class ModelFactoryContext:
    mesh: Optional[object] = None   # jax.sharding.Mesh for TP-sharded loading
    sharding_rules: Optional[object] = None


def getModelFactory(config: ModelFactoryConfig,
                    context: Optional[ModelFactoryContext] = None) -> ModelFactory:
    context = context or ModelFactoryContext()
    if config.dtype == "auto":
        config.dtype = "bf16"
        logger.info(f"auto set model dtype to {config.dtype}")

    if config.name == "fake" or not config.path:
        from .fake import FakeModelFactory
        return FakeModelFactory(config, context)

    cfg_path = os.path.join(config.path, "config.json")
    with open(cfg_path, "r", encoding="utf-8") as f:
        json_config = json.load(f)
    architecture = (json_config.get("architectures") or [None])[0]
    model_type = json_config.get("model_type")

    if architecture == "LlavaForConditionalGeneration":
        from .llava import LlavaModelFactory
        return LlavaModelFactory(config, context)
    if architecture == "LlavaNextForConditionalGeneration":
        from .llavanext import LlavaNextModelFactory
        return LlavaNextModelFactory(config, context)
    if architecture == "Qwen2VLForConditionalGeneration":
        from .qwen2_vl import Qwen2VLModelFactory
        return Qwen2VLModelFactory(config, context)
    if architecture == "InternVLChatModel":
        from .internvl import InternVLModelFactory
        return InternVLModelFactory(config, context)
    if model_type == "deepseek_vl_v2":
        from .deepseek_vl2 import DeepSeekVL2ModelFactory
        return DeepSeekVL2ModelFactory(config, context)
    if architecture in ("LlamaForCausalLM", "Qwen2ForCausalLM", "MixtralForCausalLM", "GPT2LMHeadModel"):
        from .text_only import TextOnlyModelFactory
        return TextOnlyModelFactory(config, context)

    raise ValueError(f"unsupported architecture {architecture} / model_type {model_type}")
