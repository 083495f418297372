"""Factory for text-only decoder checkpoints (Llama, Qwen2, ...).

Used for LM-only nodes and HF-logit-comparison tests; the vision contract
returns None like the reference's text-only paths.
"""
import json
import os

from .factory import (ImageTokenCalculator, LanguageModelConfig, ModelFactory,
                      ModelFactoryConfig, ModelFactoryContext,
                      VisionModelConfig)
from .llama import LlamaForCausalLM, convert_llama_weights, decoder_config_from_hf
from .tokenizer import HFTokenizerAdapter
from .weight_loader import WeightStore


class _NoImages(ImageTokenCalculator):
    def get_num_image_tokens(self, image_size):
        return 0


class TextOnlyModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig, context: ModelFactoryContext):
        self.config = config
        with open(os.path.join(config.path, "config.json")) as f:
            self.hf_cfg = json.load(f)
        self.decoder_cfg = decoder_config_from_hf(self.hf_cfg, config.attention_impl,
                                                  layer_loop=config.layer_loop)
        self._lm = None

    def getLanguageModel(self) -> LlamaForCausalLM:
        if self._lm is None:
            store = WeightStore(self.config.path, cast_dtype=self.config.dtype)
            weights = convert_llama_weights(store, self.decoder_cfg)
            store.assert_consumed()
            self._lm = LlamaForCausalLM(weights, self.decoder_cfg,
                                        self.config.quantization,
                                        kv_scale=(self.config.kv_scale if self.config.kv_cache_dtype == 'int8' else None))
        return self._lm

    def getVisionModel(self):
        return None

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig(image_token="", image_token_id=-1,
                                 image_token_calculator=_NoImages())

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.decoder_cfg
        return LanguageModelConfig(
            n_layers=c.n_layers,
            max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads,
            n_kv_heads=c.n_kv_heads,
            head_dim=c.head_dim,
            eos_token_id=self.hf_cfg.get("eos_token_id", 2),
            hidden_size=c.hidden_size,
            vocab_size=c.vocab_size,
        )

    def getProcessor(self):
        return None

    def getTokenizer(self) -> HFTokenizerAdapter:
        from transformers import AutoTokenizer
        return HFTokenizerAdapter(AutoTokenizer.from_pretrained(self.config.path))
