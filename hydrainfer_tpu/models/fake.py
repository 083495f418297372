"""Weightless fake models for engine/scheduler tests and profiling.

Behavioral parity with the reference's fake backend
(reference: hydrainfer/model/fake.py:27-90): instant deterministic-random
outputs with the real contracts, so the engine path runs without weights.
"""
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .factory import (ImageProcessor, ImageTokenCalculator, LanguageModel,
                      LanguageModelBatch, LanguageModelConfig,
                      LanguageModelOutput, ModelFactory, ModelFactoryConfig,
                      ModelFactoryContext, VisionModel, VisionModelConfig,
                      VisionModelOutput, VisionModelParameters)
from .tokenizer import SimpleTokenizer


@dataclass
class FakeConfig:
    image_token: str = "<image>"
    image_token_id: int = 9
    num_image_tokens: int = 16
    n_layers: int = 2
    max_position_embeddings: int = 4096
    hidden_size: int = 64
    n_qo_heads: int = 4
    n_kv_heads: int = 2
    head_dim: int = 16
    vocab_size: int = 1000
    eos_token_id: int = 2
    image_size: int = 32


class _FixedImageTokens(ImageTokenCalculator):
    def __init__(self, n: int):
        self.n = n

    def get_num_image_tokens(self, image_size):
        return self.n


class FakeVisionModel(VisionModel):
    def __init__(self, cfg: FakeConfig):
        self.cfg = cfg
        self.weights = {}

    def forward(self, pixel_values, params: VisionModelParameters) -> VisionModelOutput:
        n_images = pixel_values.shape[0]
        key = jax.random.PRNGKey(n_images)
        feats = jax.random.normal(
            key, (n_images, self.cfg.num_image_tokens, self.cfg.hidden_size),
            dtype=jnp.float32)
        return VisionModelOutput(image_features=feats)


class FakeLanguageModel(LanguageModel):
    def __init__(self, cfg: FakeConfig):
        self.cfg = cfg
        self.weights = {}
        self._rng = np.random.default_rng(0)

    def forward(self, cache, token_table, batch: LanguageModelBatch,
                max_q: int) -> LanguageModelOutput:
        n_seqs = batch.sample_token_idx.shape[0]
        # deterministic but varied: derive from batch content
        seed = int(np.asarray(batch.token_ids).sum()) % (2 ** 31)
        tokens = np.random.default_rng(seed).integers(
            10, self.cfg.vocab_size, size=(n_seqs,), dtype=np.int32)
        tokens = jnp.asarray(tokens)
        if token_table is not None:
            dst = jnp.where(batch.sample_dst_slots < 0, token_table.shape[0],
                            batch.sample_dst_slots)
            token_table = token_table.at[dst].set(tokens, mode="drop")
        return LanguageModelOutput(
            sample_token_ids=tokens, cache=cache, token_table=token_table)

    def forward_flat(self, cache, token_table, flat, image_cache, dims,
                     n_steps: int = 1, fused_k=None) -> LanguageModelOutput:
        seed = int(np.asarray(flat[:dims.T]).sum()) % (2 ** 31)
        tokens = np.random.default_rng(seed).integers(
            10, self.cfg.vocab_size, size=(dims.S,), dtype=np.int32)
        is_ref = isinstance(cache, jax.Ref) or (
            isinstance(cache, (list, tuple)) and len(cache) > 0
            and isinstance(cache[0], jax.Ref))
        cache_out = None if is_ref else cache
        return LanguageModelOutput(sample_token_ids=jnp.asarray(tokens),
                                   cache=cache_out, token_table=token_table)


class FakeImageProcessor(ImageProcessor):
    def __init__(self, cfg: FakeConfig):
        self.cfg = cfg

    def process(self, image):
        arr = np.asarray(image.resize((self.cfg.image_size, self.cfg.image_size)),
                         dtype=np.float32)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        return jnp.asarray(arr.transpose(2, 0, 1) / 255.0)


class FakeModelFactory(ModelFactory):
    def __init__(self, config: ModelFactoryConfig = None,
                 context: ModelFactoryContext = None,
                 fake_config: FakeConfig = None):
        self.cfg = fake_config or FakeConfig()

    def getVisionModel(self) -> FakeVisionModel:
        return FakeVisionModel(self.cfg)

    def getLanguageModel(self) -> FakeLanguageModel:
        return FakeLanguageModel(self.cfg)

    def getVisionModelConfig(self) -> VisionModelConfig:
        return VisionModelConfig(
            image_token=self.cfg.image_token,
            image_token_id=self.cfg.image_token_id,
            image_token_calculator=_FixedImageTokens(self.cfg.num_image_tokens))

    def getLanguageModelConfig(self) -> LanguageModelConfig:
        c = self.cfg
        return LanguageModelConfig(
            n_layers=c.n_layers,
            max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads,
            n_kv_heads=c.n_kv_heads,
            head_dim=c.head_dim,
            eos_token_id=c.eos_token_id,
            hidden_size=c.hidden_size,
            vocab_size=c.vocab_size)

    def getProcessor(self) -> FakeImageProcessor:
        return FakeImageProcessor(self.cfg)

    def getTokenizer(self) -> SimpleTokenizer:
        return SimpleTokenizer(self.cfg.image_token, self.cfg.image_token_id,
                               self.cfg.eos_token_id)
