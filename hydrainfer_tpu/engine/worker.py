"""Model execution worker (reference: hydrainfer/engine/worker.py).

In the single-controller design one process owns all chips, so the worker is
an in-process object; tensor parallelism is expressed through weight
shardings on the node's mesh (parallel/), not through worker processes —
this supersedes the reference's RayWorker TP path (which its own engine
never enabled, reference: worker.py:115-119).
"""
from dataclasses import dataclass, field
from typing import Optional

from ..models.factory import (LanguageModel, ModelFactory, VisionModel,
                              VisionModelOutput, VisionModelParameters)


@dataclass
class WorkerConfig:
    enable_vision: bool = True
    enable_language: bool = True


class Worker:
    def supports_multi_step(self) -> bool:
        """Whether execute_language_model accepts n_steps>1 (fused
        multi-step decode). The executor clamps its window to 1 otherwise."""
        return False

    def execute_vision_model(self, pixel_values, params) -> VisionModelOutput:
        raise NotImplementedError

    def execute_language_model(self, cache, token_table, flat, image_cache,
                               dims, n_steps: int = 1, fused_k=None):
        raise NotImplementedError


class VanillaWorker(Worker):
    def __init__(self, config: WorkerConfig, model_factory: ModelFactory):
        self.vision_model: Optional[VisionModel] = (
            model_factory.getVisionModel() if config.enable_vision else None)
        self.language_model: Optional[LanguageModel] = (
            model_factory.getLanguageModel() if config.enable_language else None)

    def supports_multi_step(self) -> bool:
        return bool(getattr(self.language_model, "supports_multi_step",
                            False))

    def execute_vision_model(self, pixel_values,
                             params: VisionModelParameters) -> VisionModelOutput:
        return self.vision_model.forward(pixel_values, params)

    def execute_language_model(self, cache, token_table, flat, image_cache,
                               dims, n_steps: int = 1, fused_k=None):
        if n_steps > 1:
            return self.language_model.forward_flat(
                cache, token_table, flat, image_cache, dims,
                n_steps=n_steps, fused_k=fused_k)
        return self.language_model.forward_flat(cache, token_table, flat,
                                                image_cache, dims)
