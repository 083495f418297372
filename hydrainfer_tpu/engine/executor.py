"""Instruction executors (reference: hydrainfer/engine/executor.py:105-299).

FillExecutor: registers finished blocks in the prefix cache, builds the
padded LanguageModelBatch, runs the jitted LM step with the donated KV
cache, then host-side scatters each sampled token into its sample_dst decode
Fill and feeds the output-token processors.

ImageEmbedExecutor: runs the vision tower over the batch's images and
scatters the projected features into the image cache (device-side, jitted).

Async overlap: on TPU, dispatch is asynchronous by construction — the jitted
calls return before the device finishes, so encode and fill programs on the
same chip pipeline naturally; the Future here only defers the host-side
post-processing (which needs the sampled tokens). This replaces the
reference's CUDA side-stream / thread-pool decorators
(reference: executor.py:238-263).
"""
import functools
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..memory import TokenCacheBlockManager
from ..models.factory import (ModelFactory, VisionModelParameters)
from ..ops.cache_ops import write_token_cache
from ..utils.logger import getLogger
from .isa import Fill, ImageEmbed
from .params_builder import (LanguageModelBatchBuilder, bucket_of,
                             TOKEN_BUCKETS)
from .rcb import BatchRequest
from .worker import Worker

logger = getLogger(__name__)


class Future:
    def get(self):
        raise NotImplementedError


class EmptyFuture(Future):
    def get(self):
        pass


class CallbackFuture(Future):
    """Host-side completion: calling get() blocks on device results and runs
    the post-processing exactly once."""

    def __init__(self, fn):
        self.fn = fn
        self._done = False

    def get(self):
        if not self._done:
            self._done = True
            self.fn()


class ComposeFuture(Future):
    def __init__(self, futures):
        self.futures = futures

    def get(self):
        for f in self.futures:
            f.get()


@dataclass
class ExecutorConfig:
    pass


class FillExecutor:
    def __init__(self, kv_cache_manager: TokenCacheBlockManager,
                 image_cache_manager: Optional[TokenCacheBlockManager],
                 worker: Worker, model_factory: ModelFactory):
        self.kv = kv_cache_manager
        self.image = image_cache_manager
        self.worker = worker
        self.tokenizer = model_factory.getTokenizer()
        self.language_config = model_factory.getLanguageModelConfig()
        vision_cfg = model_factory.getVisionModelConfig()
        self.image_token_id = vision_cfg.image_token_id

    def _register_prefix_blocks(self, batch: BatchRequest) -> None:
        """Insert hashes for every block this step completes
        (reference: executor.py:109-127)."""
        bs = self.kv.block_size
        for rcb, inst in batch:
            if not isinstance(inst, Fill) or inst.hashes is None:
                continue
            vbids, hashes = [], []
            for cid in inst.cache_ids:
                if cid % bs != bs - 1:
                    continue
                vbid = cid // bs
                if vbid >= len(inst.hashes):
                    continue  # decode tokens are not prefix-cached
                vbids.append(vbid)
                hashes.append(inst.hashes[vbid])
            if vbids:
                self.kv.set_blocks(rcb.virtual_kv_cache, vbids, hashes)

    def execute(self, batch: BatchRequest) -> Future:
        if len(batch) == 0:
            return EmptyFuture()

        self._register_prefix_blocks(batch)

        builder = LanguageModelBatchBuilder(
            self.kv, self.image, self.language_config, self.image_token_id)
        builder.add_batch(batch)
        plan = builder.build(self.image.cache_array if self.image else None)

        out = self.worker.execute_language_model(
            self.kv.cache_array, plan.batch, plan.max_q)
        # the cache buffer was donated into the step; adopt the new one
        self.kv.cache_array = out.cache
        sampled_dev = out.sample_token_ids
        batch.step()

        def postprocess():
            sampled = np.asarray(sampled_dev)  # device sync point
            token_time = time.perf_counter()
            for i, (rcb, inst) in enumerate(zip(plan.seq_rcbs, plan.seq_insts)):
                if not inst.sample:
                    continue
                next_token = int(sampled[i])
                if not inst.is_chunked:
                    rcb.metric.token_times.append(token_time)
                    rcb.output_token_ids.append(next_token)
                if inst.sample_dst is not None:
                    inst.sample_dst.token_ids = [next_token]
                if inst.is_chunked:
                    continue
                is_last = rcb.is_finished()
                for proc in rcb.output_token_processors:
                    proc.append_token_id(next_token, is_last)

        return CallbackFuture(postprocess)


class ImageEmbedExecutor:
    def __init__(self, image_cache_manager: TokenCacheBlockManager,
                 worker: Worker, model_factory: ModelFactory):
        self.image = image_cache_manager
        self.worker = worker
        lcfg = model_factory.getLanguageModelConfig()
        self.n_heads = image_cache_manager.config.n_heads
        self.head_dim = image_cache_manager.config.head_dim

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _scatter_features(self, cache, features, slots):
        feats = features.reshape(-1, self.n_heads, self.head_dim)
        return write_token_cache(cache, 0, slots, (feats,),
                                 cache.shape[3])

    def execute(self, batch: BatchRequest) -> Future:
        if len(batch) == 0:
            return EmptyFuture()

        pixel_values, slot_ids, images_size = [], [], []
        for rcb, inst in batch:
            pixel_values.append(np.asarray(inst.pixel_values))
            inst.pixel_values = None
            slot_ids.extend(self.image.v2p(rcb.virtual_image_cache, inst.cache_ids))
            images_size.extend(inst.images_size)

        pixels = jnp.asarray(np.concatenate(pixel_values, axis=0))
        vision_out = self.worker.execute_vision_model(
            pixels, VisionModelParameters(original_image_sizes=images_size))
        feats = vision_out.image_features  # (n_images, n_tok, hidden)
        flat = feats.reshape(-1, feats.shape[-1])
        n = flat.shape[0]
        Tp = bucket_of(n, TOKEN_BUCKETS)
        slots = np.full(Tp, -1, np.int32)
        slots[:len(slot_ids)] = slot_ids
        flat = jnp.pad(flat, ((0, Tp - n), (0, 0)))
        self.image.cache_array = self._scatter_features(
            self.image.cache_array, flat, jnp.asarray(slots))

        batch.step()
        return EmptyFuture()


class InstructionExecutor:
    """Facade dispatching per-instruction-type batches
    (reference: executor.py:267-299)."""

    def __init__(self, kv_cache_manager, image_cache_manager, worker,
                 model_factory):
        self.fill_executor = FillExecutor(kv_cache_manager, image_cache_manager,
                                          worker, model_factory)
        self.image_embed_executor = (
            ImageEmbedExecutor(image_cache_manager, worker, model_factory)
            if image_cache_manager is not None else None)

    def execute_fill(self, batch: BatchRequest) -> Future:
        return self.fill_executor.execute(batch)

    def execute_image_embed(self, batch: BatchRequest) -> Future:
        return self.image_embed_executor.execute(batch)

    def execute_empty(self, batch: BatchRequest) -> Future:
        if len(batch) == 0:
            return EmptyFuture()
        batch.step()
        return EmptyFuture()
