"""Request → RCB pipeline (reference: hydrainfer/engine/request_processor.py).

Components run in order per request: sampling-params normalization (eos
injection), instruction creation (tokenize → expand <image> runs → compute
chained block hashes with image-hash substitution → build the instruction
list with pre-created decode Fills), scenario prediction, output-processor
registration. Observers (the node's scheduler hook) receive the finished RCB.
"""
import base64
import io
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..memory import compute_image_hash, compute_prefix_hashes
from ..models.factory import ModelFactory
from ..request import Request, RequestMetadata
from ..utils.logger import getLogger
from .isa import (EPMigrate, ImageEmbed, ImageEmbedFill, InstructionListBuilder,
                  PDMigrate, PullCache, TextFill)
from .output_token_processor import OutputTokenParams
from .rcb import RequestControlBlock
from .scenario import ScenarioClassifier

logger = getLogger(__name__)


@dataclass
class RequestProcessorConfig:
    num_request_process_workers: int = 4
    block_size: int = 16
    ignore_eos: bool = False
    # migrate instructions are always emitted; a colocated node's load
    # balancer points at itself and the executor short-circuits, so the same
    # instruction stream serves every disaggregation layout
    emit_ep_migrate: bool = True
    emit_pd_migrate: bool = True
    debug: bool = False


@dataclass
class RequestProcessParameters:
    output_token_processors: list = field(default_factory=list)
    output_token_params: OutputTokenParams = field(default_factory=OutputTokenParams)


class RequestProcessorObserver:
    """update() must be thread-safe: worker threads call it."""

    def update(self, rcb: RequestControlBlock) -> None:
        raise NotImplementedError


class RequestProcessor:
    def __init__(self, config: RequestProcessorConfig, model_factory: ModelFactory):
        self.config = config
        self.tokenizer = model_factory.getTokenizer()
        self.processor = model_factory.getProcessor()
        vision_cfg = model_factory.getVisionModelConfig()
        language_cfg = model_factory.getLanguageModelConfig()
        self.image_token_id = vision_cfg.image_token_id
        self.image_token_calculator = vision_cfg.image_token_calculator
        self.eos_token_id = language_cfg.eos_token_id
        self.mrope_on = bool(getattr(language_cfg, "mrope_section", ()))
        self.scenario_classifier = ScenarioClassifier()
        self.observers: List[RequestProcessorObserver] = []
        self._pool = (ThreadPoolExecutor(config.num_request_process_workers)
                      if config.num_request_process_workers > 1 else None)
        self._lock = threading.Lock()

    def register_observer(self, observer: RequestProcessorObserver) -> None:
        self.observers.append(observer)

    def process(self, request: Request, params: RequestProcessParameters) -> None:
        if self._pool is not None:
            self._pool.submit(self._process_locked, request, params)
        else:
            self._process_locked(request, params)

    def _process_locked(self, request, params):
        try:
            with self._lock:
                rcb = self.build_rcb(request, params)
            for obs in self.observers:
                obs.update(rcb)
        except Exception:
            logger.exception(f"request {request.request_id} processing failed")
            # Terminate the client's stream (mirrors the scheduler's reject
            # path): a malformed request — bad base64, more <image> tokens
            # than images — must not leave API/offline callers waiting on a
            # stream that will never end.
            for proc in params.output_token_processors:
                try:
                    proc.append_token_id(-1, True)
                except Exception:
                    logger.exception(
                        f"request {request.request_id} stream-terminate failed")

    # ---------------- the pipeline ----------------

    def build_rcb(self, request: Request,
                  params: RequestProcessParameters) -> RequestControlBlock:
        rcb = RequestControlBlock()
        rcb.request_id = request.request_id
        rcb.output_token_params = params.output_token_params
        for p in params.output_token_processors:
            rcb.register_output_token_processor(p)

        # sampling params: inject model eos
        rcb.sampling_params = request.sampling_params
        if not self.config.ignore_eos and not request.sampling_params.ignore_eos:
            if self.eos_token_id not in rcb.sampling_params.eos_token_ids:
                rcb.sampling_params.eos_token_ids.append(self.eos_token_id)

        self._create_instructions(request, rcb)

        rcb.scenario_type = self.scenario_classifier.classify(
            n_text_tokens=rcb.request_metadata.n_text_tokens,
            n_output_tokens=request.sampling_params.max_tokens)
        if self.config.debug:
            logger.debug(f"req {request.request_id}: {rcb.instructions!r}")
        return rcb

    def _decode_image(self, request: Request):
        if request.image_base64 is not None:
            from PIL import Image
            return Image.open(io.BytesIO(base64.b64decode(request.image_base64)))
        return request.image

    def _expand_image_tokens(self, token_ids: List[int], image_hashes: List[int],
                             images_size: List[tuple]):
        """Each single image token becomes a run of N image tokens; the block
        hashes substitute the image content hash so identical prompts with
        different images do not alias in the prefix cache."""
        expanded: List[int] = []
        hash_stream: List[int] = []
        img_idx = 0
        n_image_tokens = 0
        for tid in token_ids:
            if tid == self.image_token_id:
                n = self.image_token_calculator.get_num_image_tokens(
                    images_size[img_idx])
                expanded.extend([self.image_token_id] * n)
                hash_stream.extend([image_hashes[img_idx]] * n)
                img_idx += 1
                n_image_tokens += n
            else:
                expanded.append(tid)
                hash_stream.append(tid)
        hashes = compute_prefix_hashes(hash_stream, self.config.block_size)
        return expanded, hashes, n_image_tokens

    def _create_instructions(self, request: Request, rcb: RequestControlBlock) -> None:
        image = self._decode_image(request)
        images_size, image_hashes, pixel_values = [], [], None
        if image is not None:
            width, height = image.size
            images_size.append((height, width))
            image_hashes.append(compute_image_hash(image))
            pixel_values = self.processor.process(image)

        token_ids = self.tokenizer.encode(request.prompt)
        n_images = token_ids.count(self.image_token_id)
        token_ids, hashes, n_image_tokens = self._expand_image_tokens(
            token_ids, image_hashes, images_size)
        n_prompt = len(token_ids)

        rcb.request_metadata = RequestMetadata(
            n_images=n_images,
            n_prompt_tokens=n_prompt,
            n_text_tokens=n_prompt - n_image_tokens,
            n_image_tokens=n_image_tokens)

        image_mask = [t == self.image_token_id for t in token_ids]
        mrope_hw = None
        if self.mrope_on:
            # M-RoPE (HF get_rope_index equivalent): text advances all three
            # axes together; an image's merged grid occupies t/h/w ladders
            # from one start and the stream resumes at start + max(grid) —
            # rope positions COMPRESS relative to cache ids after images
            pt, ph, pw, st = self._mrope_positions(token_ids, images_size)
            positions = pt + list(range(
                st, st + request.sampling_params.max_tokens))
            mrope_hw = [ph, pw]
        else:
            positions = list(range(n_prompt + request.sampling_params.max_tokens))

        builder = InstructionListBuilder()
        if pixel_values is not None:
            image_cache_ids = list(range(n_image_tokens))
            builder.append(ImageEmbed(
                pixel_values=np.asarray(pixel_values)[None]
                if np.asarray(pixel_values).ndim == 3 else np.asarray(pixel_values),
                cache_ids=image_cache_ids,
                images_size=images_size,
                hashes=image_hashes))
            if self.config.emit_ep_migrate:
                builder.append(EPMigrate())
                builder.append(PullCache())
            prefill = ImageEmbedFill(
                image_token_cache_ids=image_cache_ids,
                image_token_mask=image_mask,
                token_ids=token_ids,
                position_ids=positions[:n_prompt],
                cache_ids=list(range(n_prompt)),
                sample=True, sample_dst=None, hashes=hashes)
        else:
            prefill = TextFill(
                token_ids=token_ids,
                position_ids=positions[:n_prompt],
                cache_ids=list(range(n_prompt)),
                sample=True, sample_dst=None, hashes=hashes)
        prefill.mrope_hw = mrope_hw
        builder.append(prefill)
        if self.config.emit_pd_migrate:
            builder.append(PDMigrate())
            builder.append(PullCache())

        # pre-create all decode Fills, chained via sample_dst
        last = prefill
        for i in range(n_prompt, n_prompt + request.sampling_params.max_tokens - 1):
            # -1 placeholder: resolved on device via the token table, and on
            # host (late) by the producer step's postprocess. cache id = i
            # (the physical slot); rope position may lag it under M-RoPE
            decode = TextFill(token_ids=[-1], position_ids=[positions[i]],
                              cache_ids=[i], sample=True,
                              sample_dst=None, hashes=None)
            builder.append(decode)
            last.sample_dst = decode
            last = decode

        rcb.instructions = builder.build()

    def _mrope_positions(self, token_ids: List[int], images_size: List[tuple]):
        """Per-token (t, h, w) rope positions over the EXPANDED prompt, plus
        the first decode position (HF Qwen2VL get_rope_index semantics)."""
        pos_t: List[int] = []
        pos_h: List[int] = []
        pos_w: List[int] = []
        st, img, i = 0, 0, 0
        while i < len(token_ids):
            if token_ids[i] == self.image_token_id:
                grid = self.image_token_calculator.get_image_grid(
                    images_size[img])
                t, gh, gw = grid
                for ti in range(t):
                    for hi in range(gh):
                        pos_t.extend([st + ti] * gw)
                        pos_h.extend([st + hi] * gw)
                        pos_w.extend(range(st, st + gw))
                st += max(t, gh, gw)
                img += 1
                i += t * gh * gw
            else:
                pos_t.append(st)
                pos_h.append(st)
                pos_w.append(st)
                st += 1
                i += 1
        return pos_t, pos_h, pos_w, st
