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

    def get_image_grid(self, image_size: Tuple[int, int]):
        """Merged-token grid (t, h, w) for M-RoPE position assignment;
        None for models whose rope is 1D."""
        return None


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
    # multimodal RoPE sections (t, h, w) — non-empty enables the per-batch
    # h/w position streams end to end (Qwen2-VL M-RoPE)
    mrope_section: tuple = ()
    # MLA latent cache: ONE plane per token instead of interleaved K/V —
    # the node sizes the cache head axis to n_kv_heads (not 2x)
    kv_single_plane: bool = False


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
    token_src_slots:  (T,) int32 device token-table slot to read this token
                      from (-1 = token_ids already holds it). This is the
                      async-decode feedback path: a decode step consumes the
                      previous step's sampled token without a host sync.
    sample_dst_slots: (S,) int32 token-table slot receiving the sampled
                      token (-1 = discard)
    """
    token_ids: jax.Array
    positions: jax.Array
    image_features: jax.Array
    image_dst_idx: jax.Array
    attention: PagedAttentionParams
    sample_token_idx: jax.Array
    token_src_slots: jax.Array
    sample_dst_slots: jax.Array
    # stochastic sampling controls (empty arrays when dims.sampling=False):
    # temperature/top_p are float32 bitcast into the int32 flat buffer
    temperatures: jax.Array = None
    top_ks: jax.Array = None
    top_ps: jax.Array = None
    sample_seed: jax.Array = None
    # (2, T) h/w position streams for multimodal RoPE (None = 1D rope)
    positions_hw: jax.Array = None
    # (S,) real draft length per seq for speculative verify (None = n/a)
    draft_lens: jax.Array = None


@dataclass
class LanguageModelOutput:
    sample_token_ids: jax.Array = None  # (S,) int32
    cache: jax.Array = None             # the updated (donated) kv cache
    token_table: jax.Array = None       # the updated (donated) token table


@dataclass(frozen=True)
class FillDims:
    """Static shape key of one fill batch (the jit-cache key)."""
    T: int          # padded token count
    S: int          # padded sequence count
    MB: int         # padded blocks-per-seq
    Ti: int         # padded image-feature token count
    max_q: int      # padded longest q chunk
    # True when any sequence samples stochastically (temperature > 0): the
    # step then runs the full logits pipeline instead of bare argmax
    sampling: bool = False
    # True when the batch carries h/w position streams for multimodal RoPE
    # (Qwen2-VL M-RoPE): the flat buffer gains a 2*T tail after the core
    mrope: bool = False
    # speculative-verify segment length (1 + K_draft); 0 = normal fill.
    # The flat buffer gains an S-length draft_lens tail after mrope
    spec: int = 0


def pack_fill_batch(token_ids, positions, q_seq_ids, q_local_ids,
                    new_kv_slot_ids, token_src_slots, kv_lens,
                    sample_token_idx, sample_dst_slots, block_tables,
                    image_slot_ids, image_dst_idx, dims: FillDims,
                    cu_q_lens=None, num_seqs=None):
    """Host side: concatenate every int32 field of a fill batch into ONE
    flat buffer, so each engine step costs a single H2D transfer instead of
    ~10 (small transfers serialize with compute on the device stream)."""
    import numpy as np
    if cu_q_lens is None:
        cu_q_lens = np.zeros(dims.S + 1, np.int32)
    if num_seqs is None:
        num_seqs = np.asarray([dims.S], np.int32)
    parts = [token_ids, positions, q_seq_ids, q_local_ids, new_kv_slot_ids,
             token_src_slots, kv_lens, sample_token_idx, sample_dst_slots,
             block_tables.reshape(-1), cu_q_lens, num_seqs,
             image_slot_ids, image_dst_idx]
    return np.concatenate([np.asarray(p, np.int32) for p in parts])


def unpack_fill_batch(flat: jax.Array, image_cache: jax.Array,
                      dims: FillDims, hidden: int) -> "LanguageModelBatch":
    """Device side (inside jit): slice the flat buffer back into the batch
    and gather the vision features for this chunk from the image cache."""
    T, S, MB, Ti = dims.T, dims.S, dims.MB, dims.Ti
    o = 0
    def take(n):
        nonlocal o
        out = jax.lax.dynamic_slice_in_dim(flat, o, n)
        o += n
        return out
    token_ids = take(T)
    positions = take(T)
    q_seq_ids = take(T)
    q_local_ids = take(T)
    new_kv_slot_ids = take(T)
    token_src_slots = take(T)
    kv_lens = take(S)
    sample_token_idx = take(S)
    sample_dst_slots = take(S)
    block_tables = take(S * MB).reshape(S, MB)
    cu_q_lens = take(S + 1)
    num_seqs = take(1)

    image_slot_ids = take(Ti)
    image_dst_idx = take(Ti)
    # mrope tail: h/w position streams (the t stream IS `positions`)
    if dims.mrope:
        positions_hw = take(2 * T).reshape(2, T)
    else:
        positions_hw = None
    draft_lens = take(S) if dims.spec > 0 else None
    # sampling tail (appended after the core buffer by the builder)
    if dims.sampling:
        temperatures = jax.lax.bitcast_convert_type(take(S), jnp.float32)
        top_ks = take(S)
        top_ps = jax.lax.bitcast_convert_type(take(S), jnp.float32)
        sample_seed = take(1)
    else:
        temperatures = jnp.zeros((0,), jnp.float32)
        top_ks = jnp.zeros((0,), jnp.int32)
        top_ps = jnp.zeros((0,), jnp.float32)
        sample_seed = jnp.zeros((1,), jnp.int32)

    if Ti > 0:
        flat_cache = image_cache[0, 0].reshape(
            -1, image_cache.shape[-2] * image_cache.shape[-1])
        feats = jnp.take(flat_cache, jnp.maximum(image_slot_ids, 0),
                         axis=0)[:, :hidden]
    else:
        feats = jnp.zeros((0, hidden), image_cache.dtype)

    from ..ops.attention import PagedAttentionParams
    return LanguageModelBatch(
        token_ids=token_ids,
        positions=positions,
        image_features=feats,
        image_dst_idx=image_dst_idx,
        attention=PagedAttentionParams(
            q_seq_ids=q_seq_ids, q_local_ids=q_local_ids, positions=positions,
            kv_lens=kv_lens, block_tables=block_tables,
            new_kv_slot_ids=new_kv_slot_ids,
            cu_q_lens=cu_q_lens, num_seqs=num_seqs),
        sample_token_idx=sample_token_idx,
        token_src_slots=token_src_slots,
        sample_dst_slots=sample_dst_slots,
        temperatures=temperatures,
        top_ks=top_ks,
        top_ps=top_ps,
        sample_seed=sample_seed,
        positions_hw=positions_hw,
        draft_lens=draft_lens,
    )


class VisionModel:
    # Contract: a model that sets `fixed_resolution = True` (llava.py:52)
    # MUST ignore params.original_image_sizes — the encode executor pads
    # fixed-resolution batches to a pow2 image count and fills the pad
    # rows' sizes by replicating the last real entry (executor.py), which
    # is only sound when sizes are unread.
    fixed_resolution: bool = False

    def forward(self, pixel_values: jax.Array,
                params: VisionModelParameters) -> VisionModelOutput:
        raise NotImplementedError


class LanguageModel:
    # True when forward_flat accepts n_steps>1 (fused multi-step decode:
    # K chained decode steps in one device program). Models built on the
    # shared decoder (models/decoder.py:decoder_forward_multi) set this;
    # the executor clamps the fused window to 1 otherwise.
    supports_multi_step: bool = False

    def forward(self, cache: jax.Array, token_table: jax.Array,
                batch: LanguageModelBatch, max_q: int) -> LanguageModelOutput:
        raise NotImplementedError


class Tokenizer:
    def encode(self, prompt: str) -> List[int]:
        raise NotImplementedError

    def decode(self, token_id: int) -> str:
        raise NotImplementedError

    def decode_ids(self, token_ids: List[int]) -> str:
        """Decode a sequence of ids to text. Default: join single-token
        decodes (exact for codepoint tokenizers; HF adapters override with
        a real full decode for byte-level BPE correctness)."""
        return "".join(self.decode(t) for t in token_ids)

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
    # layer-loop strategy: auto | scan | unroll (see DecoderConfig.layer_loop;
    # "auto" = scan at the factory level, overridden to unroll by the node
    # engine which pairs it with a per-layer cache)
    layer_loop: str = "auto"
    # weight-only quantization of the decoder matmuls: none|int8|int4|fp8
    quantization: str = "none"
    # KV cache dtype: auto (= model dtype) | int8 (symmetric, static scale,
    # dequantized inside the attention kernel)
    kv_cache_dtype: str = "auto"
    kv_scale: float = 0.05


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

    if config.name.startswith("random:"):
        # "random:<arch>[+mm]" — random weights at a named ARCH_CONFIGS
        # architecture ("+mm" adds a real ViT tower: CLIP-L/14-336, or the
        # tiny CPU-runnable CLIP for tiny archs). Lets STANDALONE process
        # nodes (cluster/process_node.py) run real-compute models without
        # checkpoints — e.g. an E node with an actual vision tower in the
        # multichip dryrun's vision-EPD stage.
        import jax.numpy as _jnp

        from .random_init import CLIP_TINY, RandomWeightFactory
        spec = config.name[len("random:"):]
        multimodal = spec.endswith("+mm")
        arch = spec[:-3] if multimodal else spec
        dt = {"float32": _jnp.float32, "f32": _jnp.float32,
              "bf16": _jnp.bfloat16, "bfloat16": _jnp.bfloat16}[config.dtype]
        return RandomWeightFactory(
            arch, dtype=dt, quantization=config.quantization,
            kv_scale=(config.kv_scale
                      if config.kv_cache_dtype == "int8" else None),
            multimodal=multimodal,
            layer_loop=(config.layer_loop
                        if config.layer_loop != "auto" else "scan"),
            attention_impl=config.attention_impl,
            clip_cfg=CLIP_TINY if "tiny" in arch else None)

    if config.name == "fake" or not config.path:
        from .fake import FakeModelFactory
        return FakeModelFactory(config, context)

    if not os.path.isdir(config.path):
        # "org/name" repo ids auto-download in deployments with egress
        # (HYDRAINFER_ALLOW_DOWNLOAD=1); reference: model_factory.py:121-129
        from .downloader import ensure_local_model
        config.path = ensure_local_model(config.path)

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
    if architecture == "Qwen2VLForConditionalGeneration" or model_type == "qwen2_vl":
        from .qwen2_vl import Qwen2VLModelFactory
        return Qwen2VLModelFactory(config, context)
    if architecture == "InternVLChatModel" or model_type == "internvl":
        from .internvl import InternVLModelFactory
        return InternVLModelFactory(config, context)
    if model_type == "deepseek_vl_v2":
        from .deepseek_vl2 import DeepSeekVL2ModelFactory
        return DeepSeekVL2ModelFactory(config, context)
    if model_type in ("deepseek_v2", "deepseek_v3") or architecture in (
            "DeepseekV2ForCausalLM", "DeepseekV3ForCausalLM", "DeepseekForCausalLM"):
        from .deepseek_v3 import DeepSeekModelFactory
        return DeepSeekModelFactory(config, context)
    if architecture == "MixtralForCausalLM":
        from .mixtral import MixtralModelFactory
        return MixtralModelFactory(config, context)
    if architecture == "GPT2LMHeadModel":
        from .gpt2 import GPT2ModelFactory
        return GPT2ModelFactory(config, context)
    if architecture in ("LlamaForCausalLM", "Qwen2ForCausalLM"):
        from .text_only import TextOnlyModelFactory
        return TextOnlyModelFactory(config, context)

    raise ValueError(f"unsupported architecture {architecture} / model_type {model_type}")
