"""Random weight initialization at real architectures.

Used by bench.py and __graft_entry__ (no model weights ship in this
environment) and by sharding tests: the tensors have the exact shapes and
dtypes of the converted checkpoints, so performance and compilation are
representative of the real models.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from .clip import CLIPVisionConfig
from .decoder import DecoderConfig


import functools


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _init(key, shape, dtype, scale=0.02):
    # jitted (one dispatch per tensor): un-jitted each init is ~3 separate
    # dispatches, which adds up over the tunneled TPU for 100+ tensors
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def _key_iter(key, n):
    """Indexed key stream. NOT `iter(jax.random.split(...))`: iterating a
    jax array yields elements through a path that costs ~40s per `next()`
    over the tunneled TPU backend; indexed slices are ~ms."""
    keys = jax.random.split(key, n)
    return iter(keys[i] for i in range(n))


def init_decoder_weights(cfg: DecoderConfig, key: jax.Array,
                         dtype=jnp.bfloat16, quantization: str = "none") -> dict:
    """quantization != 'none' quantizes each layer's matmul weights AS THEY
    ARE BUILT, so the full-precision tree never coexists with the quantized
    one in HBM (a 7B bf16 tree + its int8 copy OOMs a 16GB chip)."""
    from ..ops.quant import quantize_tree
    keys = _key_iter(key, cfg.n_layers * 8 + 4)
    H = cfg.hidden_size
    qkv_out = (cfg.n_qo_heads + 2 * cfg.n_kv_heads) * cfg.head_dim
    w = {"embed": _init(next(keys), (cfg.vocab_size, H), dtype), "layers": []}
    for _ in range(cfg.n_layers):
        if cfg.mla_kv_lora > 0:
            # MLA (DeepSeek latent) attention block — plain-q form, dense
            # MLP; same layer-dict contract as models/deepseek_v3.py packs
            r, dr = cfg.mla_kv_lora, cfg.mla_rope_dim
            dn, dv = cfg.mla_nope_dim, cfg.mla_v_dim
            Hq = cfg.n_qo_heads
            lw = {
                "q_proj": _init(next(keys), (H, Hq * (dn + dr)), dtype),
                "kv_a": _init(next(keys), (H, r + dr), dtype),
                "kv_a_norm": jnp.ones((r,), dtype),
                "w_uk": _init(next(keys), (r, Hq, dn), dtype),
                "w_uv": _init(next(keys), (r, Hq, dv), dtype),
                "o_proj": _init(next(keys), (Hq * dv, H), dtype),
            }
        else:
            lw = {
                "qkv_proj": _init(next(keys), (H, qkv_out), dtype),
                "qkv_bias": (jnp.zeros((qkv_out,), dtype)
                             if cfg.qkv_bias else None),
                "o_proj": _init(next(keys),
                                (cfg.n_qo_heads * cfg.head_dim, H), dtype),
            }
        lw.update({
            "gate_up": _init(next(keys), (H, 2 * cfg.intermediate_size), dtype),
            "down": _init(next(keys), (cfg.intermediate_size, H), dtype),
            "input_norm": jnp.ones((H,), dtype),
            "post_norm": jnp.ones((H,), dtype),
        })
        if quantization not in (None, "none", ""):
            lw = quantize_tree({"layers": [lw]}, quantization)["layers"][0]
        w["layers"].append(lw)
    w["norm"] = jnp.ones((H,), dtype)
    w["lm_head"] = _init(next(keys), (H, cfg.vocab_size), dtype)
    if quantization not in (None, "none", ""):
        w = quantize_tree(w, quantization)
    return w


def init_clip_weights(cfg: CLIPVisionConfig, key: jax.Array,
                      dtype=jnp.bfloat16, lm_hidden: Optional[int] = None) -> dict:
    """CLIP tower weights; if lm_hidden is given, adds the LLaVA projector."""
    keys = _key_iter(key, cfg.n_layers * 6 + 8)
    H = cfg.hidden_size
    n_pos = cfg.n_patches + 1
    w = {
        "patch_embed": _init(next(keys), (3 * cfg.patch_size ** 2, H), dtype),
        "class_embed": _init(next(keys), (H,), dtype),
        "pos_embed": _init(next(keys), (n_pos, H), dtype),
        "pre_norm": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        w["layers"].append({
            "ln1": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
            "qkv": (_init(next(keys), (H, 3 * H), dtype), jnp.zeros((3 * H,), dtype)),
            "out": (_init(next(keys), (H, H), dtype), jnp.zeros((H,), dtype)),
            "ln2": (jnp.ones((H,), dtype), jnp.zeros((H,), dtype)),
            "fc1": (_init(next(keys), (H, cfg.intermediate_size), dtype),
                    jnp.zeros((cfg.intermediate_size,), dtype)),
            "fc2": (_init(next(keys), (cfg.intermediate_size, H), dtype),
                    jnp.zeros((H,), dtype)),
        })
    if lm_hidden is not None:
        clip_w = w
        w = {"clip": clip_w,
             "proj1": (_init(next(keys), (H, lm_hidden), dtype),
                       jnp.zeros((lm_hidden,), dtype)),
             "proj2": (_init(next(keys), (lm_hidden, lm_hidden), dtype),
                       jnp.zeros((lm_hidden,), dtype))}
    return w


# Real-architecture decoder configs for benches (shapes from the HF configs
# of the models the reference serves; weights random).
ARCH_CONFIGS = {
    # vicuna-7b inside llava-1.5-7b-hf
    "llava-7b-lm": DecoderConfig(
        n_layers=32, hidden_size=4096, intermediate_size=11008,
        n_qo_heads=32, n_kv_heads=32, head_dim=128, vocab_size=32064,
        max_position_embeddings=4096),
    # vicuna-13b inside llava-v1.6 (llava-NeXT) — BASELINE config 3.
    # int8 weights ~13.0 GB: fits one 16 GB v5e only with a tight KV pool
    # (see bench --arch llava-13b-lm --kv-blocks)
    "llava-13b-lm": DecoderConfig(
        n_layers=40, hidden_size=5120, intermediate_size=13824,
        n_qo_heads=40, n_kv_heads=40, head_dim=128, vocab_size=32064,
        max_position_embeddings=4096),
    # Qwen2-VL-2B language tower
    "qwen2-vl-2b-lm": DecoderConfig(
        n_layers=28, hidden_size=1536, intermediate_size=8960,
        n_qo_heads=12, n_kv_heads=2, head_dim=128, vocab_size=151936,
        max_position_embeddings=32768, qkv_bias=True, rope_theta=1e6,
        tie_word_embeddings=True),
    # CPU-runnable smoke size
    "tiny-lm": DecoderConfig(
        n_layers=2, hidden_size=128, intermediate_size=256,
        n_qo_heads=4, n_kv_heads=2, head_dim=32, vocab_size=1024,
        max_position_embeddings=2048),
    # DeepSeek-V2-Lite-shaped MLA decoder (dense MLP stand-in for the MoE
    # body — attention/cache perf characteristics are what the MLA bench
    # measures): latent dim 512+64=576, absorbed MQA over the single-plane
    # cache. head_dim == kv_lora + rope_dim per the MLA cache contract.
    "mla-2b-lm": DecoderConfig(
        n_layers=27, hidden_size=2048, intermediate_size=5472,
        n_qo_heads=16, n_kv_heads=1, head_dim=576, vocab_size=32064,
        max_position_embeddings=4096, rope_head_dim=64,
        mla_kv_lora=512, mla_rope_dim=64, mla_nope_dim=128, mla_v_dim=128),
    # CPU-runnable MLA smoke size
    "mla-tiny-lm": DecoderConfig(
        n_layers=2, hidden_size=64, intermediate_size=128,
        n_qo_heads=4, n_kv_heads=1, head_dim=24, vocab_size=512,
        max_position_embeddings=1024, rope_head_dim=8,
        mla_kv_lora=16, mla_rope_dim=8, mla_nope_dim=16, mla_v_dim=16),
}

CLIP_L_336 = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                              n_layers=23, n_heads=16, image_size=336,
                              patch_size=14)

# CPU-runnable ViT for multimodal engine/dryrun tests: 4x4 patch grid,
# 16 feature tokens per image
CLIP_TINY = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                             n_layers=2, n_heads=2, image_size=56,
                             patch_size=14)


# ---------------- random-weight model factory ----------------

class _NoImages:
    def get_num_image_tokens(self, image_size):
        return 0


class _FixedTokens:
    def __init__(self, n):
        self.n = n

    def get_num_image_tokens(self, image_size):
        return self.n


class _RawImageProcessor:
    def __init__(self, size):
        self.size = size

    def process(self, image):
        import numpy as np
        arr = np.asarray(image.convert("RGB").resize((self.size, self.size)),
                         np.float32).transpose(2, 0, 1) / 255.0
        return jnp.asarray(arr)


from .factory import ModelFactory


class RandomWeightFactory(ModelFactory):
    """ModelFactory over random weights at a real architecture (bench.py,
    evaluation/ tooling, __graft_entry__). Optional CLIP-L/14-336 vision
    tower projected to the LM hidden size for multimodal runs."""

    def __init__(self, arch: str, dtype=jnp.bfloat16, quantization: str = "none",
                 kv_scale=None, multimodal: bool = False,
                 layer_loop: str = "scan", attention_impl: str = "auto",
                 bisect: str = "", kv_pages_per_block=None, clip_cfg=None):
        import dataclasses
        self.cfg = dataclasses.replace(ARCH_CONFIGS[arch],
                                       layer_loop=layer_loop,
                                       attention_impl=attention_impl,
                                       bisect=bisect,
                                       kv_pages_per_block=kv_pages_per_block)
        self.dtype = dtype
        self.quantization = quantization
        self.kv_scale = kv_scale
        self.multimodal = multimodal
        self.clip_cfg = (clip_cfg or CLIP_L_336) if multimodal else None
        self._lm = None
        self._vm = None

    def getLanguageModel(self):
        if self._lm is None:
            from .llama import LlamaForCausalLM
            w = init_decoder_weights(self.cfg, jax.random.PRNGKey(0),
                                     self.dtype,
                                     quantization=self.quantization)
            self._lm = LlamaForCausalLM(w, self.cfg, self.quantization,
                                        kv_scale=self.kv_scale)
        return self._lm

    def getVisionModel(self):
        if not self.multimodal:
            return None
        if self._vm is None:
            from .llava import LlavaVisionModel
            w = init_clip_weights(self.clip_cfg, jax.random.PRNGKey(1),
                                  self.dtype, lm_hidden=self.cfg.hidden_size)
            self._vm = LlavaVisionModel(w, self.clip_cfg)
        return self._vm

    def getVisionModelConfig(self):
        from .factory import VisionModelConfig
        if not self.multimodal:
            return VisionModelConfig("", -1, _NoImages())
        return VisionModelConfig("<image>", 9,
                                 _FixedTokens(self.clip_cfg.n_patches))

    def getLanguageModelConfig(self):
        from .factory import LanguageModelConfig
        c = self.cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=2, hidden_size=c.hidden_size, vocab_size=c.vocab_size,
            kv_single_plane=c.mla_kv_lora > 0)

    def getProcessor(self):
        return (_RawImageProcessor(self.clip_cfg.image_size)
                if self.multimodal else None)

    def getTokenizer(self):
        from .tokenizer import SimpleTokenizer
        return SimpleTokenizer()

    def param_bytes(self):
        lm = self.getLanguageModel()
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(lm.weights))

    def param_count(self):
        """LOGICAL parameter count — the unquantized model's element count
        (for dtype-normalized rooflines, e.g. the bf16 bandwidth bound).
        Computed via eval_shape of the UNQUANTIZED init so int4 packing
        (which halves stored elements) and quant scales (which add leaves)
        don't skew the count (ADVICE r3)."""
        shapes = jax.eval_shape(
            lambda k: init_decoder_weights(self.cfg, k, jnp.bfloat16,
                                           quantization="none"),
            jax.random.PRNGKey(0))
        return sum(x.size for x in jax.tree_util.tree_leaves(shapes))
