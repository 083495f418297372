"""Llama-family causal LM over the paged cache.

From-scratch functional equivalent of the reference's Llama
(reference: hydrainfer/model/llama.py:99-185 — RoPE + GQA paged attention,
greedy argmax inside forward, safetensor loader), built on the shared
decoder blocks in decoder.py. Also covers Qwen2 text decoders (same
structure + qkv bias).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import (DecoderConfig, decoder_forward, init_rope_tables,
                      pack_decoder_weights)
from .factory import LanguageModel, LanguageModelBatch, LanguageModelOutput
from .weight_loader import WeightStore


def decoder_config_from_hf(cfg: dict, attention_impl: str = "auto",
                           layer_loop: str = "scan") -> DecoderConfig:
    hidden = cfg["hidden_size"]
    heads = cfg["num_attention_heads"]
    return DecoderConfig(
        n_layers=cfg["num_hidden_layers"],
        hidden_size=hidden,
        intermediate_size=cfg["intermediate_size"],
        n_qo_heads=heads,
        n_kv_heads=cfg.get("num_key_value_heads", heads),
        head_dim=cfg.get("head_dim") or hidden // heads,
        vocab_size=cfg["vocab_size"],
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rope_theta=float(cfg.get("rope_theta", 10000.0)),
        rms_norm_eps=float(cfg.get("rms_norm_eps", 1e-6)),
        qkv_bias=cfg.get("model_type") == "qwen2" or bool(cfg.get("attention_bias", False)),
        tie_word_embeddings=bool(cfg.get("tie_word_embeddings", False)),
        attention_impl=attention_impl,
        layer_loop="scan" if layer_loop == "auto" else layer_loop,
    )


def convert_llama_weights(store: WeightStore, cfg: DecoderConfig,
                          prefix: str = "model.",
                          lm_head_name: str = "lm_head") -> dict:
    """HF checkpoint names → fused functional pytree."""
    w = {"embed": store.get(f"{prefix}embed_tokens.weight"), "layers": []}
    for l in range(cfg.n_layers):
        p = f"{prefix}layers.{l}."
        qkv, qkv_b = store.fused_linear(
            [p + "self_attn.q_proj", p + "self_attn.k_proj", p + "self_attn.v_proj"],
            bias=True)
        lw = {
            "qkv_proj": qkv,
            "qkv_bias": qkv_b if cfg.qkv_bias else None,
            "o_proj": store.linear(p + "self_attn.o_proj"),
            "gate_up": store.fused_linear([p + "mlp.gate_proj", p + "mlp.up_proj"]),
            "down": store.linear(p + "mlp.down_proj"),
            "input_norm": store.get(p + "input_layernorm.weight"),
            "post_norm": store.get(p + "post_attention_layernorm.weight"),
        }
        w["layers"].append(lw)
    w["norm"] = store.get(f"{prefix}norm.weight")
    if cfg.tie_word_embeddings or not store.has(f"{lm_head_name}.weight"):
        w["lm_head"] = jnp.transpose(w["embed"])
    else:
        w["lm_head"] = store.linear(lm_head_name)
    return w


class LlamaForCausalLM(LanguageModel):
    supports_multi_step = True

    def __init__(self, weights: dict, cfg: DecoderConfig,
                 quantization: str = "none", kv_scale=None):
        if kv_scale is not None:
            import dataclasses
            cfg = dataclasses.replace(cfg, kv_scale=kv_scale)
        self.cfg = cfg
        from ..ops.quant import quantize_tree
        weights = quantize_tree(weights, quantization)
        # stacked scan layout: one compiled layer body instead of n_layers
        self.weights = pack_decoder_weights(weights, cfg.layer_loop)
        self.cos_tab, self.sin_tab = init_rope_tables(cfg)
        self._build_steps()

    def _build_steps(self) -> None:
        cfg = self.cfg
        self._step = jax.jit(
            functools.partial(decoder_forward, cfg=cfg),
            static_argnames=("max_q", "return_logits"),
            donate_argnames=("cache", "token_table"),
        )

        def _flat_fn(weights, cache, token_table, flat, image_cache,
                     cos_tab, sin_tab, dims):
            from .factory import unpack_fill_batch
            batch = unpack_fill_batch(flat, image_cache, dims, cfg.hidden_size)
            return decoder_forward(weights, cache, batch, cos_tab, sin_tab,
                                   cfg, dims.max_q, token_table=token_table)

        # engine hot path: the whole batch arrives as ONE flat int32 buffer
        # (single H2D transfer) and is unpacked on device. The cache arrives
        # as a jax.Ref (in-place) OR a value (donated) — separate jits.
        self._flat_step = jax.jit(
            _flat_fn, static_argnames=("dims",),
            donate_argnames=("token_table",))
        self._flat_step_value = jax.jit(
            _flat_fn, static_argnames=("dims",),
            donate_argnames=("cache", "token_table"))

        def _flat_multi_fn(weights, cache, token_table, flat, image_cache,
                           cos_tab, sin_tab, fused_k, dims, n_steps):
            from .decoder import decoder_forward_multi
            from .factory import unpack_fill_batch
            batch = unpack_fill_batch(flat, image_cache, dims, cfg.hidden_size)
            c, tt, toks = decoder_forward_multi(
                weights, cache, batch, cos_tab, sin_tab, cfg, n_steps,
                token_table=token_table, fused_k=fused_k)
            # (n_steps, S) -> flat (n_steps*S,) so the engine's batched
            # token reads concatenate uniformly with single-step outputs
            return c, tt, toks.reshape(-1)

        # fused K-step decode: one dispatch runs K data-dependent decode
        # steps (geometry advances on device, tokens flow through the
        # token table) — amortizes per-step host + dispatch cost
        self._flat_multi = jax.jit(
            _flat_multi_fn, static_argnames=("dims", "n_steps"),
            donate_argnames=("token_table",))
        self._flat_multi_value = jax.jit(
            _flat_multi_fn, static_argnames=("dims", "n_steps"),
            donate_argnames=("cache", "token_table"))

        def _flat_spec_fn(weights, cache, token_table, flat, image_cache,
                          cos_tab, sin_tab, dims):
            from .factory import unpack_fill_batch
            batch = unpack_fill_batch(flat, image_cache, dims, cfg.hidden_size)
            return decoder_forward(weights, cache, batch, cos_tab, sin_tab,
                                   cfg, dims.max_q, token_table=token_table,
                                   spec=dims.spec)

        # speculative verify: S uniform (1 + K_draft)-row segments, argmax
        # at every row, device-side acceptance into the token table
        self._flat_spec = jax.jit(
            _flat_spec_fn, static_argnames=("dims",),
            donate_argnames=("token_table",))
        self._flat_spec_value = jax.jit(
            _flat_spec_fn, static_argnames=("dims",),
            donate_argnames=("cache", "token_table"))

    def shard_to(self, mesh) -> None:
        """Tensor-parallel placement: megatron-style NamedShardings on the
        weight pytree (parallel/mesh.py); XLA SPMD inserts the collectives,
        and attention re-jits with the mesh so the Pallas ragged kernel runs
        under shard_map on the sharded head axes (ops/attention.py:
        paged_attention_tp). Call before the first forward."""
        import dataclasses

        from ..parallel.mesh import replicate, shard_decoder_weights
        self.weights = shard_decoder_weights(self.weights, mesh)
        self.cos_tab, self.sin_tab = replicate((self.cos_tab, self.sin_tab), mesh)
        self.cfg = dataclasses.replace(self.cfg, mesh=mesh)
        self._build_steps()

    def shard_to_pp(self, mesh) -> None:
        """Pipeline-parallel placement: the layer axis of the weight stacks
        (and, separately, of the paged KV cache) shards over the mesh's
        'pp' axis; forward_flat routes through the stage-relay program
        (parallel/pipeline.py:decoder_forward_pp). Requires the unroll
        layer layout (per-layer dicts) to rebuild the uniform stage stack."""
        assert "layers_list" in self.weights \
            or "layers_stacked" in self.weights, \
            "pipeline parallelism needs layer_loop='unroll'/'unroll_stacked'"
        from ..parallel.mesh import replicate
        from ..parallel.pipeline import (decoder_forward_pp, pp_pack_weights,
                                         pp_shard_weights)
        cfg = self.cfg
        if "layers_stacked" in self.weights:
            stack = self.weights["layers_stacked"]
            body = [jax.tree_util.tree_map(lambda v, _l=l: v[_l], stack)
                    for l in range(cfg.n_layers - 1)]
        else:
            body = list(self.weights["layers_list"])
        layers = body + [self.weights["last_layer"]]
        raw = {"layers": layers, "embed": self.weights["embed"],
               "norm": self.weights["norm"],
               "lm_head": self.weights["lm_head"]}
        self._pp_weights = pp_shard_weights(
            pp_pack_weights(raw, mesh.shape["pp"]), mesh)
        self._pp_mesh = mesh
        # drop the unsharded copy: PP exists for memory capacity — keeping
        # the full per-layer weights alive alongside the stage shards would
        # hold ~full-model HBM on every host
        self.weights = None
        self.cos_tab, self.sin_tab = replicate((self.cos_tab, self.sin_tab),
                                               mesh)
        # the fused multi-step window is not built for the relay program
        self.supports_multi_step = False

        def _flat_pp_fn(w, cache, token_table, flat, image_cache,
                        cos_tab, sin_tab, dims):
            from .factory import unpack_fill_batch
            from ..parallel.pipeline import decoder_forward_pp_decode
            batch = unpack_fill_batch(flat, image_cache, dims, cfg.hidden_size)
            # pure-decode batches take the microbatched (GPipe) schedule —
            # every stage busy once the pipe fills — the relay otherwise
            if dims.max_q == 1 and dims.Ti == 0 \
                    and dims.S % mesh.shape["pp"] == 0 \
                    and dims.S >= mesh.shape["pp"]:
                return decoder_forward_pp_decode(
                    w, cache, batch, cos_tab, sin_tab, cfg, token_table,
                    mesh, n_micro=mesh.shape["pp"])
            return decoder_forward_pp(w, cache, batch, cos_tab, sin_tab,
                                      cfg, dims.max_q, token_table, mesh)

        self._flat_pp = jax.jit(_flat_pp_fn, static_argnames=("dims",),
                                donate_argnames=("cache", "token_table"))

    def forward(self, cache: jax.Array, token_table: jax.Array,
                batch: LanguageModelBatch, max_q: int) -> LanguageModelOutput:
        cache, token_table, tokens = self._step(
            self.weights, cache, batch, self.cos_tab, self.sin_tab,
            max_q=max_q, token_table=token_table)
        return LanguageModelOutput(sample_token_ids=tokens, cache=cache,
                                   token_table=token_table)

    def forward_flat(self, cache, token_table: jax.Array,
                     flat: jax.Array, image_cache: jax.Array,
                     dims, n_steps: int = 1,
                     fused_k=None) -> LanguageModelOutput:
        if getattr(self, "_pp_mesh", None) is not None:
            cache, token_table, tokens = self._flat_pp(
                self._pp_weights, cache, token_table, flat, image_cache,
                self.cos_tab, self.sin_tab, dims=dims)
            return LanguageModelOutput(sample_token_ids=tokens, cache=cache,
                                       token_table=token_table)
        if getattr(dims, "spec", 0) > 0:
            is_ref = isinstance(cache, jax.Ref) or (
                isinstance(cache, (list, tuple)) and len(cache) > 0
                and isinstance(cache[0], jax.Ref))
            step = self._flat_spec if is_ref else self._flat_spec_value
            cache, token_table, tokens = step(
                self.weights, cache, token_table, flat, image_cache,
                self.cos_tab, self.sin_tab, dims=dims)
            return LanguageModelOutput(sample_token_ids=tokens, cache=cache,
                                       token_table=token_table)
        is_ref = isinstance(cache, jax.Ref) or (
            isinstance(cache, (list, tuple)) and len(cache) > 0
            and isinstance(cache[0], jax.Ref))
        if n_steps > 1:
            if fused_k is None:
                fused_k = np.full(dims.S, n_steps, np.int32)
            step = self._flat_multi if is_ref else self._flat_multi_value
            cache, token_table, tokens = step(
                self.weights, cache, token_table, flat, image_cache,
                self.cos_tab, self.sin_tab, jnp.asarray(fused_k),
                dims=dims, n_steps=n_steps)
        else:
            step = self._flat_step if is_ref else self._flat_step_value
            cache, token_table, tokens = step(
                self.weights, cache, token_table, flat, image_cache,
                self.cos_tab, self.sin_tab, dims=dims)
        return LanguageModelOutput(sample_token_ids=tokens, cache=cache,
                                   token_table=token_table)

    def forward_with_logits(self, cache, batch, max_q: int,
                            input_embeds: Optional[jax.Array] = None):
        """Test/debug path: also returns fp32 logits at the sampled rows."""
        cache, _, tokens, logits = self._step(
            self.weights, cache, batch, self.cos_tab, self.sin_tab,
            max_q=max_q, input_embeds=input_embeds, return_logits=True,
            token_table=jnp.zeros((1,), jnp.int32))
        return cache, tokens, logits
