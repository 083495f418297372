#!/usr/bin/env python
"""Serving benchmark — prints ONE JSON line with the headline metric.

Measures end-to-end engine decode throughput (continuous batching scheduler
+ paged-cache executor + jitted LM step) on one chip, at the Qwen2-VL-2B
language-tower architecture (BASELINE.json config 1) with random bf16
weights — random weights have identical perf characteristics to trained
ones, and no weights ship in this environment.

vs_baseline is measured/roofline where roofline is the HBM-bandwidth bound
for batched decode: B tokens per full weight read, BW = 819 GB/s (v5e).
"""
import argparse
import json
import os
import string
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hydrainfer_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.factory import (ImageTokenCalculator,
                                           LanguageModelConfig, ModelFactory,
                                           VisionModelConfig)
from hydrainfer_tpu.models.llama import LlamaForCausalLM
from hydrainfer_tpu.models.random_init import ARCH_CONFIGS, init_decoder_weights
from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
from hydrainfer_tpu.request import Request, SamplingParameters

V5E_HBM_BW = 819e9  # bytes/s


class _NoImages(ImageTokenCalculator):
    def get_num_image_tokens(self, image_size):
        return 0


class RandomWeightFactory(ModelFactory):
    def __init__(self, arch: str, dtype=jnp.bfloat16, quantization: str = "none",
                 kv_scale=None):
        self.cfg = ARCH_CONFIGS[arch]
        self.dtype = dtype
        self.quantization = quantization
        self.kv_scale = kv_scale
        self._lm = None

    def getLanguageModel(self):
        if self._lm is None:
            w = init_decoder_weights(self.cfg, jax.random.PRNGKey(0), self.dtype)
            self._lm = LlamaForCausalLM(w, self.cfg, self.quantization,
                                        kv_scale=self.kv_scale)
        return self._lm

    def getVisionModel(self):
        return None

    def getVisionModelConfig(self):
        return VisionModelConfig("", -1, _NoImages())

    def getLanguageModelConfig(self):
        c = self.cfg
        return LanguageModelConfig(
            n_layers=c.n_layers, max_position_embeddings=c.max_position_embeddings,
            n_qo_heads=c.n_qo_heads, n_kv_heads=c.n_kv_heads, head_dim=c.head_dim,
            eos_token_id=2, hidden_size=c.hidden_size, vocab_size=c.vocab_size)

    def getProcessor(self):
        return None

    def getTokenizer(self):
        return SimpleTokenizer()

    def param_bytes(self):
        lm = self.getLanguageModel()
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(lm.weights))


def run_bench(arch: str, n_requests: int, prompt_len: int, max_tokens: int,
              token_budget: int, quantization: str = "none",
              kv_int8: bool = False):
    factory = RandomWeightFactory(arch, quantization=quantization,
                                  kv_scale=0.05 if kv_int8 else None)
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(
            max_running_requests=n_requests, priority="prefill"),
        request_processor=RequestProcessorConfig(num_request_process_workers=1),
        kv_block_size=16,
        n_kv_blocks=max(256, 2 * n_requests * (prompt_len + max_tokens) // 16),
        n_image_blocks=1,
    )
    cfg.model.dtype = "bf16"
    if kv_int8:
        cfg.model.kv_cache_dtype = "int8"
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    engine.node.batch_scheduler.token_budget = token_budget

    rng = np.random.default_rng(0)

    def make_requests(n, tag):
        reqs = []
        for i in range(n):
            prompt = "".join(rng.choice(list(string.ascii_lowercase + " "),
                                        size=prompt_len))
            reqs.append(Request(
                request_id=f"{tag}{i}", prompt=prompt,
                sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                   ignore_eos=True)))
        return reqs

    # warmup: compile the same prefill/decode buckets the measurement hits
    engine.generate(make_requests(n_requests, "warm"), timeout_s=1200)

    reqs = make_requests(n_requests, "bench")
    t0 = time.perf_counter()
    outs = engine.generate(reqs, timeout_s=1200)
    elapsed = time.perf_counter() - t0

    total_tokens = sum(len(o.output_token_ids) for o in outs)
    assert total_tokens == n_requests * max_tokens
    tput = total_tokens / elapsed

    # steady-state decode roofline: B tokens per full weight read from HBM
    roofline = n_requests / (factory.param_bytes() / V5E_HBM_BW)
    ttfts = sorted(o.ttft for o in outs)
    # average inter-token time per request (robust to batched postprocess
    # delivering tokens in bursts: per-token diffs would read ~0)
    tbts = [(o.token_times[-1] - o.token_times[0]) / (len(o.token_times) - 1)
            for o in outs if len(o.token_times) > 1]
    return {
        "metric": f"engine_decode_tokens_per_s_per_chip_{arch}_" + (quantization if quantization != "none" else "bf16") + ("_kvint8" if kv_int8 else ""),
        "value": round(tput, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tput / roofline, 4),
        "detail": {
            "n_requests": n_requests, "prompt_len": prompt_len,
            "max_tokens": max_tokens, "elapsed_s": round(elapsed, 2),
            "roofline_tokens_per_s": round(roofline, 1),
            "p50_ttft_s": round(ttfts[len(ttfts) // 2], 4),
            "p50_tbt_s": round(float(np.median(tbts)), 5) if tbts else None,
            "platform": jax.devices()[0].platform,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--n-requests", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--quant", default="none", choices=["none", "int8", "int4"])
    ap.add_argument("--kv-int8", action="store_true")
    args = ap.parse_args()
    result = run_bench(args.arch, args.n_requests, args.prompt_len,
                       args.max_tokens, args.token_budget, args.quant,
                       kv_int8=args.kv_int8)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
