#!/usr/bin/env python
"""Serving benchmark — prints ONE JSON line with the headline metric.

Measures end-to-end engine decode throughput (continuous batching scheduler
+ paged-cache executor + jitted LM step) on one chip, at the LLaVA-7B
language-tower architecture (the BASELINE north-star metric: tokens/s/chip
at LLaVA-7B INT8; vicuna-7B shapes, full MHA) with random weights — random
weights have identical perf characteristics to trained ones, and no weights
ship in this environment. --arch qwen2-vl-2b-lm is the r1-r3 secondary line.

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
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters

V5E_HBM_BW = 819e9  # bytes/s


def run_bench(arch: str, n_requests: int, prompt_len: int, max_tokens: int,
              token_budget: int, quantization: str = "none",
              kv_int8: bool = False, image_ratio: float = 0.0,
              kv_blocks: int = 0, kv_ref: bool = True,
              attn_impl: str = "auto", layer_loop: str = "",
              trace_dir: str = "", pipeline: str = "",
              multi_step: int = 0, post_batch_steps: int = 0,
              pipeline_depth: int = 0, bisect: str = "",
              kv_pages_per_block: int = 0, block_size: int = 16,
              breakdown: bool = False, encode_chunk: int = -1,
              encode_chunk_layers: int = 0):
    from hydrainfer_tpu.models.random_init import ARCH_CONFIGS
    if not layer_loop:
        # unroll is the measured default for standard attention; MLA archs
        # take scan — the latent kernel reads the STACKED cache, and
        # unrolled per-layer buffers would silently fall back to the oracle
        layer_loop = ("scan" if ARCH_CONFIGS[arch].mla_kv_lora > 0
                      else "unroll")
    if attn_impl == "layered":
        layer_loop = "scan"   # the layered kernel wants the stacked value cache
    factory = RandomWeightFactory(arch, quantization=quantization,
                                  kv_scale=0.05 if kv_int8 else None,
                                  multimodal=image_ratio > 0,
                                  layer_loop=layer_loop, bisect=bisect,
                                  kv_pages_per_block=(kv_pages_per_block
                                                      or None))
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(
            max_running_requests=n_requests, priority="prefill"),
        request_processor=RequestProcessorConfig(num_request_process_workers=1),
        kv_block_size=block_size,
        n_kv_blocks=kv_blocks or max(
            256 * 16 // block_size,
            2 * n_requests * (prompt_len + max_tokens) // block_size),
        n_image_blocks=1,
    )
    cfg.kv_cache_ref = kv_ref
    # converge the jit-key set at boot (floor pre-ratchet + decode warmup):
    # without this the measured run eats ~22s of mid-run re-compiles when
    # the S/MB floors ratchet during the warmup pass
    cfg.boot_warmup = True
    cfg.model.dtype = "bf16"
    cfg.model.attention_impl = attn_impl
    if pipeline:
        cfg.pipeline_mode = pipeline
    if multi_step:
        cfg.multi_step_decode = multi_step
    if post_batch_steps:
        cfg.postprocess_batch_steps = post_batch_steps
        cfg.adaptive_postprocess = False
    if pipeline_depth:
        cfg.async_pipeline_depth = pipeline_depth
    if kv_int8:
        cfg.model.kv_cache_dtype = "int8"
    if image_ratio > 0:
        cfg.n_image_blocks = max(8, n_requests)
        cfg.image_block_size = factory.clip_cfg.n_patches
    if breakdown:
        cfg.log_latency_breakdown = True
    if encode_chunk >= 0:
        cfg.batch_scheduler.encode_chunk_images = encode_chunk
    if encode_chunk_layers:
        cfg.encode_chunk_layers = encode_chunk_layers
    engine = OfflineEngine(cfg, model_factory=factory,
                           node_type="EPD" if image_ratio > 0 else "PD")
    engine.node.batch_scheduler.token_budget = token_budget

    rng = np.random.default_rng(0)

    from PIL import Image

    def make_requests(n, tag):
        reqs = []
        for i in range(n):
            prompt = "".join(rng.choice(list(string.ascii_lowercase + " "),
                                        size=prompt_len))
            image = None
            if image_ratio > 0 and (i % max(1, int(1 / image_ratio))) == 0:
                image = Image.fromarray(rng.integers(
                    0, 255, (336, 336, 3), dtype=np.uint8))
                prompt = "<image> " + prompt
            reqs.append(Request(
                request_id=f"{tag}{i}", prompt=prompt, image=image,
                sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                   ignore_eos=True)))
        return reqs

    # warmup: compile the same prefill/decode buckets the measurement hits.
    # Two passes: batch composition is timing-nondeterministic (especially
    # the encode/prefill interleave at image_ratio>0), so a single pass can
    # leave jit keys for the measured run to mint mid-measurement — the
    # first measured pass below converges the residue and the SECOND is the
    # reported steady state (its cold stats ride along in detail).
    engine.generate(make_requests(n_requests, "warm"), timeout_s=1200)

    from hydrainfer_tpu.utils import hostprof
    hostprof.reset()   # report covers only the measured rounds
    cold = None
    for rnd in range(2):
        reqs = make_requests(n_requests, f"bench{rnd}")
        if trace_dir and rnd == 1:
            # trace ONLY the reported phase (warmup compiles would bloat
            # the xplane beyond what the tunnel can ship back)
            jax.profiler.start_trace(trace_dir,
                                     create_perfetto_trace=True)
        t0 = time.perf_counter()
        outs = engine.generate(reqs, timeout_s=1200)
        elapsed = time.perf_counter() - t0
        if trace_dir and rnd == 1:
            jax.profiler.stop_trace()
        if rnd == 0:
            total = sum(len(o.output_token_ids) for o in outs)
            cold = {"tokens_per_s": round(total / elapsed, 2),
                    "p50_ttft_s": round(sorted(
                        o.ttft for o in outs)[len(outs) // 2], 4)}

    total_tokens = sum(len(o.output_token_ids) for o in outs)
    assert total_tokens == n_requests * max_tokens
    tput = total_tokens / elapsed
    if hostprof.enabled:
        print("HOSTPROF " + json.dumps(hostprof.report()), file=sys.stderr)
    if hostprof.events_enabled:
        t_base = hostprof.events[0][2] if hostprof.events else 0.0
        for name, tag, t in hostprof.events:
            print(f"EV {t - t_base:9.4f} {name} {tag}", file=sys.stderr)

    # steady-state decode roofline: B tokens per full weight read from HBM.
    # vs_baseline is pinned to the BF16 roofline regardless of --quant so
    # the headline ratio is comparable across rounds and configs (the
    # north-star metric is tokens/s/chip at INT8, measured against the
    # model's bf16 bandwidth bound); the dtype-true roofline is in detail.
    roofline_true = n_requests / (factory.param_bytes() / V5E_HBM_BW)
    roofline = n_requests / (factory.param_count() * 2 / V5E_HBM_BW)
    ttfts = sorted(o.ttft for o in outs)
    # average inter-token time per request (robust to batched postprocess
    # delivering tokens in bursts: per-token diffs would read ~0)
    tbts = [(o.token_times[-1] - o.token_times[0]) / (len(o.token_times) - 1)
            for o in outs if len(o.token_times) > 1]
    # honest per-token gaps: what a per-token SLO checker sees. With batched
    # postprocess (K>1) tokens arrive in bursts, so p90 of raw diffs
    # captures the burst gap the averaged tbt hides.
    gaps = np.concatenate([np.diff(o.token_times) for o in outs
                           if len(o.token_times) > 1]) if tbts else np.array([0.0])
    return {
        "metric": f"engine_decode_tokens_per_s_per_chip_{arch}_" + (quantization if quantization != "none" else "bf16") + ("_kvint8" if kv_int8 else ""),
        "value": round(tput, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tput / roofline, 4),
        "detail": {
            "n_requests": n_requests, "prompt_len": prompt_len,
            "max_tokens": max_tokens, "elapsed_s": round(elapsed, 2),
            "roofline_tokens_per_s": round(roofline, 1),
            "roofline_at_weight_dtype_tokens_per_s": round(roofline_true, 1),
            "p50_ttft_s": round(ttfts[len(ttfts) // 2], 4),
            "p50_tbt_s": round(float(np.median(tbts)), 5) if tbts else None,
            "p90_token_gap_s": round(float(np.percentile(gaps, 90)), 5),
            # with batched/fused delivery most gaps are ~0 inside a burst,
            # so p90 dilutes; p99/max expose the true inter-burst stall a
            # per-token SLO checker would see
            "p99_token_gap_s": round(float(np.percentile(gaps, 99)), 5),
            "max_token_gap_s": round(float(np.max(gaps)), 5),
            "image_ratio": image_ratio,
            "first_round_cold": cold,
            "platform": jax.devices()[0].platform,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="llava-7b-lm",
                    help="default = the BASELINE north-star architecture "
                         "(LLaVA-7B language tower); qwen2-vl-2b-lm is the "
                         "r1-r3 secondary line")
    ap.add_argument("--n-requests", type=int, default=48,
                help="48 = the measured throughput-optimal batch at the 7B\n                     headline (b32: best roofline ratio; b64: TTFT 1s)")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--token-budget", type=int, default=2048)
    ap.add_argument("--quant", default="int8",
                    choices=["none", "int8", "int4", "fp8"],
                    help="headline config is int8 weights (BASELINE.json "
                         "north star); --quant none measures bf16")
    ap.add_argument("--kv-int8", default=True,
                    action=argparse.BooleanOptionalAction)
    ap.add_argument("--image-ratio", type=float, default=0.0)
    ap.add_argument("--kv-blocks", type=int, default=0,
                    help="force the KV pool size (0 = fit to the workload)")
    ap.add_argument("--no-kv-ref", action="store_true",
                    help="disable the jax.Ref in-place cache (A/B testing)")
    ap.add_argument("--attn-impl", default="auto",
                    choices=["auto", "ragged", "layered", "jnp"],
                    help="paged-attention handler (layered = builder kernel "
                         "over the full multi-layer cache)")
    ap.add_argument("--layer-loop", default="",
                    choices=["", "scan", "unroll", "unroll_stacked"],
                    help="scan over stacked weights vs unrolled per-layer "
                         "loop with per-layer cache buffers")
    ap.add_argument("--trace-dir", default="",
                    help="capture a jax.profiler trace (xplane/perfetto) of "
                         "the measured run into this directory")
    ap.add_argument("--pipeline", default="",
                    choices=["", "batched", "incremental", "threaded", "sync"],
                    help="token-read pipeline mode (see NodeConfig; empty = "
                         "node default)")
    ap.add_argument("--multi-step", type=int, default=0,
                    help="fused decode window K (0 = node default)")
    ap.add_argument("--post-batch-steps", type=int, default=0,
                    help="token-read batching depth in device steps "
                         "(disables the adaptive policy; 0 = node default)")
    ap.add_argument("--encode-chunk-layers", type=int, default=0,
                    help="layer-chunked ViT encode: tower segment size in "
                         "layers (0 = whole tower in one program)")
    ap.add_argument("--kv-pages-per-block", type=int, default=0,
                    help="decode-kernel DMA block size in kv pages "
                         "(0 = kernel default)")
    ap.add_argument("--pipeline-depth", type=int, default=0,
                    help="async pipeline depth in device steps (how many "
                         "fused-window steps may be in flight before the "
                         "oldest is read; 0 = node default)")
    args = ap.parse_args()
    result = run_bench(args.arch, args.n_requests, args.prompt_len,
                       args.max_tokens, args.token_budget, args.quant,
                       kv_int8=args.kv_int8, image_ratio=args.image_ratio,
                       kv_blocks=args.kv_blocks, kv_ref=not args.no_kv_ref,
                       attn_impl=args.attn_impl,
                       layer_loop=args.layer_loop, trace_dir=args.trace_dir,
                       pipeline=args.pipeline, multi_step=args.multi_step,
                       post_batch_steps=args.post_batch_steps,
                       pipeline_depth=args.pipeline_depth,
                       encode_chunk_layers=args.encode_chunk_layers,
                       kv_pages_per_block=args.kv_pages_per_block)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
