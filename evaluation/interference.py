"""Encode/prefill/decode interference analysis — the measurement that
justifies EPD disaggregation (reference: hydrainfer/engine/profiler.py:195-240
offline interference analysis; the paper's motivating experiment).

On a GPU the reference overlaps stages on CUDA streams and measures
cross-stream slowdown; on a TPU every program serializes on the device
queue, so interference is HEAD-OF-LINE BLOCKING: an encode (ViT forward) or
a long prefill chunk enqueued between decode steps stretches every running
request's TBT by the intruder's full device time. This script measures the
three stage latencies in isolation and then the colocated mix, and reports
the decode-TBT inflation a colocated node suffers — the number EPD
disaggregation buys back.

Usage (chip):   python -m evaluation.interference --arch qwen2-vl-2b-lm
        (CPU):  python -m evaluation.interference --tiny --platform cpu

Emits JSON to --out and a markdown table to stdout.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/hydrainfer_jax_cache")

import argparse
import json
import time

import numpy as np


def _engine(factory, n_kv_blocks, n_image_blocks, image_block_size,
            max_running, node_type, encode_chunk_layers=0):
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(
            max_running_requests=max_running, priority="prefill"),
        request_processor=RequestProcessorConfig(num_request_process_workers=1),
        kv_block_size=16,
        n_kv_blocks=n_kv_blocks,
        n_image_blocks=n_image_blocks,
        image_block_size=image_block_size,
        # per-token reads: interference shows up in raw token gaps
        postprocess_batch_steps=1, adaptive_postprocess=False,
        async_pipeline_depth=2)
    # pre-ratchet the S/MB jit-key floors at boot: without this the warm
    # run's prefill compiles at the un-ratcheted floors, decode growth then
    # ratchets them, and the MEASURED run's first prefill re-keys (MB 8→16)
    # — a one-time ~8s mid-measurement compile that looked like a stall
    cfg.boot_warmup = True
    cfg.encode_chunk_layers = encode_chunk_layers
    cfg.model.dtype = "bf16"
    return OfflineEngine(cfg, model_factory=factory, node_type=node_type)


def _requests(n, prompt_len, max_tokens, image_every=0, image_size=336,
              tag="r"):
    import string
    import zlib

    from PIL import Image

    from hydrainfer_tpu.request import Request, SamplingParameters
    # distinct prompts per tag: a shared seed would make the measured
    # requests EXACT prefix-cache hits of the warmup's, so the measured
    # round would prefill a shorter (never-warmed) token-count bucket and
    # pay its compile mid-measurement (~7.5s on the chip — observed)
    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    reqs = []
    for i in range(n):
        prompt = "".join(rng.choice(list(string.ascii_lowercase + " "),
                                    size=prompt_len))
        image = None
        if image_every and i % image_every == 0:
            image = Image.fromarray(rng.integers(
                0, 255, (image_size, image_size, 3), dtype=np.uint8))
            prompt = "<image> " + prompt
        reqs.append(Request(request_id=f"{tag}{i}", prompt=prompt, image=image,
                            sampling_params=SamplingParameters(
                                max_tokens=max_tokens, ignore_eos=True)))
    return reqs


def _token_gaps(outs):
    gaps = [np.diff(o.token_times) for o in outs if len(o.token_times) > 1]
    return np.concatenate(gaps) if gaps else np.array([0.0])


def run_analysis(arch: str, tiny: bool = False, batch: int = 16,
                 prompt_len: int = 128, gen: int = 64,
                 encode_chunk_layers: int = 0):
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    if tiny:
        batch, prompt_len, gen = 4, 16, 12

    results = {}

    def measure(name, engine, make_reqs, *warm_factories):
        # TWO warm passes with DISTINCT fresh prompts: batch composition is
        # timing-nondeterministic (especially encode/prefill interleaves —
        # and chunked-encode segment programs key on image-count buckets),
        # so one pass can leave jit keys for the measured pass to mint
        # mid-measurement (observed: a ~8s compile inside the chunked
        # colocated measure turned 843 tok/s into 109). Reusing the same
        # prompts would instead make the later pass an exact prefix-cache
        # hit (different, shorter prefill buckets) — hence one factory per
        # pass. Same methodology as bench.py's two measured rounds.
        for warm in warm_factories:
            engine.generate(warm(), timeout_s=1200)
        # requests are created AFTER the warmup: arrival_time stamps at
        # construction, so building them earlier would fold the warmup's
        # compile time into every measured TTFT
        reqs = make_reqs()
        t0 = time.perf_counter()
        outs = engine.generate(reqs, timeout_s=1200)
        elapsed = time.perf_counter() - t0
        gaps = _token_gaps(outs)
        results[name] = {
            "elapsed_s": round(elapsed, 3),
            "ttft_p50_s": round(float(np.median([o.ttft for o in outs])), 4),
            "tbt_p50_s": round(float(np.median(gaps)), 5),
            "tbt_p90_s": round(float(np.percentile(gaps, 90)), 5),
            "tbt_p99_s": round(float(np.percentile(gaps, 99)), 5),
            "tokens_per_s": round(
                sum(len(o.output_token_ids) for o in outs) / elapsed, 1),
        }
        return outs

    img_tokens = None

    # 1. decode-only (text requests, PD node)
    factory = RandomWeightFactory(arch, multimodal=False, layer_loop="unroll")
    kv_blocks = max(256, 2 * batch * (prompt_len + gen) // 16)
    eng = _engine(factory, kv_blocks, 1, -1, batch, "PD")
    measure("decode_only", eng,
            lambda: _requests(batch, prompt_len, gen, tag="d"),
            lambda: _requests(batch, prompt_len, gen, tag="dw"),
            lambda: _requests(batch, prompt_len, gen, tag="dw2"))
    del eng

    # 2 + 3. colocated EPD: same text workload with every 4th request
    # carrying an image, vs encode-only
    factory_mm = RandomWeightFactory(arch, multimodal=True, layer_loop="unroll")
    img_tokens = factory_mm.clip_cfg.n_patches
    eng = _engine(factory_mm, kv_blocks, max(8, batch), img_tokens, batch,
                  "EPD", encode_chunk_layers=encode_chunk_layers)
    measure("encode_only", eng,
            lambda: _requests(batch // 2, 4, 2, image_every=1, tag="e"),
            lambda: _requests(batch // 2, 4, 2, image_every=1, tag="ew"),
            lambda: _requests(batch // 2, 4, 2, image_every=1, tag="ew2"))
    measure("colocated_epd", eng,
            lambda: _requests(batch, prompt_len, gen, image_every=4, tag="c"),
            lambda: _requests(batch, prompt_len, gen, image_every=4, tag="cw"),
            lambda: _requests(batch, prompt_len, gen, image_every=4, tag="cw2"))
    del eng

    d, c = results["decode_only"], results["colocated_epd"]
    interference = {
        "decode_tbt_p90_inflation": round(
            c["tbt_p90_s"] / max(d["tbt_p90_s"], 1e-9), 2),
        "decode_tbt_p99_inflation": round(
            c["tbt_p99_s"] / max(d["tbt_p99_s"], 1e-9), 2),
        "decode_throughput_ratio": round(
            c["tokens_per_s"] / max(d["tokens_per_s"], 1e-9), 3),
    }
    return {"arch": arch, "batch": batch, "prompt_len": prompt_len,
            "gen": gen, "image_tokens": img_tokens,
            "encode_chunk_layers": encode_chunk_layers,
            "stages": results, "interference": interference}


def to_markdown(r) -> str:
    lines = [
        f"# Interference analysis — {r['arch']} "
        f"(b{r['batch']}, prompt {r['prompt_len']}, gen {r['gen']})",
        "",
        "| stage | tok/s | ttft p50 | tbt p50 | tbt p90 | tbt p99 |",
        "|---|---|---|---|---|---|",
    ]
    for name, s in r["stages"].items():
        lines.append(
            f"| {name} | {s['tokens_per_s']} | {s['ttft_p50_s']}s "
            f"| {s['tbt_p50_s']}s | {s['tbt_p90_s']}s | {s['tbt_p99_s']}s |")
    i = r["interference"]
    lines += [
        "",
        f"Colocating encode with decode inflates decode TBT p90 by "
        f"**{i['decode_tbt_p90_inflation']}x** (p99 "
        f"{i['decode_tbt_p99_inflation']}x) and moves decode throughput by "
        f"{i['decode_throughput_ratio']}x — on a TPU the ViT forward is "
        "head-of-line blocking on the single device queue, which is what an "
        "E/P/D split removes (reference: engine/profiler.py:195-240).",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="qwen2-vl-2b-lm")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes for CPU smoke runs")
    ap.add_argument("--encode-chunk-layers", type=int, default=0,
                    help="layer-chunked encode segment size for the "
                         "colocated engine (0 = whole tower)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    r = run_analysis(args.arch, tiny=args.tiny, batch=args.batch,
                     prompt_len=args.prompt_len, gen=args.gen,
                     encode_chunk_layers=args.encode_chunk_layers)
    print(to_markdown(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(r, f, indent=1)


if __name__ == "__main__":
    main()
