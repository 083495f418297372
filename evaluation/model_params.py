"""Model memory/roofline table (reference: evaluation/model_params/ —
per-model parameter counts and memory budgeting feeding deployment sizing).

For a local checkpoint (--path) or the built-in random-weight archs, emits:
parameter counts (vision/LM), weight bytes at bf16/int8/int4, KV-cache
bytes per token, and the single-chip HBM-bandwidth decode roofline at a few
batch sizes — the numbers that size n_kv_blocks and pick a quantization.

Usage:
  python -m evaluation.model_params --arch qwen2-vl-2b-lm
  python -m evaluation.model_params --path /models/llava-1.5-7b-hf
"""
import argparse
import json

V5E_HBM_BW = 819e9      # bytes/s


def table_for(factory) -> dict:
    cnt = factory.getModelParamsCount()
    lc = factory.getLanguageModelConfig()
    lm_params = cnt.language_model_params
    kv_per_token = lc.n_layers * 2 * lc.n_kv_heads * lc.head_dim  # elements
    rows = {}
    for name, bytes_per in (("bf16", 2), ("int8", 1), ("int4", 0.5)):
        wbytes = lm_params * bytes_per
        rows[name] = {
            "weight_gb": round(wbytes / 1e9, 2),
            "decode_roofline_tok_s": {
                b: int(b / (wbytes / V5E_HBM_BW)) for b in (8, 32, 128)},
        }
    return {
        "vision_params_m": round(cnt.vision_model_params / 1e6, 1),
        "lm_params_m": round(lm_params / 1e6, 1),
        "kv_bytes_per_token_bf16": kv_per_token * 2,
        "by_weight_dtype": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default=None, help="random-weight arch preset")
    ap.add_argument("--path", default=None, help="HF checkpoint dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    if args.path:
        from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
        factory = getModelFactory(ModelFactoryConfig(path=args.path,
                                                     dtype="bf16"))
        name = args.path
    else:
        from hydrainfer_tpu.models.random_init import RandomWeightFactory
        name = args.arch or "qwen2-vl-2b-lm"
        factory = RandomWeightFactory(name)
    summary = {"model": name, **table_for(factory)}
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
