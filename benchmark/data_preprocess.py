"""Real-dataset preprocessing → entries JSON
(reference: benchmark/data_preprocess.py — converts lmms-lab
TextCaps/POPE/MME/TextVQA/VizWiz dumps into the benchmark's entry format).

This environment has no egress, so instead of downloading, this converts a
LOCAL dump: either a HuggingFace `datasets.save_to_disk` directory or a
JSON/JSONL file. Known lmms-lab schemas get their question/image columns
mapped automatically; anything else can be mapped with --prompt-key /
--image-key.

Usage:
  python -m benchmark.data_preprocess --src /data/textcaps --dataset textcaps \
      --out entries.json --limit 512
"""
import argparse
import base64
import io
import json
import os

# lmms-lab column conventions (reference datasets)
SCHEMAS = {
    "textcaps": {"prompt": "question", "image": "image"},
    "textvqa": {"prompt": "question", "image": "image"},
    "pope": {"prompt": "question", "image": "image"},
    "mme": {"prompt": "question", "image": "image"},
    "vizwiz": {"prompt": "question", "image": "image"},
}


def _img_to_b64(img) -> str:
    from PIL import Image
    if isinstance(img, dict) and "bytes" in img:      # datasets Image dict
        return base64.b64encode(img["bytes"]).decode()
    if not isinstance(img, Image.Image):
        img = Image.fromarray(img)
    buf = io.BytesIO()
    img.convert("RGB").save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def iter_rows(src: str):
    if os.path.isdir(src):
        try:
            from datasets import load_from_disk
        except ImportError as e:
            raise SystemExit("`datasets` not installed; preprocess the dump "
                             "to JSONL elsewhere and pass the file") from e
        ds = load_from_disk(src)
        if hasattr(ds, "values"):                     # DatasetDict
            ds = next(iter(ds.values()))
        yield from ds
    elif src.endswith(".jsonl"):
        with open(src) as f:
            for line in f:
                if line.strip():
                    yield json.loads(line)
    else:
        with open(src) as f:
            yield from json.load(f)


def convert(src: str, dataset: str, prompt_key=None, image_key=None,
            max_tokens: int = 128, limit: int = 0):
    schema = SCHEMAS.get(dataset, {})
    pk = prompt_key or schema.get("prompt", "prompt")
    ik = image_key or schema.get("image", "image")
    out = []
    for row in iter_rows(src):
        prompt = row.get(pk) or ""
        img = row.get(ik)
        entry = {"prompt": ("<image> " + prompt) if img is not None else prompt,
                 "max_tokens": max_tokens, "dataset": dataset}
        if img is not None:
            entry["image_base64"] = _img_to_b64(img)
        out.append(entry)
        if limit and len(out) >= limit:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="datasets.save_to_disk dir, .json or .jsonl")
    ap.add_argument("--dataset", default="textcaps", help="schema name")
    ap.add_argument("--prompt-key", default=None)
    ap.add_argument("--image-key", default=None)
    ap.add_argument("--max-tokens", type=int, default=128)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    entries = convert(args.src, args.dataset, args.prompt_key, args.image_key,
                      args.max_tokens, args.limit)
    with open(args.out, "w") as f:
        json.dump(entries, f)
    print(f"{len(entries)} entries -> {args.out}")


if __name__ == "__main__":
    main()
