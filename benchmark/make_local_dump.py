"""Construct a LOCAL lmms-lab-shaped dataset dump (no egress in this
environment), so the real-dataset pipeline —
``datasets.save_to_disk`` dir → benchmark.data_preprocess →
benchmark entries → slo_run/benchmark — runs end to end exactly as it
would on a downloaded TextCaps/POPE/... dump
(reference: benchmark/synthetic_dataset.py:42-48 pulls lmms-lab datasets).

The rows follow the TextCaps schema (``question`` + PIL ``image``):
questions are drawn from caption/VQA phrasings, images are procedurally
rendered scenes (colored shapes + text glyphs) — perf-identical to
photographs for a serving benchmark (the ViT sees (336, 336, 3) pixels
either way).

Usage:
  python -m benchmark.make_local_dump --out /tmp/textcaps_local --n 64
  python -m benchmark.data_preprocess --src /tmp/textcaps_local \
      --dataset textcaps --out /tmp/textcaps_entries.json
"""
import argparse
import random


QUESTIONS = [
    "Please carefully observe the image and describe what you see.",
    "What text is visible in this image? Read it out.",
    "Provide a one-sentence caption for the provided image.",
    "What objects are present and how are they arranged?",
    "Describe the colors and layout of the scene in detail.",
    "Is there any writing on the signs in this picture? What does it say?",
    "Summarize the content of this image for a visually impaired user.",
    "What brand or label names can you identify in the image?",
]


def render_image(rng: random.Random, size: int = 336):
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (size, size),
                    tuple(rng.randrange(40, 216) for _ in range(3)))
    draw = ImageDraw.Draw(img)
    for _ in range(rng.randrange(4, 10)):
        shape = rng.choice(["rect", "ellipse", "line", "text"])
        box = sorted(rng.sample(range(size), 2)), sorted(
            rng.sample(range(size), 2))
        xy = [box[0][0], box[1][0], box[0][1], box[1][1]]
        color = tuple(rng.randrange(256) for _ in range(3))
        if shape == "rect":
            draw.rectangle(xy, outline=color, width=rng.randrange(1, 6))
        elif shape == "ellipse":
            draw.ellipse(xy, fill=color)
        elif shape == "line":
            draw.line(xy, fill=color, width=rng.randrange(1, 8))
        else:
            draw.text((xy[0], xy[2]),
                      rng.choice(["OPEN", "EXIT 42", "CAFE", "STOP",
                                  "Main St", "SALE 50%"]), fill=color)
    return img


def build(n: int, seed: int = 0):
    import datasets
    rng = random.Random(seed)
    rows = {"question": [], "image": []}
    for i in range(n):
        rows["question"].append(QUESTIONS[i % len(QUESTIONS)])
        rows["image"].append(render_image(rng))
    return datasets.Dataset.from_dict(
        rows, features=datasets.Features(
            {"question": datasets.Value("string"),
             "image": datasets.Image()}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    ds = build(args.n, args.seed)
    ds.save_to_disk(args.out)
    print(f"{len(ds)} rows -> {args.out}")


if __name__ == "__main__":
    main()
