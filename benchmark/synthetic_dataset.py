"""Benchmark datasets (reference: benchmark/synthetic_dataset.py).

The reference samples lmms-lab TextCaps/POPE/MME/TextVQA/VizWiz (downloaded
via a vLLM env). This environment has no egress, so the same entry format is
fed from (a) a JSON file of preprocessed entries, or (b) a synthetic
generator with configurable prompt/output length distributions and optional
random images — shape-realistic load without the datasets.
"""
import base64
import io
import json
import random
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class SyntheticDataEntry:
    prompt: str
    image_base64: Optional[str] = None
    max_tokens: int = 128
    dataset: str = "synthetic"


def _random_image_b64(rng: random.Random, size: int = 336) -> str:
    import numpy as np
    from PIL import Image
    arr = np.asarray(
        [[ (rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(size)] for _ in range(size)], dtype="uint8")
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


WORDS = ("the of and a to in is you that it he was for on are as with his "
         "they I at be this have from or one had by word but not what all "
         "were we when your can said there use an each which she do how "
         "their if will up other about out many then them these so some her "
         "would make like him into time has look two more write go see "
         "number no way could people my than first water been call who oil "
         "its now find long down day did get come made may part").split()


def make_synthetic_entries(n: int, image_ratio: float = 0.5,
                           prompt_len_range=(32, 256),
                           output_len_range=(32, 256),
                           image_size: int = 336,
                           seed: int = 0) -> List[SyntheticDataEntry]:
    rng = random.Random(seed)
    image_cache = [_random_image_b64(rng, image_size) for _ in range(4)] \
        if image_ratio > 0 else []
    entries = []
    for i in range(n):
        n_words = rng.randint(*prompt_len_range)
        prompt = " ".join(rng.choice(WORDS) for _ in range(n_words))
        has_image = rng.random() < image_ratio
        entries.append(SyntheticDataEntry(
            prompt=("<image> " + prompt) if has_image else prompt,
            image_base64=rng.choice(image_cache) if has_image else None,
            max_tokens=rng.randint(*output_len_range)))
    return entries


def load_entries_json(path: str) -> List[SyntheticDataEntry]:
    """Entries preprocessed to [{prompt, image_base64?, max_tokens?}...]."""
    with open(path) as f:
        data = json.load(f)
    return [SyntheticDataEntry(
        prompt=e["prompt"], image_base64=e.get("image_base64"),
        max_tokens=e.get("max_tokens", 128),
        dataset=e.get("dataset", "file")) for e in data]
