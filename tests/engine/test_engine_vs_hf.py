"""Full engine path (scheduler → executor → paged LM) vs HF generate on a
tiny random-weight LLaVA: token-exact greedy generation, with continuous
batching, chunked prefill, and prefix caching all active."""
import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
from hydrainfer_tpu.models.factory import ImageProcessor, Tokenizer
from hydrainfer_tpu.request import Request, SamplingParameters

VOCAB = 64
IMG_TOK = 60


class CharTokenizer(Tokenizer):
    """a..z → 3..28, space → 29, <image> → IMG_TOK."""

    def encode(self, prompt):
        ids = []
        rest = prompt
        while rest:
            if rest.startswith("<image>"):
                ids.append(IMG_TOK)
                rest = rest[7:]
            elif rest[0] == " ":
                ids.append(29)
                rest = rest[1:]
            else:
                ids.append(ord(rest[0]) - ord("a") + 3)
                rest = rest[1:]
        return ids

    def decode(self, token_id):
        t = int(token_id)
        if t == 29:
            return " "
        if 3 <= t < 29:
            return chr(t - 3 + ord("a"))
        return f"<{t}>"

    def apply_chat_template(self, messages):
        return " ".join(m["content"] for m in messages)


class TinyProcessor(ImageProcessor):
    def process(self, image):
        import jax.numpy as jnp
        arr = np.asarray(image.convert("RGB").resize((28, 28)), np.float32)
        return jnp.asarray(arr.transpose(2, 0, 1) / 255.0)


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llava_engine")
    cfg = transformers.LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=28, patch_size=14, hidden_act="quick_gelu"),
        text_config=dict(model_type="llama", vocab_size=VOCAB, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=256),
        image_token_index=IMG_TOK, vision_feature_layer=-2)
    torch.manual_seed(0)
    model = transformers.LlavaForConditionalGeneration(cfg).eval().float()
    model.save_pretrained(path, safe_serialization=True)
    # the engine requests run with ignore_eos; make the oracle match
    model.generation_config.eos_token_id = None
    return str(path), model


@pytest.fixture(scope="module")
def engine(tiny_llava):
    path, _ = tiny_llava
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp"))
    factory.getTokenizer = lambda: CharTokenizer()
    factory.getProcessor = lambda: TinyProcessor()
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=16,
        image_block_size=4)
    cfg.model.dtype = "float32"
    return OfflineEngine(cfg, model_factory=factory)


def hf_generate(model, prompt_ids, pixels, n_tokens):
    # HF expects the <image> token pre-expanded to one slot per feature
    prompt_ids = [t for tid in prompt_ids
                  for t in ([tid] * 4 if tid == IMG_TOK else [tid])]
    with torch.no_grad():
        kwargs = dict(input_ids=torch.tensor([prompt_ids]),
                      max_new_tokens=n_tokens, do_sample=False)
        if pixels is not None:
            kwargs["pixel_values"] = torch.tensor(pixels)
        out = model.generate(**kwargs)
    return out[0, len(prompt_ids):].tolist()


def test_text_generation_token_exact(engine, tiny_llava):
    _, hf = tiny_llava
    tok = CharTokenizer()
    prompt = "hello world this is a test"
    out = engine.generate([Request(request_id="t", prompt=prompt,
                                   sampling_params=SamplingParameters(
                                       max_tokens=8, ignore_eos=True))])[0]
    expected = hf_generate(hf, tok.encode(prompt), None, 8)
    assert out.output_token_ids == expected


def test_multimodal_generation_token_exact(engine, tiny_llava):
    _, hf = tiny_llava
    tok = CharTokenizer()
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (28, 28, 3), dtype=np.uint8))
    prompt = "<image> describe this"
    out = engine.generate([Request(request_id="m", prompt=prompt, image=img,
                                   sampling_params=SamplingParameters(
                                       max_tokens=8, ignore_eos=True))])[0]
    pixels = np.asarray(TinyProcessor().process(img))[None]
    expected = hf_generate(hf, tok.encode(prompt), pixels, 8)
    assert out.output_token_ids == expected


def test_batched_mixed_requests_token_exact(engine, tiny_llava):
    """Several concurrent requests (text + image), still token-exact."""
    _, hf = tiny_llava
    tok = CharTokenizer()
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (28, 28, 3), dtype=np.uint8))
    prompts = ["abc def", "longer prompt with more words here",
               "<image> what is it", "zzz"]
    reqs = [Request(request_id=i, prompt=p, image=img if "<image>" in p else None,
                    sampling_params=SamplingParameters(max_tokens=6, ignore_eos=True))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs)
    pixels = np.asarray(TinyProcessor().process(img))[None]
    for p, out in zip(prompts, outs):
        expected = hf_generate(hf, tok.encode(p),
                               pixels if "<image>" in p else None, 6)
        assert out.output_token_ids == expected, f"mismatch for {p!r}"


def test_chunked_prefill_token_exact(tiny_llava):
    """Tiny token budget forces multi-chunk prefill; output must not change."""
    path, hf = tiny_llava
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp"))
    factory.getTokenizer = lambda: CharTokenizer()
    factory.getProcessor = lambda: TinyProcessor()
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=8, image_block_size=4)
    cfg.model.dtype = "float32"
    eng = OfflineEngine(cfg, model_factory=factory)
    eng.node.batch_scheduler.token_budget = 5  # force chunking

    tok = CharTokenizer()
    prompt = "a very long prompt that needs several chunks to prefill"
    out = eng.generate([Request(request_id="c", prompt=prompt,
                                sampling_params=SamplingParameters(
                                    max_tokens=6, ignore_eos=True))])[0]
    expected = hf_generate(hf, tok.encode(prompt), None, 6)
    assert out.output_token_ids == expected
