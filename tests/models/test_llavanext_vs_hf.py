"""LLaVA-NeXT anyres parity vs HF: tile features + spatial unpad merge +
newline tokens + token-count calculator."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.models import (ModelFactoryConfig, VisionModelParameters,
                                   getModelFactory)

VOCAB = 64
IMG_TOK = 60
PINPOINTS = [[28, 56], [56, 28], [56, 56]]


@pytest.fixture(scope="module")
def tiny_llavanext(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llavanext")
    cfg = transformers.LlavaNextConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=28, patch_size=14,
                           hidden_act="quick_gelu"),
        text_config=dict(model_type="llama", vocab_size=VOCAB, hidden_size=48,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2),
        image_token_index=IMG_TOK, vision_feature_layer=-2,
        image_grid_pinpoints=PINPOINTS)
    torch.manual_seed(0)
    model = transformers.LlavaNextForConditionalGeneration(cfg).eval().float()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


@pytest.mark.parametrize("orig_hw,expect_tiles", [
    ((50, 50), 1 + 4),     # square → 56x56 grid 2x2
    ((30, 60), 1 + 2),     # wide → 28x56 grid 1x2
    ((60, 30), 1 + 2),     # tall → 56x28 grid 2x1
])
def test_anyres_merge_matches_hf(tiny_llavanext, orig_hw, expect_tiles):
    path, hf = tiny_llavanext
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))
    vm = factory.getVisionModel()
    calc = factory.getVisionModelConfig().image_token_calculator

    rng = np.random.default_rng(hash(orig_hw) % 1000)
    tiles = rng.standard_normal((expect_tiles, 3, 28, 28)).astype(np.float32)

    out = vm.forward(jnp.asarray(tiles),
                     VisionModelParameters(original_image_sizes=[orig_hw]))
    ours = np.asarray(out.image_features)[0]

    with torch.no_grad():
        # get_image_features already applies the anyres pack (unpad+newline)
        feats = hf.model.get_image_features(
            pixel_values=torch.tensor(tiles)[None],
            image_sizes=torch.tensor([list(orig_hw)]),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
        expected = feats[0].numpy()

    assert calc.get_num_image_tokens(orig_hw) == expected.shape[0]
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=3e-3, atol=3e-3)


def test_engine_e2e_with_anyres(tiny_llavanext):
    """Anyres image request through the full engine (fake tokenizer)."""
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.factory import ImageProcessor, Tokenizer
    from hydrainfer_tpu.request import Request, SamplingParameters
    from PIL import Image

    path, _ = tiny_llavanext
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32",
                                                 attention_impl="jnp"))

    class Tok(Tokenizer):
        def encode(self, p):
            out = []
            rest = p
            while rest:
                if rest.startswith("<image>"):
                    out.append(IMG_TOK)
                    rest = rest[7:]
                else:
                    out.append(ord(rest[0]) % 50)
                    rest = rest[1:]
            return out

        def decode(self, t):
            return f"<{int(t)}>"

        def apply_chat_template(self, m):
            return " ".join(x["content"] for x in m)

    factory.getTokenizer = lambda: Tok()
    real_proc = factory.getProcessor()

    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=8,
        image_block_size=16)
    cfg.model.dtype = "float32"
    engine = OfflineEngine(cfg, model_factory=factory)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (50, 50, 3), dtype=np.uint8))
    out = engine.generate([Request(
        request_id="n1", prompt="<image> what", image=img,
        sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True))],
        timeout_s=120)[0]
    assert len(out.output_token_ids) == 4
