"""Native C++ fill-batch packer vs the pure-Python oracle: byte-identical
buffers over randomized mixed prefill/decode/image batches."""
import numpy as np
import pytest

from hydrainfer_tpu._C import hostops
from hydrainfer_tpu.engine.isa import Fill, ImageEmbedFill, TextFill
from hydrainfer_tpu.engine.params_builder import LanguageModelBatchBuilder
from hydrainfer_tpu.memory import (TokenCacheBlockManager,
                                   TokenCacheBlockManagerConfig)
from hydrainfer_tpu.models.factory import LanguageModelConfig
from hydrainfer_tpu.engine.rcb import RequestControlBlock
from hydrainfer_tpu.request import SamplingParameters

pytestmark = pytest.mark.skipif(hostops is None,
                                reason="native hostops not built")


def make_env(block_size=4, n_blocks=256):
    kv = TokenCacheBlockManager(TokenCacheBlockManagerConfig(
        n_layers=1, n_tensors=1, n_blocks=n_blocks, block_size=block_size,
        n_heads=4, head_dim=8, dtype="fp32"))
    img = TokenCacheBlockManager(TokenCacheBlockManagerConfig(
        n_layers=1, n_tensors=1, n_blocks=32, block_size=8,
        n_heads=2, head_dim=16, dtype="fp32"))
    lcfg = LanguageModelConfig(n_layers=1, max_position_embeddings=1024,
                               n_qo_heads=2, n_kv_heads=2, head_dim=16,
                               eos_token_id=2, hidden_size=32, vocab_size=100)
    return kv, img, lcfg


def make_rcb(kv, n_ctx, token_slot, img=None, n_img_tokens=0):
    rcb = RequestControlBlock()
    rcb.sampling_params = SamplingParameters(max_tokens=8)
    rcb.token_slot = token_slot
    rcb.virtual_kv_cache = kv.allocate_virtual_cache()
    kv.realloc(rcb.virtual_kv_cache, n_ctx)
    if img is not None and n_img_tokens:
        rcb.virtual_image_cache = img.allocate_virtual_cache()
        img.realloc(rcb.virtual_image_cache, n_img_tokens)
    return rcb


def build_both(kv, img, lcfg, pairs):
    outs = []
    for native in (True, False):
        builder = LanguageModelBatchBuilder(kv, img, lcfg, image_token_id=9)
        builder._contiguous = True
        for rcb, inst in pairs:
            builder.add(rcb, inst)
        if not native:
            builder._contiguous = False  # force the python oracle
        plan = builder.build()
        outs.append(plan)
    return outs


def test_native_matches_python_oracle():
    rng = np.random.default_rng(0)
    kv, img, lcfg = make_env()
    pairs = []
    dummy_decode_target = TextFill([-1], [99], [99], True, None, None)
    # prefill of 7 tokens
    r1 = make_rcb(kv, 7, token_slot=5)
    pairs.append((r1, TextFill(list(rng.integers(0, 90, 7)),
                               list(range(7)), list(range(7)), True,
                               dummy_decode_target, None)))
    # resolved decode (token known)
    r2 = make_rcb(kv, 13, token_slot=6)
    pairs.append((r2, TextFill([42], [12], [12], True, dummy_decode_target, None)))
    # unresolved decode (device token table)
    r3 = make_rcb(kv, 21, token_slot=7)
    pairs.append((r3, TextFill([-1], [20], [20], True, dummy_decode_target, None)))
    # chunked prefill head (no sample_dst)
    r4 = make_rcb(kv, 6, token_slot=8)
    head = TextFill(list(rng.integers(0, 90, 6)), list(range(6)),
                    list(range(6)), True, None, None)
    head.is_chunked = True
    pairs.append((r4, head))
    # image prefill
    r5 = make_rcb(kv, 5, token_slot=9, img=img, n_img_tokens=3)
    pairs.append((r5, ImageEmbedFill(
        image_token_cache_ids=[0, 1, 2],
        image_token_mask=[False, True, True, True, False],
        token_ids=[1, 9, 9, 9, 2], position_ids=list(range(5)),
        cache_ids=list(range(5)), sample=True, sample_dst=dummy_decode_target,
        hashes=None)))

    plan_c, plan_py = build_both(kv, img, lcfg, pairs)
    assert plan_c.dims == plan_py.dims
    np.testing.assert_array_equal(plan_c.flat, plan_py.flat)


def test_native_randomized_equivalence():
    rng = np.random.default_rng(1)
    kv, img, lcfg = make_env()
    dummy = TextFill([-1], [0], [0], True, None, None)
    for trial in range(10):
        pairs = []
        slot = 0
        for _ in range(rng.integers(1, 12)):
            kind = rng.integers(0, 3)
            if kind == 0:  # prefill
                n = int(rng.integers(1, 20))
                r = make_rcb(kv, n, token_slot=slot)
                pairs.append((r, TextFill(list(rng.integers(0, 90, n)),
                                          list(range(n)), list(range(n)),
                                          True, dummy, None)))
            elif kind == 1:  # decode resolved
                ctx = int(rng.integers(2, 60))
                r = make_rcb(kv, ctx, token_slot=slot)
                pairs.append((r, TextFill([int(rng.integers(0, 90))],
                                          [ctx - 1], [ctx - 1], True, dummy, None)))
            else:  # decode unresolved
                ctx = int(rng.integers(2, 60))
                r = make_rcb(kv, ctx, token_slot=slot)
                pairs.append((r, TextFill([-1], [ctx - 1], [ctx - 1], True,
                                          dummy, None)))
            slot += 1
        plan_c, plan_py = build_both(kv, img, lcfg, pairs)
        np.testing.assert_array_equal(plan_c.flat, plan_py.flat,
                                      err_msg=f"trial {trial}")
        for rcb, _ in pairs:
            kv.free(rcb.virtual_kv_cache)
