import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.quant import (QuantizedTensor, dequantize, qmatmul,
                                      qmatmul_f32, quantize_fp8,
                                      quantize_int4, quantize_int8,
                                      quantize_tree)


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qt = quantize_int8(jnp.asarray(w))
    assert qt.q.dtype == jnp.int8
    deq = np.asarray(dequantize(qt, jnp.float32))
    max_abs = np.abs(w).max(0)
    assert np.abs(deq - w).max() <= (max_abs / 127.0).max() * 0.51 + 1e-6


def test_int4_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    qt = quantize_int4(jnp.asarray(w))
    assert qt.q.shape == (32, 16)
    deq = np.asarray(dequantize(qt, jnp.float32))
    max_abs = np.abs(w).max(0)
    assert np.abs(deq - w).max() <= (max_abs / 7.0).max() * 0.51 + 1e-6


def test_fp8_roundtrip_error():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qt = quantize_fp8(jnp.asarray(w))
    assert qt.q.dtype == jnp.float8_e4m3fn and qt.fmt == "fp8"
    deq = np.asarray(dequantize(qt, jnp.float32))
    # e4m3 has a 3-bit mantissa: relative error <= 2^-4 per element
    assert np.abs(deq - w).max() <= np.abs(w).max() * (2 ** -4) + 1e-6


@pytest.mark.parametrize("quant", [quantize_int8, quantize_int4, quantize_fp8])
def test_qmatmul_close_to_full_precision(quant):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    exact = np.asarray(x @ w)
    approx = np.asarray(qmatmul(x, quant(w)))
    rel = np.abs(approx - exact).max() / np.abs(exact).max()
    # int8: 1/127 per-element near amax; fp8 e4m3: 2^-4 relative (3-bit
    # mantissa) — coarser near amax, finer for small magnitudes
    assert rel < {quantize_int8: 0.02, quantize_fp8: 0.05,
                  quantize_int4: 0.15}[quant]
    f32 = np.asarray(qmatmul_f32(x, quant(w)))
    np.testing.assert_allclose(f32, approx, rtol=1e-2, atol=1e-2)


def test_quantize_tree_layout():
    rng = np.random.default_rng(3)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    weights = {
        "embed": mk(100, 16),
        "layers": [{"qkv_proj": mk(16, 48), "qkv_bias": None,
                    "o_proj": mk(16, 16), "gate_up": mk(16, 64),
                    "down": mk(32, 16), "input_norm": mk(16), "post_norm": mk(16)}
                   for _ in range(2)],
        "norm": mk(16),
        "lm_head": mk(16, 100),
    }
    q = quantize_tree(weights, "int8")
    assert isinstance(q["layers"][0]["qkv_proj"], QuantizedTensor)
    assert isinstance(q["lm_head"], QuantizedTensor)
    assert not isinstance(q["embed"], QuantizedTensor)       # gathers stay fp
    assert not isinstance(q["layers"][0]["input_norm"], QuantizedTensor)
    assert quantize_tree(weights, "none") is weights


def test_int8_logits_close_to_fp32():
    import tempfile

    import torch
    import transformers

    from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "models"))
    from test_llama_vs_hf import make_single_seq_batch

    path = tempfile.mkdtemp()
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        path, safe_serialization=True)

    lm_fp = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp")).getLanguageModel()
    lm_q = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp",
        quantization="int8")).getLanguageModel()

    prompt = list(np.random.default_rng(0).integers(0, 128, size=9))
    batch, T = make_single_seq_batch(prompt, n_past=0)
    cache = jnp.zeros((2, 1, 16, 4, 4, 16), jnp.float32)
    _, _, logits_fp = lm_fp.forward_with_logits(cache, batch, max_q=T)
    cache = jnp.zeros((2, 1, 16, 4, 4, 16), jnp.float32)
    _, _, logits_q = lm_q.forward_with_logits(cache, batch, max_q=T)
    fp = np.asarray(logits_fp[0])
    q = np.asarray(logits_q[0])
    corr = np.corrcoef(fp, q)[0, 1]
    assert corr > 0.999, f"int8 logits diverged, corr={corr}"


def test_int8_kv_cache_logits_close_to_fp32():
    import tempfile

    import torch
    import transformers

    from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "models"))
    from test_llama_vs_hf import make_single_seq_batch

    path = tempfile.mkdtemp()
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        path, safe_serialization=True)

    lm_fp = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp")).getLanguageModel()
    lm_q = getModelFactory(ModelFactoryConfig(
        path=path, dtype="float32", attention_impl="jnp",
        kv_cache_dtype="int8", kv_scale=0.02)).getLanguageModel()

    prompt = list(np.random.default_rng(1).integers(0, 128, size=12))
    batch, T = make_single_seq_batch(prompt, n_past=0)
    cache_fp = jnp.zeros((2, 1, 16, 4, 4, 16), jnp.float32)
    _, _, logits_fp = lm_fp.forward_with_logits(cache_fp, batch, max_q=T)
    cache_q = jnp.zeros((2, 1, 16, 4, 4, 16), jnp.int8)
    _, _, logits_q = lm_q.forward_with_logits(cache_q, batch, max_q=T)
    fp = np.asarray(logits_fp[0])
    q = np.asarray(logits_q[0])
    corr = np.corrcoef(fp, q)[0, 1]
    assert corr > 0.98, f"int8-KV logits diverged, corr={corr}"
    assert np.asarray(logits_q).dtype == np.float32


def test_int4_group_scales_beat_per_column():
    """Group-wise (g=128) int4 must cut the error on weights whose column
    amax is set by a few outliers (the regime that made per-column int4's
    top-1 agreement 0.487 — BASELINE.md quant table)."""
    rng = np.random.default_rng(7)
    w = rng.standard_normal((512, 64)).astype(np.float32)
    w[:8] *= 20.0  # outlier rows confined to group 0 inflate per-COLUMN amax
    qt_g = quantize_int4(jnp.asarray(w), group=128)
    qt_c = quantize_int4(jnp.asarray(w), group=0)
    assert qt_g.group == 128 and qt_g.scale.shape == (4, 64)
    assert qt_c.group == 0 and qt_c.scale.shape == (64,)
    err_g = np.abs(np.asarray(dequantize(qt_g, jnp.float32)) - w)
    err_c = np.abs(np.asarray(dequantize(qt_c, jnp.float32)) - w)
    # error on the outlier-free groups (the bulk of the weight mass)
    assert err_g[128:].mean() < 0.5 * err_c[128:].mean()
    # per-group bound: |err| <= group_amax / 7 / 2
    gmax = np.abs(w.reshape(4, 128, 64)).max(1)
    bound = np.repeat(gmax / 7.0 * 0.51, 128, axis=0) + 1e-6
    assert (err_g <= bound).all()


def test_group_fallback_chain():
    """704 = 64*11: g=128 doesn't divide, the chain lands on 64; tiny dims
    fall back to per-column."""
    rng = np.random.default_rng(8)
    qt = quantize_int4(jnp.asarray(rng.standard_normal((704, 8)), jnp.float32))
    assert qt.group == 64 and qt.scale.shape == (11, 8)
    qt = quantize_int4(jnp.asarray(rng.standard_normal((16, 8)), jnp.float32))
    assert qt.group == 0 and qt.scale.shape == (8,)


def test_grouped_qmatmul_matches_dequant_oracle():
    rng = np.random.default_rng(9)
    w = rng.standard_normal((256, 32)).astype(np.float32)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    import functools
    for quant in (quantize_int4, functools.partial(quantize_fp8, group=128)):
        qt = quant(jnp.asarray(w))
        assert qt.group > 0
        out = np.asarray(qmatmul(jnp.asarray(x), qt))
        oracle = x @ np.asarray(dequantize(qt, jnp.float32))
        np.testing.assert_allclose(out, oracle, rtol=2e-2, atol=2e-2)


def test_fp8_group_option_roundtrip():
    """fp8 defaults to per-column (group scales are a quality wash for a
    relative-error format); the group option stays available and exact."""
    rng = np.random.default_rng(10)
    w = rng.standard_normal((512, 64)).astype(np.float32)
    qt_c = quantize_fp8(jnp.asarray(w))
    assert qt_c.group == 0 and qt_c.scale.shape == (64,)
    qt_g = quantize_fp8(jnp.asarray(w), group=128)
    assert qt_g.group == 128 and qt_g.scale.shape == (4, 64)
    err_g = np.abs(np.asarray(dequantize(qt_g, jnp.float32)) - w)
    assert err_g.max() <= np.abs(w).max() * (2 ** -4) + 1e-6
