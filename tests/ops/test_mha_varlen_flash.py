"""Segment-masked flash ViT attention (interpret mode) vs the dense oracle."""
import numpy as np
import pytest
import jax.numpy as jnp

from hydrainfer_tpu.ops.attention import _mha_varlen_dense, mha_varlen
from hydrainfer_tpu.ops.pallas.mha_varlen import mha_varlen_flash


def make_inputs(rng, segments, h=4, d=32, pad=0, dtype=jnp.float32):
    """segments: list of patch counts per image; pad trailing -1 rows."""
    ids = sum(([i] * n for i, n in enumerate(segments)), []) + [-1] * pad
    T = len(ids)
    q = jnp.asarray(rng.standard_normal((T, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((T, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((T, h, d)), dtype)
    return q, k, v, jnp.asarray(ids, jnp.int32)


@pytest.mark.parametrize("segments,pad", [
    ([64], 0),                 # one image
    ([40, 88], 0),             # two unequal images
    ([100, 28, 60], 12),       # three + padding, T=200 not a block multiple
])
def test_flash_matches_dense(segments, pad):
    rng = np.random.default_rng(0)
    q, k, v, ids = make_inputs(rng, segments, pad=pad)
    ref, _ = _mha_varlen_dense(q, k, v, ids)
    got = mha_varlen_flash(q, k, v, ids, sm_scale=1.0 / (32 ** 0.5),
                           block_q=64, block_kv=64, interpret=True)
    valid = np.asarray(ids) >= 0
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(ref)[valid],
                               rtol=2e-5, atol=2e-5)
    # padded rows must be finite (zeros from the masked accumulator)
    assert np.isfinite(np.asarray(got)).all()


def test_dispatcher_flash_impl():
    """impl='flash' forces the kernel (interpret off-TPU) through the public
    mha_varlen entry point."""
    rng = np.random.default_rng(1)
    q, k, v, ids = make_inputs(rng, [32, 32])
    ref, _ = mha_varlen(q, k, v, ids, impl="jnp")
    got, scores = mha_varlen(q, k, v, ids, impl="flash")
    assert scores is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_return_scores_uses_dense():
    rng = np.random.default_rng(2)
    q, k, v, ids = make_inputs(rng, [16])
    out, scores = mha_varlen(q, k, v, ids, return_scores=True)
    assert scores is not None and scores.shape[-1] == 16
