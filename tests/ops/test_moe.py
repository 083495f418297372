import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops.moe import (grouped_topk_sigmoid, moe_ffn,
                                    moe_ffn_dense, topk_softmax)


def test_topk_softmax_weights_normalized():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((5, 8)).astype(np.float32))
    w, idx = topk_softmax(logits, 2)
    assert w.shape == (5, 2) and idx.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, rtol=1e-5)
    # indices are the true top-2 of the softmax (== top-2 of logits)
    expected = np.argsort(-np.asarray(logits), axis=-1)[:, :2]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1),
                                  np.sort(expected, -1))


def test_grouped_topk_sigmoid_group_limit():
    rng = np.random.default_rng(1)
    T, E, G = 4, 16, 4
    logits = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32))
    bias = jnp.zeros(E)
    w, idx = grouped_topk_sigmoid(logits, bias, n_groups=G, topk_groups=2,
                                  top_k=4, routed_scaling=2.5)
    # all selected experts must come from at most 2 groups
    groups = np.asarray(idx) // (E // G)
    for t in range(T):
        assert len(set(groups[t])) <= 2
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 2.5, rtol=1e-5)


@pytest.mark.parametrize("T,E,k", [(6, 4, 2), (16, 8, 2), (3, 4, 1)])
def test_moe_ffn_matches_dense_oracle(T, E, k):
    rng = np.random.default_rng(2)
    d, I = 16, 32
    x = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    gate_up = jnp.asarray(rng.standard_normal((E, d, 2 * I)).astype(np.float32) * 0.1)
    down = jnp.asarray(rng.standard_normal((E, I, d)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32))
    w, idx = topk_softmax(logits, k)
    out = moe_ffn(x, gate_up, down, w, idx)
    expected = moe_ffn_dense(x, gate_up, down, w, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_moe_ffn_jits():
    rng = np.random.default_rng(3)
    T, E, k, d, I = 8, 4, 2, 16, 16
    x = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    gate_up = jnp.asarray(rng.standard_normal((E, d, 2 * I)).astype(np.float32))
    down = jnp.asarray(rng.standard_normal((E, I, d)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32))

    @jax.jit
    def step(x, logits):
        w, idx = topk_softmax(logits, k)
        return moe_ffn(x, gate_up, down, w, idx)

    out = step(x, logits)
    assert out.shape == (T, d)
    assert bool(jnp.all(jnp.isfinite(out)))
