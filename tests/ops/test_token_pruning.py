import jax.numpy as jnp
import numpy as np

from hydrainfer_tpu.ops.token_pruning import (focal_pruning,
                                              focal_pruning_rank,
                                              focal_pruning_row)


def make_scores(n_heads=2, n_tokens=9, hot=(3, 5, 7)):
    """Class token + 8 visual tokens; `hot` visual indices get high mass."""
    rng = np.random.default_rng(0)
    s = rng.random((n_heads, n_tokens, n_tokens)).astype(np.float32) * 0.01
    for h in hot:
        s[:, :, 1 + h] = 1.0
    return jnp.asarray(s / s.sum(-1, keepdims=True))


def test_rank_selects_hot_tokens():
    scores = make_scores(hot=(3, 5, 7))
    idx = np.asarray(focal_pruning_rank(scores, 3))
    assert set(idx) == {3, 5, 7}
    assert list(idx) == sorted(idx)  # order-preserving


def test_row_selects_hot_tokens():
    scores = make_scores(hot=(1, 6))
    idx = np.asarray(focal_pruning_row(scores, 2))
    assert set(idx) == {1, 6}


def test_focal_pruning_gathers_features():
    scores = make_scores(hot=(0, 2))
    feats = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    kept, idx = focal_pruning(feats, scores, 2, strategy="rank")
    np.testing.assert_array_equal(np.asarray(idx), [0, 2])
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(feats)[[0, 2]])
