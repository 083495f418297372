import jax
import jax.numpy as jnp
import numpy as np

from hydrainfer_tpu.ops.sampling import (apply_repetition_penalty,
                                         apply_temperature, apply_top_k,
                                         apply_top_p, process_logits)


def test_top_k_keeps_exactly_k():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((3, 50)).astype(np.float32))
    out = apply_top_k(logits, jnp.asarray([5, 1, 0]))
    finite = np.isfinite(np.asarray(out)) & (np.asarray(out) > -1e30)
    assert finite[0].sum() == 5
    assert finite[1].sum() == 1
    assert finite[2].sum() == 50  # 0 disables


def test_top_p_nucleus():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(apply_top_p(logits, jnp.asarray([0.7])))
    # 0.5 alone < 0.7 → include next; 0.5+0.3 >= 0.7 → stop at 2 tokens
    assert (out > -1e30).sum() == 2
    # p=1 keeps everything
    out = np.asarray(apply_top_p(logits, jnp.asarray([1.0])))
    assert (out > -1e30).sum() == 4
    # tiny p keeps at least the argmax
    out = np.asarray(apply_top_p(logits, jnp.asarray([1e-9])))
    assert (out > -1e30).sum() == 1


def test_repetition_penalty_direction():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    seen = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(logits, seen, jnp.asarray([2.0])))
    assert out[0, 0] == 1.0      # positive → divided
    assert out[0, 1] == -4.0     # negative → multiplied
    assert out[0, 2] == 1.0      # unseen → untouched


def test_temperature_sharpens():
    logits = jnp.asarray([[1.0, 2.0]])
    hot = np.asarray(apply_temperature(logits, jnp.asarray([2.0])))
    np.testing.assert_allclose(hot, [[0.5, 1.0]])


def test_process_logits_greedy_pipeline():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((2, 20)).astype(np.float32))
    toks = process_logits(logits, temperature=jnp.asarray([1.0, 1.0]),
                          top_k=jnp.asarray([3, 3]),
                          top_p=jnp.asarray([0.9, 0.9]), greedy=True)
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(logits).argmax(-1))


def test_process_logits_sampling_respects_filtering():
    # all mass on token 7 after top-k=1 → sampling must return 7
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal((4, 10)).astype(np.float32))
    logits = logits.at[:, 7].set(10.0)
    toks = process_logits(logits, top_k=jnp.asarray([1] * 4),
                          key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks), [7] * 4)
