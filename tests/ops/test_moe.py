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


def test_moe_ffn_ep_matches_unsharded():
    """Expert-parallel shard_map path == the single-device grouped matmul,
    over an 8-way expert shard (the multi-chip EP layout, CPU mesh)."""
    from hydrainfer_tpu.ops.moe import moe_ffn_ep
    from hydrainfer_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    T, E, k, d, I = 24, 16, 2, 16, 32
    x = jnp.asarray(rng.standard_normal((T, d)).astype(np.float32))
    gate_up = jnp.asarray(
        rng.standard_normal((E, d, 2 * I)).astype(np.float32) * 0.1)
    down = jnp.asarray(rng.standard_normal((E, I, d)).astype(np.float32) * 0.1)
    logits = jnp.asarray(rng.standard_normal((T, E)).astype(np.float32))
    w, idx = topk_softmax(logits, k)

    expected = moe_ffn(x, gate_up, down, w, idx)
    mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(1, 8))
    out = jax.jit(lambda *a: moe_ffn_ep(*a, mesh=mesh, axis="tp"))(
        x, gate_up, down, w, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_moe_decoder_forward_ep_matches_single():
    """A MoE decoder layer under a tp-mesh (expert-parallel FFN + TP
    attention) must match the meshless forward token-for-token."""
    import dataclasses
    from hydrainfer_tpu.models.decoder import (DecoderConfig, decoder_forward,
                                               init_rope_tables,
                                               pack_decoder_weights)
    from hydrainfer_tpu.models.random_init import init_decoder_weights
    from hydrainfer_tpu.parallel.mesh import (make_mesh,
                                              shard_decoder_weights,
                                              shard_kv_cache)
    from hydrainfer_tpu.models.factory import LanguageModelBatch
    from hydrainfer_tpu.ops.attention import PagedAttentionParams

    n_dev, block_size, n_blocks = 8, 4, 32
    cfg = DecoderConfig(
        n_layers=2, hidden_size=64, intermediate_size=64,
        n_qo_heads=8, n_kv_heads=8, head_dim=8, vocab_size=128,
        max_position_embeddings=64, moe_top_k=2, n_experts=16)
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(0), jnp.float32)
    rngw = np.random.default_rng(11)
    for lw in raw["layers"]:        # mixtral-style: routed experts only
        del lw["gate_up"], lw["down"]
        lw["moe_router"] = jnp.asarray(
            rngw.standard_normal((64, 16)).astype(np.float32) * 0.1)
        lw["moe_gate_up"] = jnp.asarray(
            rngw.standard_normal((16, 64, 64)).astype(np.float32) * 0.1)
        lw["moe_down"] = jnp.asarray(
            rngw.standard_normal((16, 32, 64)).astype(np.float32) * 0.1)
    weights = pack_decoder_weights(raw)
    cos, sin = init_rope_tables(cfg)

    T = 8
    S = 2
    q_seq_ids = np.array([0] * 6 + [1] * 2, np.int32)
    positions = np.array([0, 1, 2, 3, 4, 5, 0, 1], np.int32)
    kv_lens = np.array([6, 2], np.int32)
    tables = np.full((S, 4), -1, np.int32)
    tables[0, :2] = [0, 1]
    tables[1, :1] = [2]
    slots = tables[q_seq_ids, positions // block_size] * block_size \
        + positions % block_size
    batch = LanguageModelBatch(
        token_ids=jnp.asarray(np.arange(T, dtype=np.int32) + 3),
        positions=jnp.asarray(positions),
        image_features=jnp.zeros((0, 64), jnp.float32),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.asarray(q_seq_ids),
            q_local_ids=jnp.asarray(np.array([0, 1, 2, 3, 4, 5, 0, 1], np.int32)),
            positions=jnp.asarray(positions),
            kv_lens=jnp.asarray(kv_lens),
            block_tables=jnp.asarray(tables),
            new_kv_slot_ids=jnp.asarray(slots.astype(np.int32)),
            cu_q_lens=jnp.asarray(np.array([0, 6, 8], np.int32)),
            num_seqs=jnp.asarray(np.array([S], np.int32))),
        sample_token_idx=jnp.asarray(np.array([5, 7], np.int32)),
        token_src_slots=jnp.full((T,), -1, jnp.int32),
        sample_dst_slots=jnp.full((S,), -1, jnp.int32))
    cache = jnp.zeros((cfg.n_layers, 1, n_blocks, block_size,
                       2 * cfg.n_kv_heads, cfg.head_dim), jnp.float32)

    _, _, tok_single, logits_single = decoder_forward(
        weights, cache, batch, cos, sin, cfg, max_q=8, return_logits=True)

    mesh = make_mesh(n_dev, axis_names=("dp", "tp"), shape=(1, n_dev))
    cfg_tp = dataclasses.replace(cfg, mesh=mesh)
    w_tp = shard_decoder_weights(weights, mesh)
    cache_tp = shard_kv_cache(cache, mesh)
    _, _, tok_tp, logits_tp = decoder_forward(
        w_tp, cache_tp, batch, cos, sin, cfg_tp, max_q=8, return_logits=True)

    assert np.array_equal(np.asarray(tok_single), np.asarray(tok_tp))
    np.testing.assert_allclose(np.asarray(logits_single),
                               np.asarray(logits_tp), rtol=1e-4, atol=1e-4)
