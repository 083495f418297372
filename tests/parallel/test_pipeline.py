"""Pipeline parallelism: the stage-relay forward over a 'pp' mesh must
match the single-device decoder token-for-token (mixed prefill+decode
batch, value-mode cache), and the stage-sharded cache must receive exactly
the same KV writes."""
import numpy as np
import jax
import jax.numpy as jnp

from hydrainfer_tpu.models.decoder import (DecoderConfig, decoder_forward,
                                           init_rope_tables,
                                           pack_decoder_weights)
from hydrainfer_tpu.models.factory import LanguageModelBatch
from hydrainfer_tpu.models.random_init import init_decoder_weights
from hydrainfer_tpu.ops.attention import PagedAttentionParams
from hydrainfer_tpu.parallel.mesh import make_mesh
from hydrainfer_tpu.parallel.pipeline import (decoder_forward_pp,
                                              pp_pack_weights, pp_shard)

BLOCK = 4
N_BLOCKS = 32


def make_cfg(n_layers=4):
    return DecoderConfig(
        n_layers=n_layers, hidden_size=64, intermediate_size=128,
        n_qo_heads=4, n_kv_heads=2, head_dim=16, vocab_size=256,
        max_position_embeddings=64)


def make_batch(T=8, S=2):
    q_seq_ids = np.array([0] * 6 + [1] * 2, np.int32)
    positions = np.array([0, 1, 2, 3, 4, 5, 4, 5], np.int32)
    kv_lens = np.array([6, 6], np.int32)
    tables = np.full((S, 4), -1, np.int32)
    tables[0, :2] = [0, 1]
    tables[1, :2] = [2, 3]
    slots = tables[q_seq_ids, positions // BLOCK] * BLOCK + positions % BLOCK
    return LanguageModelBatch(
        token_ids=jnp.asarray(np.arange(T, dtype=np.int32) + 5),
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
        sample_dst_slots=jnp.asarray(np.array([0, 1], np.int32)))


def test_pp_forward_matches_single_device():
    cfg = make_cfg(n_layers=4)
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(0), jnp.float32)
    cos, sin = init_rope_tables(cfg)
    batch = make_batch()
    cache = jnp.zeros((cfg.n_layers, 1, N_BLOCKS, BLOCK,
                       2 * cfg.n_kv_heads, cfg.head_dim), jnp.float32)
    table = jnp.zeros((8,), jnp.int32)

    cache_ref, table_ref, tok_ref = decoder_forward(
        pack_decoder_weights(raw), cache, batch, cos, sin, cfg, max_q=8,
        token_table=table)

    mesh = make_mesh(8, axis_names=("dp", "pp"), shape=(2, 4))
    w_pp, cache_pp = pp_shard(pp_pack_weights(raw, pp=4), cache, mesh)
    step = jax.jit(decoder_forward_pp,
                   static_argnames=("cfg", "max_q", "mesh"))
    cache_pp_out, table_pp, tok_pp = step(
        w_pp, cache_pp, batch, cos, sin, cfg, max_q=8, token_table=table,
        mesh=mesh)

    assert np.array_equal(np.asarray(tok_ref), np.asarray(tok_pp))
    assert np.array_equal(np.asarray(table_ref), np.asarray(table_pp))
    got = np.asarray(cache_pp_out).reshape(np.asarray(cache_ref).shape)
    np.testing.assert_allclose(got, np.asarray(cache_ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_decode_feedback_two_steps():
    """Step 2 reads step 1's sampled token from the device token table
    through the pipeline (async-decode feedback under PP)."""
    cfg = make_cfg(n_layers=4)
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(1), jnp.float32)
    cos, sin = init_rope_tables(cfg)
    cache = jnp.zeros((cfg.n_layers, 1, N_BLOCKS, BLOCK,
                       2 * cfg.n_kv_heads, cfg.head_dim), jnp.float32)
    table = jnp.zeros((8,), jnp.int32)
    mesh = make_mesh(8, axis_names=("dp", "pp"), shape=(2, 4))
    w_pp, cache_pp = pp_shard(pp_pack_weights(raw, pp=4), cache, mesh)
    w_single = pack_decoder_weights(raw)

    batch1 = make_batch()

    def decode_batch():
        T, S = 8, 2
        q_seq_ids = np.array([0, 1] + [-1] * 6, np.int32)
        positions = np.array([6, 6, 0, 0, 0, 0, 0, 0], np.int32)
        kv_lens = np.array([7, 7], np.int32)
        tables = np.full((S, 4), -1, np.int32)
        tables[0, :2] = [0, 1]
        tables[1, :2] = [2, 3]
        slots = np.full(T, -1, np.int32)
        for t in range(2):
            slots[t] = tables[t, positions[t] // BLOCK] * BLOCK \
                + positions[t] % BLOCK
        return LanguageModelBatch(
            token_ids=jnp.zeros((T,), jnp.int32),
            positions=jnp.asarray(positions),
            image_features=jnp.zeros((0, 64), jnp.float32),
            image_dst_idx=jnp.zeros((0,), jnp.int32),
            attention=PagedAttentionParams(
                q_seq_ids=jnp.asarray(q_seq_ids),
                q_local_ids=jnp.zeros((T,), jnp.int32),
                positions=jnp.asarray(positions),
                kv_lens=jnp.asarray(kv_lens),
                block_tables=jnp.asarray(tables),
                new_kv_slot_ids=jnp.asarray(slots),
                cu_q_lens=jnp.asarray(np.array([0, 1, 2], np.int32)),
                num_seqs=jnp.asarray(np.array([S], np.int32))),
            sample_token_idx=jnp.asarray(np.array([0, 1], np.int32)),
            token_src_slots=jnp.asarray(
                np.array([0, 1] + [-1] * 6, np.int32)),
            sample_dst_slots=jnp.asarray(np.array([0, 1], np.int32)))

    batch2 = decode_batch()

    c, t, tok1 = decoder_forward(w_single, cache, batch1, cos, sin, cfg,
                                 max_q=8, token_table=table)
    _, _, tok2 = decoder_forward(w_single, c, batch2, cos, sin, cfg,
                                 max_q=1, token_table=t)

    step = jax.jit(decoder_forward_pp,
                   static_argnames=("cfg", "max_q", "mesh"))
    cpp, tpp, ptok1 = step(w_pp, cache_pp, batch1, cos, sin, cfg, max_q=8,
                           token_table=table, mesh=mesh)
    _, _, ptok2 = step(w_pp, cpp, batch2, cos, sin, cfg, max_q=1,
                       token_table=tpp, mesh=mesh)

    assert np.array_equal(np.asarray(tok1), np.asarray(ptok1))
    assert np.array_equal(np.asarray(tok2), np.asarray(ptok2))


def test_pp_engine_matches_single_device():
    """Serving-path pipeline parallelism: an OfflineEngine whose node owns
    4 devices on the 'pp' axis (layer-sharded weights + KV pages, stage
    relay forward) must emit exactly the single-device engine's tokens."""
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    from hydrainfer_tpu.request import Request, SamplingParameters

    def run(devices=None, parallel="tp"):
        factory = RandomWeightFactory("tiny-lm", layer_loop="unroll")
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD",
                               devices=devices, parallel=parallel)
        prompts = ["the quick brown fox", "a", "hello world test"]
        reqs = [Request(request_id=f"r{i}", prompt=p,
                        sampling_params=SamplingParameters(max_tokens=8,
                                                           ignore_eos=True))
                for i, p in enumerate(prompts)]
        outs = engine.generate(reqs, timeout_s=600)
        return [o.output_token_ids for o in outs]

    single = run()
    pp = run(devices=jax.devices()[:2], parallel="pp")  # tiny-lm: 2 layers
    assert [len(t) for t in single] == [8, 8, 8]
    assert pp == single


def test_pp_engine_single_request_relay_fallback():
    """One resident request: the decode batch bucket (S=1) is smaller than
    the stage count, so the GPipe schedule's S % n_micro / S >= n_micro
    gate (models/llama.py:_flat_pp_fn) must fall back to the relay — and
    the tokens must still match the single-device engine exactly."""
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.random_init import RandomWeightFactory
    from hydrainfer_tpu.request import Request, SamplingParameters

    def run(devices=None, parallel="tp"):
        factory = RandomWeightFactory("tiny-lm", layer_loop="unroll")
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=2),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD",
                               devices=devices, parallel=parallel)
        reqs = [Request(request_id="solo", prompt="one lonely request",
                        sampling_params=SamplingParameters(max_tokens=6,
                                                           ignore_eos=True))]
        return [o.output_token_ids
                for o in engine.generate(reqs, timeout_s=600)]

    single = run()
    pp = run(devices=jax.devices()[:2], parallel="pp")
    assert [len(t) for t in single] == [6]
    assert pp == single


def test_pp_microbatched_decode_matches_single():
    """The GPipe-microbatched decode schedule must produce the same tokens
    and cache writes as the single-device step (mixed live/padded seqs)."""
    from hydrainfer_tpu.parallel.pipeline import decoder_forward_pp_decode

    cfg = make_cfg(n_layers=4)
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(2), jnp.float32)
    cos, sin = init_rope_tables(cfg)

    # pure decode batch: 6 live seqs (of 8 padded), varying kv_lens
    S = 8
    kv_lens = np.array([3, 5, 2, 7, 4, 6, 0, 0], np.int32)
    tables = np.full((S, 4), -1, np.int32)
    cache = np.zeros((cfg.n_layers, 1, N_BLOCKS, BLOCK,
                      2 * cfg.n_kv_heads, cfg.head_dim), np.float32)
    rngc = np.random.default_rng(8)
    bid = 0
    for s in range(S):
        if kv_lens[s] == 0:
            continue
        nb = -(-int(kv_lens[s]) // BLOCK)
        tables[s, :nb] = range(bid, bid + nb)
        # pre-existing context KV
        for p in range(int(kv_lens[s]) - 1):
            blk, off = tables[s, p // BLOCK], p % BLOCK
            cache[:, 0, blk, off] = rngc.standard_normal(
                (cfg.n_layers, 2 * cfg.n_kv_heads, cfg.head_dim)) * 0.3
        bid += nb
    positions = np.where(kv_lens > 0, kv_lens - 1, 0).astype(np.int32)
    slots = np.full(S, -1, np.int32)
    for s in range(S):
        if kv_lens[s] > 0:
            slots[s] = tables[s, positions[s] // BLOCK] * BLOCK \
                + positions[s] % BLOCK
    q_seq_ids = np.where(kv_lens > 0, np.arange(S, dtype=np.int32), -1)
    n_live = int((kv_lens > 0).sum())
    cu = np.minimum(np.arange(S + 1), n_live).astype(np.int32)

    batch = LanguageModelBatch(
        token_ids=jnp.asarray(np.arange(S, dtype=np.int32) % 50 + 3),
        positions=jnp.asarray(positions),
        image_features=jnp.zeros((0, 64), jnp.float32),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.asarray(q_seq_ids),
            q_local_ids=jnp.zeros((S,), jnp.int32),
            positions=jnp.asarray(positions),
            kv_lens=jnp.asarray(kv_lens),
            block_tables=jnp.asarray(tables),
            new_kv_slot_ids=jnp.asarray(slots),
            cu_q_lens=jnp.asarray(cu),
            num_seqs=jnp.asarray([n_live], np.int32)),
        sample_token_idx=jnp.asarray(np.arange(S, dtype=np.int32)),
        token_src_slots=jnp.full((S,), -1, jnp.int32),
        sample_dst_slots=jnp.asarray(
            np.where(kv_lens > 0, np.arange(S), -1).astype(np.int32)))
    table = jnp.zeros((8,), jnp.int32)
    cache = jnp.asarray(cache)

    cache_ref, table_ref, tok_ref = decoder_forward(
        pack_decoder_weights(raw), cache, batch, cos, sin, cfg, max_q=1,
        token_table=table)

    mesh = make_mesh(8, axis_names=("dp", "pp"), shape=(2, 4))
    w_pp, cache_pp = pp_shard(pp_pack_weights(raw, pp=4), cache, mesh)
    step = jax.jit(decoder_forward_pp_decode,
                   static_argnames=("cfg", "mesh", "n_micro"))
    cache_out, table_pp, tok_pp = step(
        w_pp, cache_pp, batch, cos, sin, cfg, token_table=table,
        mesh=mesh, n_micro=4)

    assert np.array_equal(np.asarray(tok_ref), np.asarray(tok_pp))
    assert np.array_equal(np.asarray(table_ref), np.asarray(table_pp))
    np.testing.assert_allclose(np.asarray(cache_out), np.asarray(cache_ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_tp_forward_matches_single_device():
    """PP v2: TP inside each stage — a (pp=2, tp=4) mesh where every stage
    also megatron-shards its layers' heads/ffn, with the packed q|k|v and
    gate|up columns permuted to the per-shard layout and o_proj/down psums
    over 'tp'. Token + cache parity vs the single-device forward."""
    from hydrainfer_tpu.parallel.pipeline import (pp_shard_cache,
                                                  pp_shard_weights,
                                                  pp_tp_pack_weights)
    cfg = make_cfg(n_layers=4)     # 4 q heads / 2 kv heads — tp=2 divides
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(2), jnp.float32)
    cos, sin = init_rope_tables(cfg)
    batch = make_batch()
    cache = jnp.zeros((cfg.n_layers, 1, N_BLOCKS, BLOCK,
                       2 * cfg.n_kv_heads, cfg.head_dim), jnp.float32)
    table = jnp.zeros((8,), jnp.int32)

    cache_ref, table_ref, tok_ref = decoder_forward(
        pack_decoder_weights(raw), cache, batch, cos, sin, cfg, max_q=8,
        token_table=table)

    mesh = make_mesh(8, axis_names=("dp", "pp", "tp"), shape=(2, 2, 2))
    w_pp = pp_shard_weights(pp_tp_pack_weights(raw, pp=2, tp=2, cfg=cfg),
                            mesh)
    cache_pp = pp_shard_cache(cache, mesh)
    assert not cache_pp.sharding.is_fully_replicated
    step = jax.jit(decoder_forward_pp,
                   static_argnames=("cfg", "max_q", "mesh"))
    cache_out, table_pp, tok_pp = step(
        w_pp, cache_pp, batch, cos, sin, cfg, max_q=8, token_table=table,
        mesh=mesh)

    assert np.array_equal(np.asarray(tok_ref), np.asarray(tok_pp))
    assert np.array_equal(np.asarray(table_ref), np.asarray(table_pp))
    np.testing.assert_allclose(
        np.asarray(cache_out).reshape(np.asarray(cache_ref).shape),
        np.asarray(cache_ref), rtol=1e-5, atol=1e-5)


def test_pp_tp_microbatched_decode_matches():
    """The GPipe microbatch decode schedule under TP-in-stage."""
    from hydrainfer_tpu.parallel.pipeline import (decoder_forward_pp_decode,
                                                  pp_shard_cache,
                                                  pp_shard_weights,
                                                  pp_tp_pack_weights)
    cfg = make_cfg(n_layers=4)
    raw = init_decoder_weights(cfg, jax.random.PRNGKey(3), jnp.float32)
    cos, sin = init_rope_tables(cfg)

    # pure-decode batch: 4 seqs, one token each, mid-context
    S = 4
    kv_lens = np.array([5, 6, 7, 8], np.int32)
    tables = np.stack([np.arange(2 * s, 2 * s + 2, dtype=np.int32)
                       for s in range(S)])
    positions = kv_lens - 1
    slots = (tables[np.arange(S), positions // BLOCK] * BLOCK
             + positions % BLOCK).astype(np.int32)
    batch = LanguageModelBatch(
        token_ids=jnp.asarray(np.arange(S, dtype=np.int32) + 3),
        positions=jnp.asarray(positions),
        image_features=jnp.zeros((0, 64), jnp.float32),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.arange(S, dtype=jnp.int32),
            q_local_ids=jnp.zeros(S, jnp.int32),
            positions=jnp.asarray(positions),
            kv_lens=jnp.asarray(kv_lens),
            block_tables=jnp.asarray(tables),
            new_kv_slot_ids=jnp.asarray(slots),
            cu_q_lens=jnp.arange(S + 1, dtype=jnp.int32),
            num_seqs=jnp.asarray([S], jnp.int32)),
        sample_token_idx=jnp.arange(S, dtype=jnp.int32),
        token_src_slots=jnp.full((S,), -1, jnp.int32),
        sample_dst_slots=jnp.arange(S, dtype=jnp.int32))
    rng = np.random.default_rng(0)
    cache = jnp.asarray(rng.standard_normal(
        (cfg.n_layers, 1, N_BLOCKS, BLOCK, 2 * cfg.n_kv_heads,
         cfg.head_dim)).astype(np.float32) * 0.1)
    table = jnp.zeros((8,), jnp.int32)

    _, table_ref, tok_ref = decoder_forward(
        pack_decoder_weights(raw), cache, batch, cos, sin, cfg, max_q=1,
        token_table=table)

    mesh = make_mesh(8, axis_names=("dp", "pp", "tp"), shape=(2, 2, 2))
    w_pp = pp_shard_weights(pp_tp_pack_weights(raw, pp=2, tp=2, cfg=cfg),
                            mesh)
    cache_pp = pp_shard_cache(cache, mesh)
    step = jax.jit(decoder_forward_pp_decode,
                   static_argnames=("cfg", "mesh", "n_micro"))
    _, table_pp, tok_pp = step(w_pp, cache_pp, batch, cos, sin, cfg,
                               token_table=table, mesh=mesh, n_micro=2)
    assert np.array_equal(np.asarray(tok_ref), np.asarray(tok_pp))
    assert np.array_equal(np.asarray(table_ref), np.asarray(table_pp))
