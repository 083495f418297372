"""MLA single-plane latent attention through the builder layered kernel.

The kernel generalizes to ckv == 1: every cached row is the [c_kv | k_pe]
latent vector, serving as BOTH K and V (the v:=k trick — the model slices
the output's first kv_lora dims, models/decoder.py:_mla_layer). These
tests pin the kernel (interpret mode on CPU) against a per-sequence numpy
oracle and against paged_attention_jnp's single-plane path, in fp32 and
with the int8 latent cache + static scale, across mixed prefill+decode
batches and non-128-multiple latent dims (DeepSeek: 512+64=576)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydrainfer_tpu.ops import PagedAttentionParams
from hydrainfer_tpu.ops.attention import paged_attention_jnp
from hydrainfer_tpu.ops.pallas.paged_attention import layered_paged_attention


def build_latent_case(rng, seq_specs, H=8, D=48, block_size=4, n_blocks=64,
                      L=2):
    """Single-plane cache: cache[l, 0, page, slot, 0, :] = latent vector."""
    S = len(seq_specs)
    T = sum(q for q, _ in seq_specs)
    cache = np.zeros((L, 1, n_blocks, block_size, 1, D), np.float32)
    max_blocks = max(-(-kv // block_size) for _, kv in seq_specs)
    block_tables = np.full((S, max_blocks), -1, np.int32)
    next_block = 1
    kv_lens = np.zeros(S, np.int32)
    latents = []
    for s, (q_len, kv_len) in enumerate(seq_specs):
        nb = -(-kv_len // block_size)
        blocks = list(range(next_block, next_block + nb))
        next_block += nb
        block_tables[s, :nb] = blocks
        kv_lens[s] = kv_len
        lat = rng.standard_normal((kv_len, D)).astype(np.float32)
        latents.append(lat)
        for l in range(L):
            for i in range(kv_len):
                cache[l, 0, blocks[i // block_size], i % block_size, 0] = lat[i]

    q = rng.standard_normal((T, H, D)).astype(np.float32)
    q_seq_ids = np.zeros(T, np.int32)
    q_local_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    cu = np.zeros(S + 1, np.int32)
    t = 0
    for s, (q_len, kv_len) in enumerate(seq_specs):
        for i in range(q_len):
            q_seq_ids[t] = s
            q_local_ids[t] = i
            positions[t] = kv_len - q_len + i
            t += 1
        cu[s + 1] = t
    params = PagedAttentionParams(
        q_seq_ids=jnp.asarray(q_seq_ids),
        q_local_ids=jnp.asarray(q_local_ids),
        positions=jnp.asarray(positions),
        kv_lens=jnp.asarray(kv_lens),
        block_tables=jnp.asarray(block_tables),
        new_kv_slot_ids=jnp.full((T,), -1, jnp.int32),
        cu_q_lens=jnp.asarray(cu),
        num_seqs=jnp.asarray([S], jnp.int32),
    )

    # numpy oracle: K = V = the latent plane (v:=k)
    scale = 1.0 / np.sqrt(D)
    expected = np.zeros((T, H, D), np.float32)
    t = 0
    for s, (q_len, kv_len) in enumerate(seq_specs):
        lat = latents[s]
        for i in range(q_len):
            pos = kv_len - q_len + i
            scores = np.einsum("hd,kd->hk", q[t] * scale, lat[: pos + 1])
            p = np.exp(scores - scores.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            expected[t] = np.einsum("hk,kd->hd", p, lat[: pos + 1])
            t += 1
    return q, cache, params, expected


def run_kernel(q, cache, params, *, layer=0, k_scale=None, nq=None, pp=None):
    D = q.shape[-1]
    out = layered_paged_attention(
        jnp.asarray(q),
        jnp.asarray(cache) if k_scale is None
        else jnp.asarray(cache).astype(jnp.int8),
        jnp.asarray([layer], jnp.int32),
        params.kv_lens,
        jnp.maximum(params.block_tables, 0),
        params.cu_q_lens,
        params.num_seqs,
        sm_scale=1.0 / float(np.sqrt(D)),
        k_scale=k_scale, v_scale=k_scale,
        num_queries_per_block=nq, num_kv_pages_per_block=pp,
        interpret=True,
    )
    return np.asarray(out)


@pytest.mark.parametrize("seq_specs", [
    [(1, 1)],                       # single-token prefill
    [(5, 5)],                       # full prefill
    [(1, 9)],                       # decode with history
    [(1, 4), (1, 7), (1, 12)],      # decode batch
    [(6, 6), (1, 9), (3, 11)],      # mixed prefill + decode + chunked tail
])
def test_latent_kernel_vs_numpy(seq_specs):
    rng = np.random.default_rng(0)
    q, cache, params, expected = build_latent_case(rng, seq_specs)
    out = run_kernel(q, cache, params)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_latent_kernel_matches_jnp_oracle_deepseek_dims():
    """DeepSeek geometry: D = kv_lora 512 + rope 64 = 576 (not a lane
    multiple), 16 q heads, multi-page contexts."""
    rng = np.random.default_rng(1)
    specs = [(1, 21), (4, 13), (1, 37)]
    q, cache, params, expected = build_latent_case(
        rng, specs, H=16, D=576, block_size=8, n_blocks=32)
    out = run_kernel(q, cache, params, pp=2)
    np.testing.assert_allclose(out, expected, rtol=2e-3, atol=2e-3)
    jn = np.asarray(paged_attention_jnp(
        jnp.asarray(q), jnp.asarray(cache), 0, params,
        1.0 / np.sqrt(q.shape[-1]), max_q=4))
    np.testing.assert_allclose(out, jn, rtol=2e-3, atol=2e-3)


def test_latent_kernel_int8_scale():
    """int8 latent cache with ONE static scale (the single plane is both K
    and V, so one scale dequantizes everything)."""
    rng = np.random.default_rng(2)
    specs = [(1, 9), (2, 6)]
    q, cache, params, _ = build_latent_case(rng, specs, H=4, D=32)
    scale = 0.05
    cache_q = np.clip(np.round(cache / scale), -127, 127)
    out = run_kernel(q, cache_q, params, k_scale=scale)
    jn = np.asarray(paged_attention_jnp(
        jnp.asarray(q), jnp.asarray(cache_q).astype(jnp.int8), 0, params,
        1.0 / np.sqrt(q.shape[-1]), max_q=2, kv_scale=scale))
    np.testing.assert_allclose(out, jn, rtol=2e-3, atol=2e-3)


def test_latent_tp_shard_map_matches_oracle():
    """TP over the latent cache: q heads shard over 'tp', the single plane
    replicates, and each device runs the handler chain on its head shard —
    the kernel path MLA TP deployments take on chip (interpret per shard
    here). Must equal the unsharded oracle."""
    import jax
    import jax.numpy as jnp

    from hydrainfer_tpu.ops.attention import paged_attention_tp
    from hydrainfer_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(4)
    specs = [(1, 9), (3, 7), (1, 13)]
    q, cache, params, expected = build_latent_case(rng, specs, H=8, D=32)
    mesh = make_mesh(4, axis_names=("dp", "tp"), shape=(1, 4))
    out = paged_attention_tp(
        jnp.asarray(q), jnp.asarray(cache), 0, params,
        1.0 / float(np.sqrt(32)), max_q=3, mesh=mesh, impl="layered")
    np.testing.assert_allclose(np.asarray(out), expected,
                               rtol=2e-4, atol=2e-4)


def test_latent_kernel_nonzero_layer():
    rng = np.random.default_rng(3)
    q, cache, params, expected = build_latent_case(rng, [(2, 6), (1, 9)], L=3)
    cache = np.array(cache)
    cache[0] = 1e3     # poison other layers: a wrong-layer read fails loudly
    cache[2] = -1e3
    out = run_kernel(q, cache, params, layer=1)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)
