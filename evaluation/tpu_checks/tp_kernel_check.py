"""On-chip check: the Pallas ragged paged-attention kernel under shard_map
with a kv-head-sharded cache — the configuration every real TP deployment
runs (ops/attention.py:paged_attention_tp). pytest forces CPU, so this runs
standalone on the real TPU:

    python evaluation/tpu_checks/tp_kernel_check.py

With one chip the mesh is 1-wide on 'tp' (shard_map still wraps the kernel
— the same code path as tp>1, just without a head split); on a multi-chip
slice the same script validates real head-sharded execution. Compares
against the unsharded jnp oracle over a mixed prefill/decode batch, bf16
and int8-KV.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the TPU (got {jax.default_backend()}); pytest covers CPU")
    sys.path.insert(0, ".")
    from hydrainfer_tpu.ops.attention import (paged_attention_jnp,
                                              paged_attention_tp)
    from hydrainfer_tpu.parallel.mesh import make_mesh, shard_kv_cache
    from tests.parallel.test_tp_attention import build_batch

    n = len(jax.devices())
    mesh = make_mesh(n, axis_names=("dp", "tp"), shape=(1, n))
    rng = np.random.default_rng(0)
    for kv_scale, dtype, label in [(None, jnp.bfloat16, "bf16"),
                                   (0.05, jnp.bfloat16, "int8-kv")]:
        q, cache, params = build_batch(rng, n_blocks=64, block_size=16,
                                       kvh=8, h=16, d=128, dtype=dtype)
        if kv_scale is not None:
            cache = jnp.clip(jnp.round(cache.astype(jnp.float32) / kv_scale),
                             -127, 127).astype(jnp.int8)
        ref = paged_attention_jnp(q, cache, 1, params, 0.0883883,
                                  max_q=5, kv_scale=kv_scale)
        q_s = jax.device_put(q, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "tp", None)))
        cache_s = shard_kv_cache(cache, mesh)
        got = jax.jit(lambda *a: paged_attention_tp(
            *a, sm_scale=0.0883883, max_q=5, mesh=mesh, impl="ragged",
            kv_scale=kv_scale))(q_s, cache_s, 1, params)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{label}: tp={n} max_abs_err={err:.5f}")
        assert err < 0.05, f"{label}: kernel-under-shard_map diverged ({err})"
    print("OK: ragged kernel runs under shard_map on the TP-sharded layout")


if __name__ == "__main__":
    main()
