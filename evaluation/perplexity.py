"""Perplexity evaluation — the BASELINE correctness criterion
("perplexity/accuracy within reference Δ at the same bit-width").

Computes token-level negative log-likelihood over sequences through the
paged-cache model (full-row logits via an all-positions sample batch) so
fp32/bf16/int8-weight/int8-KV configurations can be compared, and against
HF transformers for the same checkpoint.

Usage:
  python -m evaluation.perplexity --model-path CKPT [--quant int8]
      [--kv-int8] [--num-seqs 8] [--seq-len 128]
"""
import argparse
import json
import math

import jax.numpy as jnp
import numpy as np


def make_full_logit_batch(token_ids, block_size, hidden):
    """Single-sequence batch that samples EVERY position's logits."""
    from hydrainfer_tpu.models.factory import LanguageModelBatch
    from hydrainfer_tpu.ops.attention import PagedAttentionParams
    T = len(token_ids)
    n_blocks = -(-T // block_size)
    return LanguageModelBatch(
        token_ids=jnp.asarray(token_ids, jnp.int32),
        positions=jnp.arange(T, dtype=jnp.int32),
        image_features=jnp.zeros((0, hidden), jnp.float32),
        image_dst_idx=jnp.zeros((0,), jnp.int32),
        attention=PagedAttentionParams(
            q_seq_ids=jnp.zeros(T, jnp.int32),
            q_local_ids=jnp.arange(T, dtype=jnp.int32),
            positions=jnp.arange(T, dtype=jnp.int32),
            kv_lens=jnp.full((T,), T, jnp.int32),
            block_tables=jnp.broadcast_to(
                jnp.arange(n_blocks, dtype=jnp.int32), (T, n_blocks)),
            new_kv_slot_ids=jnp.arange(T, dtype=jnp.int32),
            cu_q_lens=jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.full((T,), T, jnp.int32)]),
            num_seqs=jnp.asarray([1], jnp.int32)),
        # every row sampled → logits for all positions
        sample_token_idx=jnp.arange(T, dtype=jnp.int32),
        token_src_slots=jnp.full((T,), -1, jnp.int32),
        sample_dst_slots=jnp.full((T,), -1, jnp.int32),
    )


def sequence_nll(lm, lcfg, token_ids, block_size=16, cache_dtype=jnp.bfloat16):
    """Mean NLL of token_ids[1:] given the prefix, via one prefill."""
    T = len(token_ids)
    n_blocks = -(-T // block_size) + 1
    cache = jnp.zeros((lcfg.n_layers, 1, n_blocks, block_size,
                       2 * lcfg.n_kv_heads, lcfg.head_dim), cache_dtype)
    batch = make_full_logit_batch(token_ids, block_size, lcfg.hidden_size)
    _, _, logits = lm.forward_with_logits(cache, batch, max_q=T)
    logits = np.asarray(logits, np.float32)              # (T, vocab)
    logp = logits - _logsumexp(logits)
    targets = np.asarray(token_ids[1:])
    return float(-logp[np.arange(T - 1), targets].mean())


def _logsumexp(x):
    m = x.max(-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(-1, keepdims=True))


def evaluate(model_path: str, dtype="bf16", quant="none", kv_int8=False,
             num_seqs=8, seq_len=128, seed=0):
    from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
    factory = getModelFactory(ModelFactoryConfig(
        path=model_path, dtype=dtype, quantization=quant,
        kv_cache_dtype="int8" if kv_int8 else "auto"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    rng = np.random.default_rng(seed)
    cache_dtype = jnp.int8 if kv_int8 else (
        jnp.float32 if dtype in ("fp32", "float32") else jnp.bfloat16)
    nlls = []
    for _ in range(num_seqs):
        seq = rng.integers(0, lcfg.vocab_size, size=seq_len).tolist()
        nlls.append(sequence_nll(lm, lcfg, seq, cache_dtype=cache_dtype))
    nll = float(np.mean(nlls))
    return {"nll": nll, "perplexity": math.exp(nll), "num_seqs": num_seqs,
            "seq_len": seq_len, "dtype": dtype, "quant": quant,
            "kv_int8": kv_int8}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--quant", default="none")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--num-seqs", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=128)
    args = ap.parse_args()
    print(json.dumps(evaluate(args.model_path, args.dtype, args.quant,
                              args.kv_int8, args.num_seqs, args.seq_len)))


if __name__ == "__main__":
    main()
