"""Quant-quality table — publishes the BASELINE correctness criterion
("perplexity/accuracy within reference Δ at the same bit-width") as a
committed artifact.

For each quantization config (int8 / int4 / fp8 weights, int8 KV, and the
headline int8+int8KV combo) this measures, against the bf16 run of the SAME
checkpoint on the SAME fixed token sequences:

  - Δ NLL / Δ perplexity  (numerical-fidelity drift of the distribution)
  - top-1 agreement        (fraction of positions whose greedy token matches)
  - mean KL(bf16 || quant) (distributional distance in nats)

Checkpoints are genuine HF ``save_pretrained`` trees built locally with fixed
seeds (no egress in this environment): a Llama decoder and a DeepSeek-V3 MLA
decoder — the latter exercises the single-plane latent cache int8 path the
reference cannot even load (its DeepSeek is plain GQA,
reference: hydrainfer/model/deepseek_v3.py:158-183). The reference's
equivalent workflow is the correctness dump diff
(reference: evaluation/test_correctness/evaluation.sh:30-54); ours adds
logit-level metrics instead of only token dumps.

Each checkpoint is briefly TRAINED (CPU torch) on a sparse synthetic Markov
task before measurement, and evaluated on held-out sequences from the same
chain. On an untrained init the top-1 metric is noise: logit margins sit at
init-scale (~1e-2 nats), so even fp8's KL of 3e-4 nats scored 0.873 and the
ranking degenerated into a KL contest. A trained model has real margins —
top-1 agreement then measures what deployment cares about (greedy decode
invariance), and the trained weights carry realistic per-channel outlier
structure, which is the regime group-wise int4 scales exist for.

Usage:
  python -m evaluation.quant_quality [--out evaluation/results/quant_quality.json]
"""
import argparse
import json
import math
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from evaluation.perplexity import make_full_logit_batch

# (label, weight-quant, int8-KV)
CONFIGS = [
    ("bf16", "none", False),          # baseline
    ("int8", "int8", False),
    ("int4", "int4", False),
    ("fp8", "fp8", False),
    ("int8kv", "none", True),
    ("int8+int8kv", "int8", True),
]


def make_llama_ckpt(root: str) -> str:
    import torch
    import transformers
    path = os.path.join(root, "tiny_llama_q")
    cfg = transformers.LlamaConfig(
        vocab_size=2048, hidden_size=256, intermediate_size=704,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return path


def make_mla_ckpt(root: str) -> str:
    import torch
    import transformers
    path = os.path.join(root, "tiny_dsv3_q")
    cfg = transformers.DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        kv_lora_rank=16, q_lora_rank=24,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=256, rope_interleave=True,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(1)
    model = transformers.DeepseekV3ForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)
    return path


def markov_sampler(vocab: int, branching: int = 4, seed: int = 7):
    """Sparse first-order Markov chain: every token has `branching` fixed
    successors with Zipf-ish transition probabilities (entropy ~0.92 nats →
    a trained model is CONFIDENT, unlike uniform-random eval tokens)."""
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, vocab, size=(vocab, branching))
    probs = np.asarray([0.7, 0.15, 0.1, 0.05][:branching], np.float64)
    probs = probs / probs.sum()

    def sample(n_seqs: int, T: int, seed2: int) -> np.ndarray:
        r = np.random.default_rng(seed2)
        seqs = np.empty((n_seqs, T), np.int64)
        seqs[:, 0] = r.integers(0, vocab, n_seqs)
        for t in range(1, T):
            choice = r.choice(len(probs), size=n_seqs, p=probs)
            seqs[:, t] = succ[seqs[:, t - 1], choice]
        return seqs

    return sample


def train_ckpt(path: str, sampler, steps: int, batch: int = 16,
               T: int = 64, lr: float = 1e-3) -> float:
    """Brief CPU training of the HF checkpoint on the Markov task;
    overwrites the checkpoint in place. Returns the final loss."""
    import torch
    import transformers
    torch.manual_seed(0)
    model = transformers.AutoModelForCausalLM.from_pretrained(
        path).float().train()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    loss = float("nan")
    for step in range(steps):
        seqs = torch.from_numpy(sampler(batch, T, 10_000 + step))
        out = model(input_ids=seqs, labels=seqs)
        out.loss.backward()
        opt.step()
        opt.zero_grad()
        loss = float(out.loss)
    model.eval().save_pretrained(path, safe_serialization=True)
    return loss


def all_position_logits(path: str, quant: str, kv_int8: bool,
                        seqs: np.ndarray, block_size: int = 16) -> np.ndarray:
    """(n_seqs, T, vocab) float32 logits at EVERY position, one prefill per
    sequence through the paged-cache model (jnp attention handler — the
    Pallas kernels are separately proven token-exact against it)."""
    from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
    factory = getModelFactory(ModelFactoryConfig(
        path=path, dtype="bfloat16", quantization=quant,
        kv_cache_dtype="int8" if kv_int8 else "auto",
        attention_impl="jnp"))
    lm = factory.getLanguageModel()
    lcfg = factory.getLanguageModelConfig()
    cache_dtype = jnp.int8 if kv_int8 else jnp.bfloat16
    out = []
    for seq in seqs:
        T = len(seq)
        n_blocks = -(-T // block_size) + 1
        cache = jnp.zeros((lcfg.n_layers, 1, n_blocks, block_size,
                           2 * lcfg.n_kv_heads, lcfg.head_dim), cache_dtype)
        batch = make_full_logit_batch(list(seq), block_size, lcfg.hidden_size)
        _, _, logits = lm.forward_with_logits(cache, batch, max_q=T)
        out.append(np.asarray(logits, np.float32))
    return np.stack(out)


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(-1, keepdims=True)
    z = x - m
    return z - np.log(np.exp(z).sum(-1, keepdims=True))


def metrics_vs_baseline(logits: np.ndarray, base: np.ndarray,
                        seqs: np.ndarray) -> dict:
    logp = _log_softmax(logits)
    base_logp = _log_softmax(base)
    # next-token NLL of the fixed sequences
    tgt = seqs[:, 1:]
    idx = np.arange(seqs.shape[1] - 1)
    nll = float(np.mean([-lp[idx, t].mean() for lp, t in zip(logp, tgt)]))
    base_nll = float(np.mean([-lp[idx, t].mean()
                              for lp, t in zip(base_logp, tgt)]))
    agree = float((logits.argmax(-1) == base.argmax(-1)).mean())
    kl = float((np.exp(base_logp) * (base_logp - logp)).sum(-1).mean())
    return {"nll": round(nll, 5), "perplexity": round(math.exp(nll), 3),
            "delta_nll": round(nll - base_nll, 5),
            "delta_perplexity": round(math.exp(nll) - math.exp(base_nll), 3),
            "top1_agreement": round(agree, 4),
            "mean_kl_nats": round(kl, 6)}


def evaluate_model(path: str, n_seqs: int, seq_len: int, vocab: int,
                   seed: int, sampler=None) -> dict:
    if sampler is not None:     # held-out sequences from the trained task
        seqs = sampler(n_seqs, seq_len, 777 + seed)
    else:
        rng = np.random.default_rng(seed)
        seqs = rng.integers(0, vocab, size=(n_seqs, seq_len))
    base = None
    rows = {}
    for label, quant, kv_int8 in CONFIGS:
        logits = all_position_logits(path, quant, kv_int8, seqs)
        if base is None:
            base = logits
        rows[label] = metrics_vs_baseline(logits, base, seqs)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation/results/quant_quality.json")
    ap.add_argument("--num-seqs", type=int, default=8)
    ap.add_argument("--ckpt-dir", default="",
                    help="reuse/keep checkpoints here (default: temp dir)")
    ap.add_argument("--train-steps", type=int, default=400,
                    help="CPU training steps on the synthetic Markov task "
                         "before measuring (0 = evaluate the raw init — "
                         "reproduces the old margin-free table)")
    args = ap.parse_args()

    root = args.ckpt_dir or tempfile.mkdtemp(prefix="quantq_")
    results = {}
    llama = make_llama_ckpt(root)
    llama_sampler = None
    if args.train_steps:
        llama_sampler = markov_sampler(2048, seed=7)
        loss = train_ckpt(llama, llama_sampler, args.train_steps)
        print(f"llama-tiny trained {args.train_steps} steps, "
              f"final loss {loss:.3f} (task entropy ~0.92 nats)")
    results["llama-tiny"] = evaluate_model(llama, args.num_seqs,
                                           seq_len=128, vocab=2048, seed=0,
                                           sampler=llama_sampler)
    mla = make_mla_ckpt(root)
    mla_sampler = None
    if args.train_steps:
        mla_sampler = markov_sampler(256, seed=9)
        loss = train_ckpt(mla, mla_sampler, args.train_steps, T=48)
        print(f"deepseek-v3-mla-tiny trained {args.train_steps} steps, "
              f"final loss {loss:.3f}")
    results["deepseek-v3-mla-tiny"] = evaluate_model(
        mla, args.num_seqs, seq_len=64, vocab=256, seed=1,
        sampler=mla_sampler)

    payload = {
        "methodology": ("HF save_pretrained checkpoints (fixed torch seeds), "
                        "fixed random token sequences, all-position logits "
                        "through the paged-cache model; every quant config "
                        "vs the bf16 run of the same checkpoint"),
        "configs": [c[0] for c in CONFIGS],
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    for model, rows in results.items():
        print(f"\n## {model}")
        print("| config | ppl | Δppl | top-1 agree | KL (nats) |")
        print("|---|---|---|---|---|")
        for label, m in rows.items():
            print(f"| {label} | {m['perplexity']} | {m['delta_perplexity']} "
                  f"| {m['top1_agreement']} | {m['mean_kl_nats']} |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
