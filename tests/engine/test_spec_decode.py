"""N-gram speculative decoding: the engine with spec_ngram_k>0 must emit
EXACTLY the greedy tokens of the plain engine — on repetitive prompts (high
acceptance), non-repetitive prompts (proposer finds nothing, normal path),
and eos inside an accepted run. Plus proposer unit behavior and an
acceptance-actually-happened assertion (the speedup exists)."""
import sys

sys.path.insert(0, "/root/repo")

from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.executor import FillExecutor
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models.random_init import RandomWeightFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def test_ngram_proposer():
    propose = FillExecutor.propose_ngram
    # trailing trigram [7,8,9] seen earlier, continued by [4,5,6]
    ctx = [1, 2, 7, 8, 9, 4, 5, 6, 3, 7, 8, 9]
    assert propose(ctx, 3) == [4, 5, 6]
    assert propose(ctx, 2) == [4, 5]
    # bigram fallback
    assert propose([5, 6, 9, 9, 5, 6], 2, n=3) == [9, 9]
    # no repeats -> no draft
    assert propose([1, 2, 3, 4, 5], 4) == []
    assert propose([1], 4) == []


def run_engine(spec_k, prompts, max_tokens=24, ignore_eos=True):
    factory = RandomWeightFactory("tiny-lm")
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=512, n_image_blocks=1)
    cfg.model.dtype = "fp32"
    cfg.spec_ngram_k = spec_k
    engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
    reqs = [Request(request_id=f"r{i}", prompt=p,
                    sampling_params=SamplingParameters(
                        max_tokens=max_tokens, ignore_eos=ignore_eos,
                        eos_token_ids=[] if ignore_eos else [40]))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs, timeout_s=600)
    return [o.output_token_ids for o in outs]


REPETITIVE = "abc abc abc abc abc abc"
MIXED = ["the quick brown fox", REPETITIVE, "xyzw", "ab ab ab ab ab"]


def test_spec_matches_plain_greedy():
    ref = run_engine(0, MIXED)
    got = run_engine(3, MIXED)
    assert got == ref
    assert all(len(t) == 24 for t in got)


def test_spec_accepts_drafts():
    """On a repetitive prompt a random-weight model loops quickly, so the
    n-gram proposer must land accepted drafts — assert speculation actually
    fired with nonzero acceptance, not just fell through."""
    accepted = []
    orig = FillExecutor.execute_spec

    def spy(self, batch, k, n=3):
        before = [len(r.output_token_ids) for r, _ in batch]
        out = orig(self, batch, k, n)
        if out is not None:
            after = [len(r.output_token_ids) for r, _ in batch]
            accepted.extend(a - b for a, b in zip(after, before))
        return out

    FillExecutor.execute_spec = spy
    try:
        run_engine(3, [REPETITIVE, "ab ab ab ab ab"])
    finally:
        FillExecutor.execute_spec = orig
    assert accepted, "speculative path never engaged"
    assert max(accepted) >= 2, accepted   # at least one multi-token step


def test_spec_eos_mid_acceptance():
    ref = run_engine(0, MIXED, ignore_eos=False)
    got = run_engine(3, MIXED, ignore_eos=False)
    assert got == ref


def test_spec_rejection_sampling_preserves_distribution():
    """The spec-sampling theorem: with a one-hot draft proposal, the
    marginal law of the first emitted token equals plain sampling from the
    target distribution — acceptance or not."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hydrainfer_tpu.ops.sampling import spec_verify_tokens

    V, K1, N = 16, 2, 4000
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, K1, V)).astype(np.float32))
    target = np.asarray(jax.nn.softmax(logits[0, 0] / 0.7))
    draft = jnp.asarray([[3, 0]], dtype=jnp.int32)   # proposes token 3

    counts = np.zeros(V)
    emit_fn = jax.jit(lambda key: spec_verify_tokens(
        logits, draft, jnp.asarray([1]),
        temperature=jnp.asarray([0.7]), top_k=jnp.asarray([-1]),
        top_p=jnp.asarray([1.0]), key=key))
    keys = jax.random.split(jax.random.key(42), N)
    for i in range(N):
        emitted, acc = emit_fn(keys[i])
        counts[int(emitted[0, 0])] += 1
    emp = counts / N
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.05, (tv, emp, target)


def test_spec_with_temperature_smoke():
    """Stochastic requests speculate too (rejection sampling): the engine
    must emit exactly max_tokens and actually take the spec path."""
    from hydrainfer_tpu.engine.executor import FillExecutor

    fired = []
    orig = FillExecutor.execute_spec

    def spy(self, batch, k, n=3):
        out = orig(self, batch, k, n)
        if out is not None:
            fired.append(1)
        return out

    # force drafts: with temperature the sampled context rarely repeats
    # n-grams, so pin the proposer — the verify path is what's under test
    orig_prop = FillExecutor.__dict__["propose_ngram"]  # the staticmethod
    FillExecutor.propose_ngram = staticmethod(lambda ctx, k, n=3: [5, 6, 7][:k])
    FillExecutor.execute_spec = spy
    try:
        factory = RandomWeightFactory("tiny-lm")
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=512, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        cfg.spec_ngram_k = 3
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD")
        reqs = [Request(request_id=f"t{i}", prompt=REPETITIVE,
                        sampling_params=SamplingParameters(
                            max_tokens=16, ignore_eos=True,
                            temperature=0.8, top_k=8, top_p=0.95))
                for i in range(2)]
        outs = engine.generate(reqs, timeout_s=600)
    finally:
        FillExecutor.execute_spec = orig
        FillExecutor.propose_ngram = orig_prop
    assert all(len(o.output_token_ids) == 16 for o in outs)
    assert fired, "stochastic spec path never engaged"


def test_spec_under_tensor_parallel():
    """The verify step must produce identical greedy tokens under a TP
    mesh (GSPMD-partitioned verify program)."""
    import jax
    from hydrainfer_tpu.cluster.node import NodeConfig
    from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
    from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    from hydrainfer_tpu.models.random_init import RandomWeightFactory

    def run(spec_k, devices=None):
        factory = RandomWeightFactory("tiny-lm")
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=256, n_image_blocks=1)
        cfg.model.dtype = "fp32"
        cfg.model.attention_impl = "jnp"
        cfg.spec_ngram_k = spec_k
        engine = OfflineEngine(cfg, model_factory=factory, node_type="PD",
                               devices=devices)
        reqs = [Request(request_id="r0", prompt=REPETITIVE,
                        sampling_params=SamplingParameters(max_tokens=16,
                                                           ignore_eos=True))]
        return [o.output_token_ids for o in engine.generate(reqs,
                                                            timeout_s=600)]

    plain = run(0)
    tp_spec = run(3, devices=jax.devices()[:4])
    assert tp_spec == plain


def test_spec_backoff_after_misses():
    """A proposer miss (no n-gram hit anywhere in the batch) triggers an
    exponential skip window (2 → 4 → ... → 64) so non-lookup workloads
    stop paying the synchronous pipeline drain; a hit resets it."""
    from hydrainfer_tpu.engine.executor import FillExecutor
    fx = FillExecutor.__new__(FillExecutor)
    fx._spec_skip = 0
    fx._spec_backoff = 0
    assert fx.spec_should_try()
    fx._spec_miss()
    assert [fx.spec_should_try() for _ in range(2)] == [False] * 2
    assert fx.spec_should_try()          # credits exhausted
    fx._spec_miss()
    assert fx._spec_skip == 4            # exponential growth
    for _ in range(4):
        fx.spec_should_try()
    for _ in range(8):
        fx._spec_miss()
    assert fx._spec_skip == 64           # capped
    fx._spec_hit()
    fx._spec_skip = 0
    assert fx.spec_should_try()
    fx._spec_miss()
    assert fx._spec_skip == 2            # reset after a hit
