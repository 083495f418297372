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
