"""Scheduler unit tests (reference test strategy: bottom-up, exact
behavioral asserts — tests/memory/test_prefix_cache.py style)."""
from hydrainfer_tpu.engine.isa import (EmptyInstruction, InstructionListBuilder,
                                       PullCache, TextFill)
from hydrainfer_tpu.engine.rcb import RequestControlBlock
from hydrainfer_tpu.engine.scheduler import BatchScheduler, BatchSchedulerConfig
from hydrainfer_tpu.memory import (TokenCacheBlockManager,
                                   TokenCacheBlockManagerConfig)
from hydrainfer_tpu.request import RequestMetadata, SamplingParameters


def make_scheduler(max_running=4, n_blocks=64, block_size=4, token_budget=64,
                   chunked=True):
    kv = TokenCacheBlockManager(TokenCacheBlockManagerConfig(
        n_layers=1, n_tensors=1, n_blocks=n_blocks, block_size=block_size,
        n_heads=2, head_dim=8, dtype="fp32"))
    img = TokenCacheBlockManager(TokenCacheBlockManagerConfig(
        n_layers=1, n_tensors=1, n_blocks=8, block_size=4,
        n_heads=2, head_dim=8, dtype="fp32"))
    sched = BatchScheduler(
        BatchSchedulerConfig(max_running_requests=max_running,
                             chunked_prefill=chunked),
        kv, img, image_budget=2, token_budget=token_budget)
    return sched, kv


def make_rcb(n_prompt, max_tokens=4, pull=False):
    rcb = RequestControlBlock()
    rcb.sampling_params = SamplingParameters(max_tokens=max_tokens)
    rcb.request_metadata = RequestMetadata(0, n_prompt, n_prompt, 0)
    b = InstructionListBuilder()
    if pull:
        b.append(PullCache())
    b.append(TextFill(list(range(10, 10 + n_prompt)), list(range(n_prompt)),
                      list(range(n_prompt)), True, None, None))
    rcb.instructions = b.build()
    return rcb


def test_admission_respects_max_running():
    sched, _ = make_scheduler(max_running=2)
    for i in range(5):
        sched.schedule_new(make_rcb(4))
    batch = sched.step()
    assert len(batch) == 2
    assert len(sched.waiting) == 3


def test_pullcache_jumps_queue_and_overloads():
    sched, _ = make_scheduler(max_running=1)
    normal = make_rcb(4)
    sched.schedule_new(normal)
    batch = sched.step()
    assert [r for r, _ in batch] == [normal]
    sched.schedule_running(normal)  # still running (decoding)

    # a migrated-in request arrives: jumps the queue AND bypasses the full
    # running cap (overload window, cross-node pull-deadlock avoidance)
    sched.schedule_new(make_rcb(4))            # plain waiter
    puller = make_rcb(4, pull=True)
    sched.schedule_new(puller)
    batch = sched.step()
    rcbs = [r for r, _ in batch]
    assert puller in rcbs and normal in rcbs and len(rcbs) == 2


def test_token_budget_chunks_marginal_prefill():
    sched, _ = make_scheduler(max_running=4, token_budget=10)
    a, b = make_rcb(8), make_rcb(8)
    sched.schedule_new(a)
    sched.schedule_new(b)
    batch = sched.step()
    sizes = [len(inst.token_ids) for _, inst in batch]
    assert sorted(sizes) == [2, 8]       # b chunked to the leftover budget
    # emulate the node: execution advances the cursor, then reschedules
    for rcb, _ in batch:
        rcb.step()
        sched.schedule_running(rcb)
    batch2 = sched.step()
    from hydrainfer_tpu.engine.isa import Fill
    sizes2 = [len(inst.token_ids) for _, inst in batch2
              if isinstance(inst, Fill)]
    assert sizes2 == [6]                 # the chunk remainder


def test_oversized_prefill_not_starved():
    sched, _ = make_scheduler(token_budget=4, chunked=False)
    big = make_rcb(12)
    sched.schedule_new(big)
    batch = sched.step()
    assert len(batch) == 1 and len(batch[0][1].token_ids) == 12


def test_decode_priority_policy():
    sched, _ = make_scheduler(token_budget=6)
    sched.config.priority = "decode"
    p = make_rcb(8)     # prefill
    d = make_rcb(4)     # will be decode-sized (1 token)
    d.instructions.head.next.token_ids = [42]
    d.instructions.head.next.position_ids = [3]
    d.instructions.head.next.cache_ids = [3]
    sched.schedule_new(p)
    sched.schedule_new(d)
    batch = sched.step()
    sizes = [len(inst.token_ids) for _, inst in batch]
    assert sizes[0] == 1                 # decode packed first
    assert sum(sizes) <= 6


def test_kv_reservation_blocks_admission():
    # pool of 8 blocks x4 = 32 tokens; each request demands 20+4
    sched, kv = make_scheduler(max_running=8, n_blocks=8)
    a, b = make_rcb(20), make_rcb(20)
    sched.schedule_new(a)
    sched.schedule_new(b)
    batch = sched.step()
    assert len(batch) == 1               # only one fits the reservation
    assert len(sched.waiting) == 1


def test_oversized_request_rejected():
    sched, kv = make_scheduler(n_blocks=4)  # 16-token pool
    done = []
    class P:
        def append_token_id(self, t, last):
            done.append((t, last))
    huge = make_rcb(40)
    huge.output_token_processors.append(P())
    sched.schedule_new(huge)
    batch = sched.step()
    assert len(batch) == 0
    assert done == [(-1, True)]


def test_reservation_discounts_prefix_hits():
    """Admission reservations must not double-count prompt blocks already
    resident in the prefix cache: a warm-prefix request reserves only its
    unmatched tail, so concurrent prefix-sharing requests fit a pool their
    worst cases would overflow."""
    # pool 10 blocks: A reserves 6; B's worst case is 5 (refused cold:
    # 6+5 > 10) but its fully-warm 4-block prompt discounts to 1 (admitted)
    sched, kv = make_scheduler(max_running=8, n_blocks=10)
    # warm the prefix cache: 4 registered blocks (16 prompt tokens)
    hashes = [101, 102, 103, 104]
    vc = kv.allocate_virtual_cache()
    kv.realloc(vc, 16)
    kv.set_blocks(vc, [0, 1, 2, 3], hashes)

    a = make_rcb(20)                     # 20+4 tokens -> 6 blocks reserved
    sched.schedule_new(a)
    assert len(sched.step()) == 1

    b = make_rcb(16, max_tokens=4)
    b.instructions.head.next.hashes = hashes    # fully warm prompt -> 1
    sched.schedule_new(b)
    batch = sched.step()
    assert len(batch) == 1 and batch[0][0] is b
    assert len(sched.waiting) == 0

    # the same request with a COLD prompt is refused
    sched2, kv2 = make_scheduler(max_running=8, n_blocks=10)
    a2 = make_rcb(20)
    sched2.schedule_new(a2)
    assert len(sched2.step()) == 1
    c = make_rcb(16, max_tokens=4)
    sched2.schedule_new(c)
    assert len(sched2.step()) == 0
    assert len(sched2.waiting) == 1


def test_prefix_discount_pins_matched_blocks():
    """The admission discount must PIN its matched blocks: an evictable
    match that could vanish before allocation would silently break the
    reservation no-deadlock invariant. Pins release once the virtual cache
    holds its own, or with the reservation."""
    sched, kv = make_scheduler(max_running=8, n_blocks=10)
    hashes = [201, 202, 203, 204]
    vc = kv.allocate_virtual_cache()
    kv.realloc(vc, 16)
    kv.set_blocks(vc, [0, 1, 2, 3], hashes)
    kv.free(vc)                               # blocks now evictable
    assert kv.shared_cache.n_available() == 4

    b = make_rcb(16, max_tokens=4)
    b.instructions.head.next.hashes = hashes
    sched.schedule_new(b)
    batch = sched.step()
    assert len(batch) == 1
    # discounted AND pinned: no longer evictable out from under the discount
    assert b._kv_reservation == 1
    assert kv.shared_cache.n_available() == 0
    # allocation re-pins via the virtual cache and drops the admission pins
    assert b.virtual_kv_cache is not None
    assert getattr(b, "_admission_pins", None) is None
    assert b.virtual_kv_cache.n_cache_tokens == 16  # all 4 blocks matched

    sched.release_reservation(b)              # idempotent wrt pins


def make_embed_rcb(n_images=1):
    import numpy as np
    from hydrainfer_tpu.engine.isa import ImageEmbed
    rcb = RequestControlBlock()
    rcb.sampling_params = SamplingParameters(max_tokens=4)
    rcb.request_metadata = RequestMetadata(0, 4, 4, n_images)
    b = InstructionListBuilder()
    b.append(ImageEmbed(np.zeros((n_images, 4), np.float32),
                        list(range(4 * n_images)),
                        [(2, 2)] * n_images, None))
    b.append(TextFill([1, 2, 3, 4], [0, 1, 2, 3], [0, 1, 2, 3], True,
                      None, None))
    rcb.instructions = b.build()
    return rcb


def test_encode_sub_batching_with_fills_resident():
    """With decodes/prefills resident, at most encode_chunk_images images
    are admitted per step (ViT bursts interleave with decode windows
    instead of head-of-line blocking them); with no fills resident the
    full profiled image budget applies."""
    from hydrainfer_tpu.engine.isa import ImageEmbed

    def counts(batch):
        embeds = sum(isinstance(i, ImageEmbed) for _, i in batch)
        fills = sum(not isinstance(i, ImageEmbed) for _, i in batch)
        return embeds, fills

    # no fills resident: full budget (2) admitted
    sched, _ = make_scheduler(max_running=8)
    sched.config.encode_chunk_images = 1
    for _ in range(2):
        sched.schedule_new(make_embed_rcb())
    embeds, _ = counts(sched.step())
    assert embeds == 2

    # fills resident: only encode_chunk_images admitted per step
    sched, _ = make_scheduler(max_running=8)
    sched.config.encode_chunk_images = 1
    decode = make_rcb(4)
    sched.schedule_new(decode)
    sched.step()
    sched.schedule_running(decode)        # resident decode
    for _ in range(2):
        sched.schedule_new(make_embed_rcb())
    embeds, fills = counts(sched.step())
    assert embeds == 1 and fills == 1

    # chunking off (0): full budget even with fills resident
    sched, _ = make_scheduler(max_running=8)
    sched.config.encode_chunk_images = 0
    decode = make_rcb(4)
    sched.schedule_new(decode)
    sched.step()
    sched.schedule_running(decode)
    for _ in range(2):
        sched.schedule_new(make_embed_rcb())
    embeds, fills = counts(sched.step())
    assert embeds == 2 and fills == 1
