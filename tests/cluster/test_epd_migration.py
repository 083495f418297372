"""EPD disaggregation: requests flow E → P → D across separate nodes with
cache-block migration (the 4-step protocol) between them."""
import asyncio
import time

import numpy as np
import pytest
from PIL import Image

from hydrainfer_tpu.cluster.migrate import MigrateGraphBuilder, NodeType
from hydrainfer_tpu.cluster.node import AsyncEPDNode, NodeConfig, NodeContext
from hydrainfer_tpu.engine.output_token_processor import (
    OfflineOutputTokenProcessor, OutputTokenParams)
from hydrainfer_tpu.engine.request_processor import (RequestProcessParameters,
                                                     RequestProcessorConfig)
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory
from hydrainfer_tpu.request import (OfflineInferenceOutput, Request,
                                    SamplingParameters)


def make_node(name, node_type):
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=16)
    cfg.model.dtype = "float32"
    node = AsyncEPDNode(cfg, NodeContext(name=name, node_type=NodeType(node_type)))
    node.init(FakeModelFactory(fake_config=FakeConfig()))
    return node


def wire(nodes):
    builder = MigrateGraphBuilder()
    for node in nodes:
        builder.add_node(node.name, node.context.node_type, node, tpot_slo=0.4)
    graph = builder.build_graph()
    for node in nodes:
        node.update_migrate_graph(graph)
    return graph


async def run_to_completion(nodes, entry_node, requests, timeout_s=60):
    outs = [OfflineInferenceOutput(arrival_time=time.perf_counter())
            for _ in requests]
    done = []
    tokenizer = entry_node.model_factory.getTokenizer()
    for req, out in zip(requests, outs):
        proc = OfflineOutputTokenProcessor(out, tokenizer,
                                           on_finish=lambda o: done.append(o))
        await entry_node.add_request(req, RequestProcessParameters(
            output_token_processors=[proc],
            output_token_params=OutputTokenParams(stream_output=False)))
    deadline = time.perf_counter() + timeout_s
    while len(done) < len(requests):
        for node in nodes:
            await node.step()
        await asyncio.sleep(0)
        assert time.perf_counter() < deadline, \
            f"stalled: {len(done)}/{len(requests)} finished"
    return outs


def test_pd_disaggregation_text():
    """P node prefills, D node decodes; KV blocks migrate P→D."""
    p = make_node("p0", "P")
    d = make_node("d0", "D")
    wire([p, d])
    reqs = [Request(request_id=i, prompt=f"hello number {i}",
                    sampling_params=SamplingParameters(max_tokens=6, ignore_eos=True))
            for i in range(4)]
    outs = asyncio.run(run_to_completion([p, d], p, reqs))
    for out in outs:
        assert len(out.output_token_ids) == 6
    # decode really happened on d: its kv cache saw allocations
    assert d.kv_cache_manager.block_allocator.n_free < d.kv_cache_manager.n_blocks
    # p freed its migrated blocks (all virtual caches released)
    assert p.batch_scheduler.metrics().n_requests_waiting_migrate == 0


def test_epd_disaggregation_image():
    """E encodes, P prefills (needs migrated image cache), D decodes."""
    e = make_node("e0", "E")
    p = make_node("p1", "P")
    d = make_node("d1", "D")
    wire([e, p, d])
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    reqs = [Request(request_id=f"img{i}", prompt="<image> describe", image=img,
                    sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True))
            for i in range(3)]
    outs = asyncio.run(run_to_completion([e, p, d], e, reqs))
    for out in outs:
        assert len(out.output_token_ids) == 4
    assert p.kv_cache_manager.block_allocator.n_free < p.kv_cache_manager.n_blocks


def test_hybrid_ep_d():
    """EP node does encode+prefill, D node decodes."""
    ep = make_node("ep0", "EP")
    d = make_node("d2", "D")
    wire([ep, d])
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    reqs = [
        Request(request_id="mm", prompt="<image> what", image=img,
                sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True)),
        Request(request_id="tt", prompt="plain text",
                sampling_params=SamplingParameters(max_tokens=4, ignore_eos=True)),
    ]
    outs = asyncio.run(run_to_completion([ep, d], ep, reqs))
    assert all(len(o.output_token_ids) == 4 for o in outs)


def test_migrated_kv_blocks_content():
    """The migrated KV content on the destination matches the source bytes."""
    p = make_node("p2", "P")
    d = make_node("d3", "D")
    wire([p, d])

    # put recognizable content into p's cache blocks
    src_mgr = p.kv_cache_manager
    vc = src_mgr.allocate_virtual_cache()
    src_mgr.realloc(vc, 8)
    data = np.random.default_rng(2).standard_normal(
        (2,) + src_mgr.cache_array.shape[:2] + src_mgr.cache_array.shape[3:]
    ).astype(np.float32)
    src_mgr.scatter_blocks(vc.block_table, data)

    dst_vc = asyncio.run(d._pull_virtual_cache(p, vc, is_kv=True))
    got = np.asarray(d.kv_cache_manager.gather_blocks(dst_vc.block_table))
    np.testing.assert_allclose(got, data, rtol=1e-6)


def test_decode_proceeds_during_pull():
    """Cache pulls are OVERLAPPED with compute: while a migrated request's
    blocks are in transit (a background task on the destination), the
    destination keeps issuing decode steps for its resident requests —
    the transfer must never stall the decode loop (reference overlaps
    NCCL transfers on a migrate stream, memory/communication.py:50-75).
    Also pins the migration stats surfaced in /metrics."""
    p = make_node("p5", "P")
    d = make_node("d5", "D")
    wire([p, d])

    pull_windows = []
    orig_pull = d._pull_virtual_cache

    async def slow_pull(src_node, src_vc, is_kv):
        t0 = time.perf_counter()
        for _ in range(10):          # a slow DCN-ish transfer, cooperative
            await asyncio.sleep(0.02)
        out = await orig_pull(src_node, src_vc, is_kv)
        pull_windows.append((t0, time.perf_counter()))
        return out

    d._pull_virtual_cache = slow_pull

    fill_times = []
    orig_exec = d.executor.execute_fill

    def spy(batch, n_steps=1):
        if len(batch):
            fill_times.append(time.perf_counter())
        return orig_exec(batch, n_steps=n_steps)

    d.executor.execute_fill = spy

    async def scenario():
        done = []
        tokenizer = p.model_factory.getTokenizer()
        outs = []

        async def submit(req):
            out = OfflineInferenceOutput(arrival_time=time.perf_counter())
            outs.append(out)
            proc = OfflineOutputTokenProcessor(
                out, tokenizer, on_finish=lambda o: done.append(o))
            await p.add_request(req, RequestProcessParameters(
                output_token_processors=[proc],
                output_token_params=OutputTokenParams(stream_output=False)))

        await submit(Request(request_id="resident", prompt="long decoder",
                             sampling_params=SamplingParameters(
                                 max_tokens=60, ignore_eos=True)))
        deadline = time.perf_counter() + 60
        sent_b = False
        while len(done) < 2:
            for node in (p, d):
                await node.step()
            await asyncio.sleep(0)
            # once the resident request is decoding on d, send the second
            # request — ITS pull must overlap the resident's decode steps
            if not sent_b and len(outs[0].output_token_ids) >= 3:
                sent_b = True
                await submit(Request(
                    request_id="migrator", prompt="late arriving request",
                    sampling_params=SamplingParameters(max_tokens=5,
                                                       ignore_eos=True)))
            assert time.perf_counter() < deadline, "stalled"
        return outs

    outs = asyncio.run(scenario())
    assert len(outs[0].output_token_ids) == 60
    assert len(outs[1].output_token_ids) == 5
    assert len(pull_windows) == 2
    # decode fills issued strictly inside the second pull's transfer window
    t0, t1 = pull_windows[1]
    overlapped = [t for t in fill_times if t0 < t < t1]
    assert len(overlapped) >= 3, (
        f"decode stalled during pull: {len(overlapped)} fills in "
        f"{t1 - t0:.3f}s window")
    # migration stats reach /metrics
    from hydrainfer_tpu.cluster.cluster import node_metrics
    m = node_metrics(d)
    assert m["migration_pulls"] == 2
    assert m["migration_pull_s_total"] > 0.4  # 2 pulls x 10 x 20ms sleeps
    assert m["migration_pull_mb"] > 0


def test_migration_does_not_leak_token_slots():
    """Regression: a migrated RCB must not carry the source node's token-table
    slot — the destination would skip allocation and, on completion, inject a
    foreign slot id into its own free list (duplicates → two requests sharing
    one slot, crossing sampled tokens)."""
    p = make_node("p4", "P")
    d = make_node("d4", "D")
    wire([p, d])
    reqs = [Request(request_id=f"s{i}", prompt=f"slot check {i}",
                    sampling_params=SamplingParameters(max_tokens=5, ignore_eos=True))
            for i in range(6)]
    asyncio.run(run_to_completion([p, d], p, reqs))
    for node in (p, d):
        free = node.executor.fill_executor._free_slots
        table = int(node.executor.fill_executor.token_table.shape[0])
        assert len(free) == len(set(free)), f"{node.name}: duplicate slots"
        assert len(free) <= table, f"{node.name}: free list grew past table"
        assert all(0 <= s < table for s in free), f"{node.name}: foreign slot id"
