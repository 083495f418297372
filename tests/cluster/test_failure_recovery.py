"""Failure handling parity (reference: migration RPC retried twice then the
request is terminated, epdnode.py:428-442; Ray actors restarted once,
cluster.py:131). Here: migrate retry against the next balancer target,
source-side block free on failed pulls, spawned-node respawn, and the
shm→RPC data-plane fallback."""
import asyncio
import time

import pytest

from hydrainfer_tpu.cluster.migrate import MigrateGraphBuilder, NodeType
from hydrainfer_tpu.cluster.node import AsyncEPDNode, NodeConfig, NodeContext
from hydrainfer_tpu.engine.output_token_processor import LogOutputTokenProcessor
from hydrainfer_tpu.engine.request_processor import (RequestProcessorConfig,
                                                     RequestProcessParameters)
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory
from hydrainfer_tpu.request import Request, SamplingParameters


def make_node(name, node_type, migrate_retries=2):
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=16,
        migrate_retries=migrate_retries)
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


async def drive(nodes, procs, timeout_s=30):
    deadline = time.perf_counter() + timeout_s
    while not all(p.finished for p in procs):
        for node in nodes:
            await node.step()
        await asyncio.sleep(0)
        assert time.perf_counter() < deadline, (
            f"stalled: finished={[p.finished for p in procs]}")


def requests(n, max_tokens=6):
    return [Request(request_id=f"f{i}", prompt=f"failure test req {i}",
                    sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                       ignore_eos=True))
            for i in range(n)]


def test_migrate_retry_lands_on_next_target():
    """A dead decode node's migrate RPC fails; the retry picks the next
    balancer target and the request completes there untouched."""
    p = make_node("p0", "P")
    d_bad = make_node("dbad", "D")
    d_good = make_node("dgood", "D")
    wire([p, d_bad, d_good])

    async def broken_migrate(src_node, rcb):
        raise ConnectionError("node down")

    d_bad.migrate = broken_migrate

    async def run():
        procs = [LogOutputTokenProcessor() for _ in range(4)]
        for req, proc in zip(requests(4), procs):
            await p.add_request(req, RequestProcessParameters(
                output_token_processors=[proc]))
        # d_bad never steps (it is "dead"); p and d_good carry the load
        await drive([p, d_good], procs)
        return procs

    procs = asyncio.run(run())
    assert all(p_.finished and not p_.terminated for p_ in procs)
    assert all(len(p_.token_ids) == 6 for p_ in procs)
    # decode really happened on the good node
    assert (d_good.kv_cache_manager.block_allocator.n_free
            < d_good.kv_cache_manager.n_blocks)
    # no migrating reservation leaked on the source
    assert p.batch_scheduler.metrics().n_requests_waiting_migrate == 0


def test_migrate_exhausted_retries_terminates_and_frees():
    """Every decode target down: after the configured retries the request is
    terminated (no fabricated EOS token) and the source frees its blocks
    and migrating reservation."""
    p = make_node("p1", "P", migrate_retries=1)
    d = make_node("d1", "D")
    wire([p, d])

    async def broken_migrate(src_node, rcb):
        raise ConnectionError("node down")

    d.migrate = broken_migrate

    async def run():
        procs = [LogOutputTokenProcessor() for _ in range(2)]
        for req, proc in zip(requests(2), procs):
            await p.add_request(req, RequestProcessParameters(
                output_token_processors=[proc]))
        deadline = time.perf_counter() + 30
        while not all(pr.finished for pr in procs):
            await p.step()
            await asyncio.sleep(0)
            assert time.perf_counter() < deadline
        return procs

    procs = asyncio.run(run())
    # terminated with at most the prefill's own sampled token — the failure
    # path must not append a fabricated EOS as a "generated" token
    assert all(pr.terminated and len(pr.token_ids) <= 1 for pr in procs)
    assert p.batch_scheduler.metrics().n_requests_waiting_migrate == 0
    # all blocks reclaimed: free, or unpinned into the prefix cache
    # (second-chance semantics) — none may stay pinned by the dead requests
    mgr = p.kv_cache_manager
    reclaimable = (mgr.block_allocator.n_free
                   + len(mgr.shared_cache._evictable))
    assert reclaimable == mgr.n_blocks


def test_failed_pull_frees_source_blocks():
    """A pull that fails mid-transfer must best-effort free the SOURCE's
    blocks and migrating reservation too (ADVICE r3: repeated transient
    pull failures used to drain the source KV pool permanently)."""
    p = make_node("p2", "P")
    d = make_node("d2", "D")
    wire([p, d])

    orig = d._pull_virtual_cache
    fail = {"n": 2}

    async def flaky_pull(src_node, src_vc, is_kv):
        if fail["n"] > 0:
            fail["n"] -= 1
            raise ConnectionError("transfer interrupted")
        return await orig(src_node, src_vc, is_kv)

    d._pull_virtual_cache = flaky_pull

    async def run():
        procs = [LogOutputTokenProcessor() for _ in range(3)]
        for req, proc in zip(requests(3), procs):
            await p.add_request(req, RequestProcessParameters(
                output_token_processors=[proc]))
        await drive([p, d], procs)
        return procs

    procs = asyncio.run(run())
    n_terminated = sum(pr.terminated for pr in procs)
    n_ok = sum(pr.finished and not pr.terminated for pr in procs)
    assert n_terminated == 2 and n_ok == 1
    # both sides fully reclaimed: no leaked blocks (free or evictable in
    # the prefix cache), no stuck migrating reservations
    for node in (p, d):
        mgr = node.kv_cache_manager
        reclaimable = (mgr.block_allocator.n_free
                       + len(mgr.shared_cache._evictable))
        assert reclaimable == mgr.n_blocks, node.name
        assert node.batch_scheduler.metrics().n_requests_waiting_migrate == 0


def test_shm_attach_failure_falls_back_to_rpc():
    """boot_id matches but /dev/shm is namespaced (two containers on one
    kernel): the shm attach fails, the proxy demotes itself to the RPC data
    plane and the pull still succeeds (ADVICE r3)."""
    import numpy as np

    from hydrainfer_tpu.cluster.process_node import PeerInfo, PeerNodeProxy

    blocks = np.arange(24, dtype=np.float32).reshape(2, 3, 4)

    class FakeRpc:
        def __init__(self):
            self.calls = []

        async def call(self, method, *args, **kw):
            self.calls.append(method)
            if method == "gather_blocks_shm":
                return ("/hydrainfer_no_such_segment", blocks.shape,
                        blocks.dtype)
            if method == "gather_blocks":
                return blocks
            raise AssertionError(method)

    proxy = PeerNodeProxy(PeerInfo("PNode:x", "P", 0.4, "tcp://127.0.0.1:1"),
                          migrating_stash={})
    proxy._same_host = True
    rpc = FakeRpc()
    proxy._client = rpc

    got = asyncio.run(proxy.gather_blocks(True, [0, 1]))
    np.testing.assert_array_equal(got, blocks)
    assert proxy._same_host is False          # demoted permanently
    assert rpc.calls == ["gather_blocks_shm", "gather_blocks"]
    # next pull goes straight to RPC
    got2 = asyncio.run(proxy.gather_blocks(True, [0]))
    np.testing.assert_array_equal(got2, blocks)
    assert rpc.calls[-1] == "gather_blocks"


def test_spawned_node_respawns_after_death():
    """Kill a spawned node mid-cluster: the health loop detects it,
    terminates its in-flight requests, respawns it once (reference: Ray
    max_restarts=1), and subsequent requests succeed on the restarted
    node."""
    from hydrainfer_tpu.cluster.cluster import NodeSpec
    from hydrainfer_tpu.cluster.process_node import (ProcessCluster,
                                                     ProcessClusterConfig)

    def node_config():
        cfg = NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=128, n_image_blocks=16)
        cfg.model.name = "fake"
        cfg.model.dtype = "float32"
        return cfg

    async def serve_one(cluster, rid):
        proc = LogOutputTokenProcessor()
        await cluster.add_request(
            Request(request_id=rid, prompt=f"respawn check {rid}",
                    sampling_params=SamplingParameters(max_tokens=5,
                                                       ignore_eos=True)),
            RequestProcessParameters(output_token_processors=[proc]))
        deadline = time.perf_counter() + 120
        while not proc.finished:
            assert time.perf_counter() < deadline, "request stalled"
            await asyncio.sleep(0.1)
        return proc

    async def run():
        cluster = ProcessCluster(ProcessClusterConfig(
            nodes=[NodeSpec("PD", 1)], node=node_config(), platform="cpu",
            health_interval_s=0.3, health_strikes=1))
        try:
            await cluster.start()
            first = await serve_one(cluster, "before")
            assert first.finished and len(first.token_ids) == 5

            h = cluster.handles[0]
            h.proc.kill()
            deadline = time.perf_counter() + 120
            while not (h.alive and h.respawns == 1):
                assert time.perf_counter() < deadline, (
                    f"respawn never completed (alive={h.alive}, "
                    f"respawns={h.respawns})")
                await asyncio.sleep(0.2)

            second = await serve_one(cluster, "after")
            assert second.finished and len(second.token_ids) == 5
            assert not second.terminated
        finally:
            await cluster.stop()

    asyncio.run(run())
