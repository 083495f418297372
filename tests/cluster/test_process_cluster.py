"""Multi-process serving: nodes in separate OS processes (the reference's
one-actor-per-GPU deployment shape, reference: cluster/cluster.py:123-141),
with PD/EPD migration crossing the process boundary over the ZMQ RPC plane
and tokens streaming back to the parent collector."""
import asyncio
import time

import numpy as np
import pytest
from PIL import Image

from hydrainfer_tpu.cluster.cluster import NodeSpec
from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.cluster.process_node import (ProcessCluster,
                                                 ProcessClusterConfig)
from hydrainfer_tpu.engine.output_token_processor import LogOutputTokenProcessor
from hydrainfer_tpu.engine.request_processor import (RequestProcessorConfig,
                                                     RequestProcessParameters)
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.request import Request, SamplingParameters


def make_node_config() -> NodeConfig:
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=128, n_image_blocks=16)
    cfg.model.name = "fake"      # child builds the weightless factory itself
    cfg.model.dtype = "float32"
    return cfg


async def serve(specs, requests, timeout_s=120):
    cluster = ProcessCluster(ProcessClusterConfig(
        nodes=specs, node=make_node_config(), platform="cpu"))
    procs = [LogOutputTokenProcessor() for _ in requests]
    try:
        await cluster.start()
        for req, proc in zip(requests, procs):
            await cluster.add_request(req, RequestProcessParameters(
                output_token_processors=[proc]))
        deadline = time.perf_counter() + timeout_s
        while not all(p.finished for p in procs):
            assert time.perf_counter() < deadline, (
                f"timed out; finished={[p.finished for p in procs]} "
                f"counts={[len(p.token_ids) for p in procs]}")
            await asyncio.sleep(0.1)
    finally:
        await cluster.stop()
    return procs


def text_requests(n, max_tokens=8):
    return [Request(request_id=f"r{i}",
                    prompt=f"hello world request number {i} padded text",
                    sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                       ignore_eos=True))
            for i in range(n)]


def test_pd_two_processes():
    """P node + D node in separate processes: prefill on one, PD migration
    over RPC (block pull across the process boundary), decode on the other."""
    procs = asyncio.run(serve([NodeSpec("P", 1), NodeSpec("D", 1)],
                              text_requests(4)))
    for p in procs:
        assert p.finished and len(p.token_ids) == 8


def test_epd_three_processes():
    """E, P, D nodes in three processes; an image request flows E -> P -> D
    with image-cache and kv-cache blocks migrating between processes."""
    rng = np.random.default_rng(0)
    reqs = text_requests(2)
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    reqs.append(Request(request_id="img0", prompt="<image> describe this",
                        image=img,
                        sampling_params=SamplingParameters(max_tokens=8,
                                                           ignore_eos=True)))
    procs = asyncio.run(serve(
        [NodeSpec("E", 1), NodeSpec("P", 1), NodeSpec("D", 1)], reqs))
    for p in procs:
        assert p.finished and len(p.token_ids) == 8


def test_same_host_pull_uses_shared_memory():
    """Same-host cross-process block pulls must ride the POSIX shared-memory
    data plane (one mmap copy each side), not the pickled-numpy RPC path —
    and the segment count must reach the worker's metrics row."""

    async def run():
        cluster = ProcessCluster(ProcessClusterConfig(
            nodes=[NodeSpec("P", 1), NodeSpec("D", 1)],
            node=make_node_config(), platform="cpu"))
        procs = [LogOutputTokenProcessor() for _ in range(3)]
        try:
            await cluster.start()
            for req, proc in zip(text_requests(3), procs):
                await cluster.add_request(req, RequestProcessParameters(
                    output_token_processors=[proc]))
            deadline = time.perf_counter() + 120
            while not all(p.finished for p in procs):
                assert time.perf_counter() < deadline, "timed out"
                await asyncio.sleep(0.1)
            metrics = await cluster.metrics_async()
        finally:
            await cluster.stop()
        return procs, metrics

    procs, metrics = asyncio.run(run())
    assert all(p.finished and len(p.token_ids) == 8 for p in procs)
    d_row = next(v for k, v in metrics.items() if k.startswith("DNode"))
    # one KV pull per migrated request, all over shm (same host)
    assert d_row["migration_pulls"] == 3
    assert d_row["migration_shm_pulls"] == 3


def test_cross_host_pull_falls_back_to_rpc(monkeypatch):
    """With the shm plane unavailable (cross-host, or disabled), pulls fall
    back to the pickled-numpy RPC path and serving still completes."""
    monkeypatch.setenv("HYDRAINFER_DISABLE_SHM_PULL", "1")

    async def run():
        cluster = ProcessCluster(ProcessClusterConfig(
            nodes=[NodeSpec("P", 1), NodeSpec("D", 1)],
            node=make_node_config(), platform="cpu"))
        procs = [LogOutputTokenProcessor() for _ in range(2)]
        try:
            await cluster.start()
            for req, proc in zip(text_requests(2), procs):
                await cluster.add_request(req, RequestProcessParameters(
                    output_token_processors=[proc]))
            deadline = time.perf_counter() + 120
            while not all(p.finished for p in procs):
                assert time.perf_counter() < deadline, "timed out"
                await asyncio.sleep(0.1)
            metrics = await cluster.metrics_async()
        finally:
            await cluster.stop()
        return procs, metrics

    procs, metrics = asyncio.run(run())
    assert all(p.finished and len(p.token_ids) == 8 for p in procs)
    d_row = next(v for k, v in metrics.items() if k.startswith("DNode"))
    assert d_row["migration_pulls"] == 2
    assert "migration_shm_pulls" not in d_row


def test_process_cluster_matches_inprocess_tokens():
    """The same fake-model request through a process-boundary node and an
    in-process node must produce the identical token stream. One request:
    the fake LM seeds on batch content, so batch composition must be
    deterministic (concurrent requests would make it timing-dependent)."""
    reqs = text_requests(1, max_tokens=6)
    procs = asyncio.run(serve([NodeSpec("PD", 1)], reqs))

    # in-process oracle: OfflineEngine over one PD node with the same config
    from hydrainfer_tpu.entrypoint.offline import OfflineEngine
    engine = OfflineEngine(make_node_config(), node_type="PD")
    outs = engine.generate(text_requests(1, max_tokens=6), timeout_s=60)
    for p, o in zip(procs, outs):
        assert p.token_ids == list(o.output_token_ids)
