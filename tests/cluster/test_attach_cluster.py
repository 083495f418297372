"""Multi-host deployment path: nodes launched STANDALONE (their own
`python -m hydrainfer_tpu.cluster.process_node` invocations, as an operator
would start them on separate hosts) and a parent ProcessCluster that
ATTACHES by address instead of spawning — peers and the token plane are
wired over RPC at cluster start. Covers the reference's span-hosts
deployment shape (reference: cluster/cluster.py:123-141) minus the
physical second machine: every plane is tcp, so host-spanning is an
address change.

Also covers mid-flight node-death detection: a killed node's in-flight
requests are terminated by the parent health monitor instead of hanging.
"""
import asyncio
import os
import signal
import subprocess
import sys
import time

import pytest

from hydrainfer_tpu.cluster.cluster import NodeSpec
from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.cluster.process_node import (ProcessCluster,
                                                 ProcessClusterConfig)
from hydrainfer_tpu.engine.output_token_processor import LogOutputTokenProcessor
from hydrainfer_tpu.engine.request_processor import RequestProcessParameters
from hydrainfer_tpu.request import Request, SamplingParameters
from hydrainfer_tpu.utils.socket_utils import find_free_port

FAKE_OVERRIDES = [
    "model.name=fake", "model.dtype=float32",
    "kv_block_size=4", "n_kv_blocks=128", "n_image_blocks=16",
    "request_processor.block_size=4",
    "request_processor.num_request_process_workers=1",
    "batch_scheduler.max_running_requests=8",
]


def launch_standalone(name: str, node_type: str, port: int):
    """Start a node exactly as an operator would on a remote host."""
    cmd = [sys.executable, "-m", "hydrainfer_tpu.cluster.process_node",
           "--name", name, "--node-type", node_type,
           "--host", "127.0.0.1", "--port", str(port),
           "--platform", "cpu"] + FAKE_OVERRIDES
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(cmd, env=env)


def text_requests(n, max_tokens=8):
    return [Request(request_id=f"r{i}",
                    prompt=f"hello world request number {i} padded text",
                    sampling_params=SamplingParameters(max_tokens=max_tokens,
                                                       ignore_eos=True))
            for i in range(n)]


async def serve_attached(specs, requests, timeout_s=120, **cluster_kw):
    cluster = ProcessCluster(ProcessClusterConfig(
        nodes=specs, node=NodeConfig(), platform="cpu", **cluster_kw))
    procs = [LogOutputTokenProcessor() for _ in requests]
    try:
        await cluster.start()
        for req, proc in zip(requests, procs):
            await cluster.add_request(req, RequestProcessParameters(
                output_token_processors=[proc]))
        deadline = time.perf_counter() + timeout_s
        while not all(p.finished for p in procs):
            assert time.perf_counter() < deadline, (
                f"timed out; counts={[len(p.token_ids) for p in procs]}")
            await asyncio.sleep(0.1)
    finally:
        await cluster.stop()
    return procs, cluster


def test_attach_two_standalone_nodes():
    """P and D nodes launched as independent OS commands; the parent
    attaches by tcp address and serves with cross-process PD migration."""
    p_port, d_port = find_free_port(), find_free_port()
    p_proc = launch_standalone("p0", "P", p_port)
    d_proc = launch_standalone("d0", "D", d_port)
    try:
        specs = [NodeSpec("P", attach_addr=f"tcp://127.0.0.1:{p_port}"),
                 NodeSpec("D", attach_addr=f"tcp://127.0.0.1:{d_port}")]
        procs, _ = asyncio.run(serve_attached(specs, text_requests(4)))
        for p in procs:
            assert p.finished and len(p.token_ids) == 8
    finally:
        for sp in (p_proc, d_proc):
            sp.terminate()
            try:
                sp.wait(timeout=10)
            except subprocess.TimeoutExpired:
                sp.kill()
    # cluster.stop() asked the standalone nodes to shut down; terminate()
    # above is belt-and-braces for failures


def test_attach_mixed_with_spawned():
    """One attached node + one spawned child in the same cluster: both
    appear in each other's migrate graph (wired over RPC post-boot)."""
    d_port = find_free_port()
    d_proc = launch_standalone("d0", "D", d_port)
    spawn_cfg = {"model": {"name": "fake", "dtype": "float32"},
                 "kv_block_size": 4, "n_kv_blocks": 128,
                 "n_image_blocks": 16,
                 "request_processor": {"block_size": 4,
                                       "num_request_process_workers": 1},
                 "batch_scheduler": {"max_running_requests": 8}}
    try:
        specs = [NodeSpec("P", 1, node=spawn_cfg),
                 NodeSpec("D", attach_addr=f"tcp://127.0.0.1:{d_port}")]
        procs, _ = asyncio.run(serve_attached(specs, text_requests(3)))
        for p in procs:
            assert p.finished and len(p.token_ids) == 8
    finally:
        d_proc.terminate()
        try:
            d_proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            d_proc.kill()


def test_mid_flight_node_death_terminates_requests():
    """Kill a node while requests are in flight: the parent health monitor
    must terminate those requests' streams (no hang until RPC timeout)."""

    async def run():
        cluster = ProcessCluster(ProcessClusterConfig(
            nodes=[NodeSpec("PD", 1, node={
                "model": {"name": "fake", "dtype": "float32"},
                "kv_block_size": 4, "n_kv_blocks": 512, "n_image_blocks": 16,
                # slow the step loop so the generations are still in
                # flight when the node is killed
                "step_interval_s": 0.02,
                "request_processor": {"block_size": 4,
                                      "num_request_process_workers": 1},
                "batch_scheduler": {"max_running_requests": 8}})],
            node=NodeConfig(), platform="cpu",
            health_interval_s=0.3, health_strikes=2))
        procs = [LogOutputTokenProcessor() for _ in range(2)]
        try:
            await cluster.start()
            # long generations so they are still running when we kill
            for req, proc in zip(text_requests(2, max_tokens=1000), procs):
                await cluster.add_request(req, RequestProcessParameters(
                    output_token_processors=[proc]))
            while not any(p.token_ids for p in procs):
                await asyncio.sleep(0.05)
            # kill the only node, hard
            h = cluster.handles[0]
            os.kill(h.proc.pid, signal.SIGKILL)
            deadline = time.perf_counter() + 15
            while not all(p.finished for p in procs):
                assert time.perf_counter() < deadline, \
                    "health monitor did not terminate in-flight requests"
                await asyncio.sleep(0.1)
            assert all(getattr(p, "terminated", False) for p in procs)
            assert not h.alive
        finally:
            await cluster.stop()

    asyncio.run(run())
