"""End-to-end API server tests: real aiohttp server + cluster + fake model,
exercised over a real socket (stream + non-stream + image + health)."""
import asyncio
import base64
import io
import json
import socket

import numpy as np
import pytest
from PIL import Image

import aiohttp

from hydrainfer_tpu.cluster.cluster import Cluster, ClusterConfig, NodeSpec
from hydrainfer_tpu.cluster.node import NodeConfig
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.api_server import APIServer, APIServerConfig
from hydrainfer_tpu.models.fake import FakeConfig, FakeModelFactory


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def build_stack(cluster_spec=None):
    cfg = ClusterConfig(
        nodes=cluster_spec or [NodeSpec("EPD", 1)],
        node=NodeConfig(
            batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
            request_processor=RequestProcessorConfig(
                num_request_process_workers=1, block_size=4),
            kv_block_size=4, n_kv_blocks=256, n_image_blocks=16))
    cfg.node.model.dtype = "float32"
    factory = FakeModelFactory(fake_config=FakeConfig())
    cluster = Cluster(cfg, model_factory=factory)
    port = free_port()
    server = APIServer(APIServerConfig(port=port), factory.getTokenizer(),
                       image_token="<image>")
    server.register_observer(cluster)
    return cluster, server, port


async def run_with_server(test_body, cluster_spec=None):
    cluster, server, port = build_stack(cluster_spec)
    await cluster.start()
    runner = await server.start()
    try:
        async with aiohttp.ClientSession() as session:
            await test_body(session, f"http://127.0.0.1:{port}")
    finally:
        await cluster.stop()
        await runner.cleanup()


def test_health():
    async def body(session, base):
        async with session.get(f"{base}/health") as resp:
            assert resp.status == 200
            assert await resp.text() == "ok"
    asyncio.run(run_with_server(body))


def test_chat_completion_non_stream():
    async def body(session, base):
        payload = {
            "messages": [{"role": "user", "content": "hello there"}],
            "max_tokens": 6, "ignore_eos": True}
        async with session.post(f"{base}/v1/chat/completions",
                                json=payload) as resp:
            assert resp.status == 200
            data = await resp.json()
            assert data["object"] == "chat.completion"
            assert data["choices"][0]["message"]["role"] == "assistant"
            assert len(data["choices"][0]["message"]["content"]) > 0
            assert data["usage"]["completion_tokens"] == 6
    asyncio.run(run_with_server(body))


def test_chat_completion_stream():
    async def body(session, base):
        payload = {
            "messages": [{"role": "user", "content": "stream me"}],
            "max_tokens": 5, "stream": True, "ignore_eos": True}
        async with session.post(f"{base}/v1/chat/completions",
                                json=payload) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/event-stream")
            chunks, done = [], False
            async for line in resp.content:
                line = line.decode().strip()
                if not line.startswith("data: "):
                    continue
                data = line[len("data: "):]
                if data == "[DONE]":
                    done = True
                    break
                chunks.append(json.loads(data))
            assert done
            deltas = [c["choices"][0]["delta"].get("content") or ""
                      for c in chunks]
            assert sum(1 for d in deltas if d) == 5
            assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    asyncio.run(run_with_server(body))


def test_chat_completion_with_image():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    async def body(session, base):
        payload = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "describe"},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
            ]}],
            "max_tokens": 4, "ignore_eos": True}
        async with session.post(f"{base}/v1/chat/completions",
                                json=payload) as resp:
            assert resp.status == 200
            data = await resp.json()
            assert len(data["choices"][0]["message"]["content"]) > 0
    asyncio.run(run_with_server(body))


def test_completions_endpoint():
    async def body(session, base):
        async with session.post(f"{base}/v1/completions", json={
                "prompt": "once upon", "max_tokens": 3,
                "ignore_eos": True}) as resp:
            assert resp.status == 200
            data = await resp.json()
            assert data["object"] == "text_completion"
            assert len(data["choices"][0]["text"]) > 0
    asyncio.run(run_with_server(body))


def test_disaggregated_cluster_serving():
    """Requests served across an EP + D split through the HTTP surface."""
    async def body(session, base):
        payload = {"messages": [{"role": "user", "content": "hi"}],
                   "max_tokens": 4, "ignore_eos": True}
        results = await asyncio.gather(*[
            session.post(f"{base}/v1/chat/completions", json=payload)
            for _ in range(4)])
        for resp in results:
            assert resp.status == 200
            data = await resp.json()
            assert len(data["choices"][0]["message"]["content"]) > 0
    asyncio.run(run_with_server(body, cluster_spec=[NodeSpec("EP", 1),
                                                    NodeSpec("D", 1)]))


def test_api_server_over_process_cluster():
    """EntryPoint with deployment=process: the API server fronts nodes in
    separate OS processes (the reference's actor-per-device shape) — tokens
    stream back over the ZMQ collector, migration crosses the P→D process
    boundary."""
    from hydrainfer_tpu.entrypoint.entrypoint import EntryPoint, EntryPointConfig

    cfg = EntryPointConfig()
    cfg.api_server.port = free_port()
    cfg.cluster.deployment = "process"
    cfg.cluster.platform = "cpu"
    cfg.cluster.nodes = [NodeSpec("P", 1), NodeSpec("D", 1)]
    cfg.cluster.node = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=8),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=256, n_image_blocks=16)
    cfg.cluster.node.model.name = "fake"
    cfg.cluster.node.model.dtype = "float32"
    entry = EntryPoint(cfg)
    assert len(entry.cluster.handles) == 2

    async def body():
        await entry.cluster.start()
        runner = await entry.api_server.start()
        base = f"http://127.0.0.1:{cfg.api_server.port}"
        try:
            async with aiohttp.ClientSession() as session:
                async with session.get(f"{base}/health") as resp:
                    assert resp.status == 200
                payload = {"messages": [{"role": "user", "content": "hi you"}],
                           "max_tokens": 5, "ignore_eos": True}
                async with session.post(f"{base}/v1/chat/completions",
                                        json=payload) as resp:
                    assert resp.status == 200
                    data = await resp.json()
                    assert len(data["choices"][0]["message"]["content"]) > 0
                payload["stream"] = True
                async with session.post(f"{base}/v1/chat/completions",
                                        json=payload) as resp:
                    assert resp.status == 200
                    chunks = 0
                    async for line in resp.content:
                        if line.startswith(b"data:") and b"[DONE]" not in line:
                            chunks += 1
                    assert chunks >= 5
        finally:
            await entry.cluster.stop()
            await runner.cleanup()

    asyncio.run(body())
