"""Multi-process EPD serving: one OS process per node.

This is the deployment shape of the reference cluster — one Ray actor per
GPU, spanning hosts (reference: hydrainfer/cluster/cluster.py:123-141,
epdnode.py:189-209) — rebuilt without Ray: each node runs in its own
process around the SAME `AsyncEPDNode` (same engine, schedulers, caches),
served over the ZMQ pickle-RPC plane (`cluster/rpc.py`). Because every
address is tcp://host:port, the exact same code spans hosts over DCN;
within one host it is plain loopback.

Planes:
  control   — parent → node: add_request/start/stop; node → node:
              migrate hand-off + free (the 4-step protocol's steps 1+4).
  cache data— destination pulls blocks from the source with a
              `gather_blocks` RPC (numpy payload) and lands them on its own
              device via scatter; replaces the reference's cross-actor NCCL
              isend/irecv (memory/communication.py:50-123).
  tokens    — every node PUSHes (request_id, token_id, is_last) to the
              parent collector which fans out to the request's registered
              output-token processors (reference: the ZMQ sentinel stream,
              engine/executor.py:181-190).
"""
import asyncio
import copy
import dataclasses
import multiprocessing
import os
import pickle
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..engine.output_token_processor import OutputTokenProcessor
from ..engine.request_processor import RequestProcessParameters
from ..request import Request
from ..utils.logger import getLogger
from ..utils.socket_utils import find_free_port
from .migrate import MigrateGraphBuilder, NodeType
from .node import NodeConfig
from .rpc import RpcClient, RpcServer, dumps, loads

logger = getLogger(__name__)


# ---------------- wire helpers ----------------

def rcb_to_payload(rcb) -> bytes:
    """Serialize an RCB for cross-process migration.

    Process-local state is stripped and re-created on the destination:
    output processors (sockets/callbacks), the device token-table slot, and
    per-instruction device/peer references — executed ImageEmbeds still hold
    their pixel_values (a jax.Array) and executed PullCaches their src_node
    (a live node or RPC proxy); neither crosses the wire. Un-executed
    ImageEmbed payloads are converted to numpy (they must survive the hop).
    """
    import numpy as np

    mutations = []  # (obj, attr, original)

    def stash(obj, attr, new):
        mutations.append((obj, attr, getattr(obj, attr)))
        setattr(obj, attr, new)

    head = rcb.instructions.curr
    while head is not None and head.prev is not None:
        head = head.prev
    node, executed = head, True
    while node is not None:
        if node is rcb.instructions.curr:
            executed = False
        pv = getattr(node, "pixel_values", None)
        if pv is not None and not isinstance(pv, np.ndarray):
            stash(node, "pixel_values", None if executed else np.asarray(pv))
        if getattr(node, "src_node", None) is not None:
            stash(node, "src_node", None)
        node = node.next

    procs, rcb.output_token_processors = rcb.output_token_processors, []
    slot, rcb.token_slot = rcb.token_slot, -1
    try:
        return dumps(rcb)
    finally:
        rcb.output_token_processors = procs
        rcb.token_slot = slot
        for obj, attr, orig in mutations:
            setattr(obj, attr, orig)


class TokenPushProcessor(OutputTokenProcessor):
    """Node-side processor streaming (request_id, token_id, is_last) to the
    parent collector. One PUSH socket per node process."""

    def __init__(self, request_id, send_sock):
        self.request_id = request_id
        self.send = send_sock

    def append_token_id(self, token_id, is_last_token=False):
        self.send.send_pyobj((self.request_id, int(token_id), bool(is_last_token)))


@dataclass
class PeerInfo:
    name: str                   # control-plane name (AsyncEPDNode.name)
    node_type: str
    tpot_slo: float
    addr: str                   # tcp://host:port of the peer's RpcServer


class PeerNodeProxy:
    """Migrate-graph edge to a node in ANOTHER process. Implements exactly
    the surface `AsyncEPDNode` migration code touches on a peer."""

    is_remote = True

    def __init__(self, info: PeerInfo, migrating_stash: Dict):
        self.info = info
        self.name = info.name
        self._stash = migrating_stash
        self._client: Optional[RpcClient] = None

    def _rpc(self) -> RpcClient:
        if self._client is None:
            self._client = RpcClient(self.info.addr)
        return self._client

    # step 1: source hands the RCB over (we ARE the source here)
    async def migrate(self, src_node, rcb) -> None:
        payload = rcb_to_payload(rcb)
        # keep the source's block tables alive until the peer pulled them
        self._stash[rcb.request_id] = rcb
        try:
            await self._rpc().call("migrate", src_node.name, payload)
        except Exception:
            self._stash.pop(rcb.request_id, None)
            raise

    # step 3 data plane: destination pulls blocks from us — called on the
    # DESTINATION's proxy of the source
    async def gather_blocks(self, is_kv: bool, block_table: List[int]):
        return await self._rpc().call("gather_blocks", is_kv, block_table)

    # step 4: destination tells the source to free the migrated request
    async def free_migrate_request(self, rcb) -> None:
        await self._rpc().call("free_migrate", rcb.request_id)

    def close(self) -> None:
        if self._client is not None:
            self._client.close()


@dataclass
class NodeBoot:
    """Everything a child process needs to become a node."""
    name: str                    # short name, e.g. "p0"
    node_type: str
    config: NodeConfig
    rpc_host: str
    rpc_port: int
    token_addr: str              # parent PULL for the token stream
    peers: List[PeerInfo] = field(default_factory=list)
    tpot_slo: float = 0.4
    platform: Optional[str] = None       # e.g. "cpu" for tests
    device_index: int = 0
    xla_flags: Optional[str] = None


class NodeWorker:
    """Child-process server wrapping one AsyncEPDNode."""

    def __init__(self, boot: NodeBoot):
        self.boot = boot
        # late imports: jax backend choice must happen first (node_worker_main)
        from .node import AsyncEPDNode, NodeContext
        import jax
        devices = jax.devices()
        device = devices[boot.device_index % len(devices)]
        self.node = AsyncEPDNode(boot.config, NodeContext(
            name=boot.name, node_type=NodeType(boot.node_type), device=device))
        self.node.init(self._model_factory())
        self.migrating: Dict = {}      # request_id -> stashed source RCB
        import zmq
        self.token_sock = zmq.Context.instance().socket(zmq.PUSH)
        self.token_sock.connect(boot.token_addr)
        self.tokenizer = self.node.model_factory.getTokenizer()
        self.server: Optional[RpcServer] = None
        self._peer_proxies: Dict[str, PeerNodeProxy] = {}

    def _model_factory(self):
        return None  # node builds from config.model (fake or checkpoint path)

    def wire_peers(self, peers: List[PeerInfo]) -> None:
        builder = MigrateGraphBuilder()
        builder.add_node(self.node.name, self.node.context.node_type,
                         self.node, tpot_slo=self.boot.tpot_slo)
        for p in peers:
            proxy = PeerNodeProxy(p, self.migrating)
            self._peer_proxies[p.name] = proxy
            builder.add_node(p.name, NodeType(p.node_type), proxy,
                             tpot_slo=p.tpot_slo)
        self.node.update_migrate_graph(builder.build_graph())

    def _src_proxy(self, src_name: str) -> PeerNodeProxy:
        proxy = self._peer_proxies.get(src_name)
        if proxy is None:
            raise KeyError(f"unknown migration source {src_name}")
        return proxy

    async def handle(self, method: str, *args):
        if method == "add_request":
            request, = args
            params = RequestProcessParameters(output_token_processors=[
                TokenPushProcessor(request.request_id, self.token_sock)])
            await self.node.add_request(request, params)
            return None
        if method == "migrate":
            src_name, payload = args
            rcb = loads(payload)
            rcb.output_token_processors = [
                TokenPushProcessor(rcb.request_id, self.token_sock)]
            await self.node.migrate(self._src_proxy(src_name), rcb)
            return None
        if method == "gather_blocks":
            is_kv, block_table = args
            mgr = (self.node.kv_cache_manager if is_kv
                   else self.node.image_cache_manager)
            import numpy as np
            return np.asarray(mgr.gather_blocks(block_table))
        if method == "free_migrate":
            request_id, = args
            old = self.migrating.pop(request_id, None)
            if old is not None:
                await self.node.free_migrate_request(old)
            return None
        if method == "start":
            await self.node.start()
            return None
        if method == "stop":
            await self.node.stop()
            asyncio.get_event_loop().call_later(0.2, self._shutdown)
            return None
        if method == "ping":
            return self.node.name
        if method == "metrics":
            from .cluster import node_metrics
            return {"name": self.node.name, **node_metrics(self.node)}
        raise ValueError(f"unknown rpc method {method}")

    def _shutdown(self) -> None:
        for p in self._peer_proxies.values():
            p.close()
        if self.server is not None:
            self.server.close()
        asyncio.get_event_loop().stop()

    async def serve(self) -> None:
        self.server = RpcServer(self.handle, host=self.boot.rpc_host,
                                port=self.boot.rpc_port)
        self.server.start()
        self.wire_peers(self.boot.peers)
        logger.info(f"node worker {self.node.name} serving at {self.server.addr}")


def node_worker_main(boot: NodeBoot) -> None:
    """Child-process entry point (spawn-safe: module-level function)."""
    if boot.xla_flags:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " "
                                   + boot.xla_flags)
    import jax
    if boot.platform:
        jax.config.update("jax_platforms", boot.platform)

    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    worker = NodeWorker(boot)
    loop.run_until_complete(worker.serve())
    try:
        loop.run_forever()
    finally:
        loop.close()


# ---------------- parent-side cluster ----------------

@dataclass
class ProcessClusterConfig:
    cluster_type: str = "auto"
    nodes: List = field(default_factory=list)           # List[NodeSpec]
    node: NodeConfig = field(default_factory=NodeConfig)
    host: str = "127.0.0.1"
    platform: Optional[str] = None      # force child jax platform (tests: cpu)
    xla_flags: Optional[str] = None
    start_timeout_s: float = 120.0


class NodeHandle:
    """Parent's view of one child node process."""

    def __init__(self, name: str, node_type: NodeType, addr: str,
                 proc: multiprocessing.Process):
        self.name = name
        self.node_type = node_type
        self.addr = addr
        self.proc = proc
        self.client = RpcClient(addr)


class ProcessCluster:
    """Data-parallel control plane over node processes. Same request-entry
    contract as `cluster.Cluster` (RequestObserver: add_request), with nodes
    behind a process boundary (reference deployment shape: cluster.py:123-141).
    """

    def __init__(self, config: ProcessClusterConfig):
        from .cluster import (NodeSpec, resolve_cluster_topology,
                              spec_node_config)
        self.config = config
        specs = config.nodes or resolve_cluster_topology(config.cluster_type, 1)

        # token collector (PULL) — children connect and PUSH
        import zmq
        import zmq.asyncio
        self._zctx = zmq.asyncio.Context.instance()
        self.token_sock = self._zctx.socket(zmq.PULL)
        token_port = self.token_sock.bind_to_random_port(f"tcp://{config.host}")
        token_addr = f"tcp://{config.host}:{token_port}"

        # pre-assign names/ports so every boot can carry the full peer table
        boots: List[NodeBoot] = []
        name_counts: Dict[str, int] = {}
        for i, spec in enumerate(specs):
            for _ in range(spec.n_replicas):
                idx = name_counts.get(spec.node_type, 0)
                name_counts[spec.node_type] = idx + 1
                boots.append(NodeBoot(
                    name=f"{spec.node_type.lower()}{idx}",
                    node_type=spec.node_type,
                    config=spec_node_config(config.node, spec),
                    rpc_host=config.host,
                    rpc_port=find_free_port(),
                    token_addr=token_addr,
                    tpot_slo=spec.tpot_slo,
                    platform=config.platform,
                    xla_flags=config.xla_flags,
                    device_index=len(boots)))
        infos = [PeerInfo(name=f"{NodeType(b.node_type)}Node:{b.name}",
                          node_type=b.node_type, tpot_slo=b.tpot_slo,
                          addr=f"tcp://{b.rpc_host}:{b.rpc_port}")
                 for b in boots]
        for b, info in zip(boots, infos):
            b.peers = [p for p in infos if p.name != info.name]

        ctx = multiprocessing.get_context("spawn")
        self.handles: List[NodeHandle] = []
        for b, info in zip(boots, infos):
            proc = ctx.Process(target=node_worker_main, args=(b,),
                               name=info.name, daemon=True)
            proc.start()
            self.handles.append(NodeHandle(info.name, NodeType(b.node_type),
                                           info.addr, proc))

        self._procs_by_request: Dict = {}
        self._collector_task = None
        self._enodes = [h for h in self.handles if h.node_type.can_encode]
        self._pnodes = [h for h in self.handles if h.node_type.can_prefill]
        assert self._pnodes, "cluster has no prefill-capable node"
        self._rr = {"e": 0, "p": 0}

    async def wait_ready(self) -> None:
        deadline = time.perf_counter() + self.config.start_timeout_s
        for h in self.handles:
            while True:
                try:
                    await h.client.call("ping", timeout=2.0)
                    break
                except Exception:
                    if not h.proc.is_alive():
                        raise RuntimeError(f"node process {h.name} died at startup")
                    if time.perf_counter() > deadline:
                        raise TimeoutError(f"node {h.name} not ready")
                    await asyncio.sleep(0.2)

    async def start(self) -> None:
        await self.wait_ready()
        for h in self.handles:
            await h.client.call("start")
        if self._collector_task is None:
            self._collector_task = asyncio.ensure_future(self._collect_tokens())

    async def _collect_tokens(self) -> None:
        while True:
            request_id, token_id, is_last = await self.token_sock.recv_pyobj()
            procs = self._procs_by_request.get(request_id, ())
            for proc in procs:
                proc.append_token_id(token_id, is_last)
            if is_last:
                self._procs_by_request.pop(request_id, None)

    async def add_request(self, request: Request,
                          params: RequestProcessParameters) -> None:
        self._procs_by_request[request.request_id] = \
            list(params.output_token_processors)
        has_image = request.image is not None or request.image_base64 is not None
        pool, key = ((self._enodes, "e") if has_image and self._enodes
                     else (self._pnodes, "p"))
        h = pool[self._rr[key] % len(pool)]
        self._rr[key] += 1
        await h.client.call("add_request", request)

    async def metrics_async(self) -> dict:
        """Per-node metrics over the RPC plane — the process-deployment
        analogue of Cluster.metrics() (same row schema via node_metrics)."""
        out = {}
        for h in self.handles:
            try:
                row = await h.client.call("metrics", timeout=5.0)
                out[row.pop("name", h.name)] = row
            except Exception:
                out[h.name] = {"error": "unreachable"}
        return out

    async def stop(self) -> None:
        if self._collector_task is not None:
            self._collector_task.cancel()
            self._collector_task = None
        for h in self.handles:
            try:
                await h.client.call("stop", timeout=5.0)
            except Exception:
                pass
        for h in self.handles:
            h.proc.join(timeout=5.0)
            if h.proc.is_alive():
                h.proc.terminate()
                h.proc.join(timeout=5.0)
            h.client.close()
        self.token_sock.close(linger=0)
