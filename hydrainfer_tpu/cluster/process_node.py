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
  cache data— destination pulls blocks from the source: same-host peers
              hand the payload over POSIX shared memory (gather_blocks_shm,
              one mmap copy each side — the reference's intranode CUDA-IPC
              analogue), cross-host peers over the pickled-numpy RPC (DCN);
              either way the destination lands them on its own device via
              scatter, and the pull runs as a background task overlapped
              with decode (replaces the reference's cross-actor NCCL
              isend/irecv + migrate-stream overlap,
              memory/communication.py:50-123).
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


def _host_id() -> str:
    """Boot-stable machine identity: every process on one host sees the
    same value, so two nodes compare it to decide whether the shared-memory
    cache data plane is available between them."""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            return f.read().strip()
    except OSError:
        import socket
        return socket.gethostname()


def _shm_untrack(shm) -> None:
    """Detach the CREATOR's resource_tracker from a segment whose ownership
    crosses processes (the source creates it, the destination unlinks it
    after copying) — the per-process tracker cannot model that hand-off and
    would double-unlink at exit with a warning. Only the creating side may
    call this: attaching (create=False) never registers with the tracker,
    so unregistering there sends the tracker process a bogus message it
    logs a KeyError for."""
    from multiprocessing import resource_tracker
    try:
        resource_tracker.unregister(shm._name, "shared_memory")
    except Exception:
        pass


class TokenPushProcessor(OutputTokenProcessor):
    """Node-side processor streaming (request_id, token_id, is_last) to the
    parent collector. One PUSH socket per node process."""

    def __init__(self, request_id, send_sock):
        self.request_id = request_id
        self.send = send_sock

    def append_token_id(self, token_id, is_last_token=False):
        self.send.send_pyobj((self.request_id, int(token_id), bool(is_last_token)))

    def terminate(self):
        # None token_id = abort sentinel: the collector terminates the
        # parent-side processors instead of appending a fabricated token
        self.send.send_pyobj((self.request_id, None, True))


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
        self._same_host: Optional[bool] = None   # resolved on first pull
        self.shm_pulls = 0

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
    # DESTINATION's proxy of the source. Same-host peers hand the payload
    # over POSIX shared memory (one mmap'd copy each side, nothing rides
    # the socket); cross-host peers fall back to the pickled-numpy RPC
    # (DCN path). The reference's equivalents: CUDA-IPC peer copies
    # intranode, NCCL isend/irecv internode (memory/communication.py:23-75).
    async def gather_blocks(self, is_kv: bool, block_table: List[int]):
        if self._same_host is None:
            if os.environ.get("HYDRAINFER_DISABLE_SHM_PULL"):
                self._same_host = False      # operator kill-switch / tests
            else:
                try:
                    self._same_host = (
                        await self._rpc().call("host_id")) == _host_id()
                except Exception:
                    self._same_host = False
        if self._same_host:
            import numpy as np
            from multiprocessing import shared_memory
            name, shape, dtype = await self._rpc().call(
                "gather_blocks_shm", is_kv, block_table)
            try:
                shm = shared_memory.SharedMemory(name=name)
            except (FileNotFoundError, OSError):
                # boot_id matches but /dev/shm is not actually shared (two
                # containers on one kernel): demote this peer to the RPC
                # data plane permanently and ask the source to re-gather —
                # its shm segment leaks one payload, but the pull succeeds
                logger.warning(
                    f"shm attach to {name} from {self.name} failed; peers "
                    "share a boot_id but not /dev/shm — falling back to the "
                    "RPC data plane for this peer")
                self._same_host = False
                return await self._rpc().call("gather_blocks", is_kv,
                                              block_table)
            try:
                blocks = np.array(np.ndarray(shape, dtype, buffer=shm.buf))
            finally:
                shm.close()
                shm.unlink()     # destination owns the segment (see handle)
            self.shm_pulls += 1
            return blocks
        return await self._rpc().call("gather_blocks", is_kv, block_table)

    # step 4: destination tells the source to free the migrated request
    async def free_migrate_request(self, rcb) -> None:
        await self._rpc().call("free_migrate", rcb.request_id)

    def close(self) -> None:
        if self._client is not None:
            self._client.close()


@dataclass
class NodeBoot:
    """Everything a child process needs to become a node.

    `token_addr` and `peers` may be empty at boot: a standalone node
    (launched with `python -m hydrainfer_tpu.cluster.process_node` on any
    host) starts unwired and receives both over RPC (`connect_tokens`,
    `wire_peers`) when a parent cluster attaches to it — the multi-host
    deployment path (reference: one Ray actor per GPU spanning hosts,
    cluster/cluster.py:123-141)."""
    name: str                    # short name, e.g. "p0"
    node_type: str
    config: NodeConfig
    rpc_host: str
    rpc_port: int
    token_addr: str = ""         # parent PULL for the token stream
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
        self._token_addr = None
        if boot.token_addr:
            self.connect_tokens(boot.token_addr)
        self.tokenizer = self.node.model_factory.getTokenizer()
        self.server: Optional[RpcServer] = None
        self._peer_proxies: Dict[str, PeerNodeProxy] = {}

    def _model_factory(self):
        return None  # node builds from config.model (fake or checkpoint path)

    def connect_tokens(self, token_addr: str) -> None:
        """(Re)connect the token PUSH plane to a parent collector. Called at
        boot for spawned children, or over RPC when a parent attaches to a
        standalone node."""
        if self._token_addr == token_addr:
            return
        if self._token_addr:
            self.token_sock.disconnect(self._token_addr)
        self.token_sock.connect(token_addr)
        self._token_addr = token_addr

    def wire_peers(self, peers: List[PeerInfo]) -> None:
        for p in self._peer_proxies.values():
            p.close()
        self._peer_proxies.clear()
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
        if method == "host_id":
            return _host_id()
        if method == "gather_blocks_shm":
            # same-host data plane: land the gathered blocks in a POSIX
            # shared-memory segment and return its name — the destination
            # maps it, copies, and unlinks (ownership transfers with the
            # reply; our handle closes now)
            is_kv, block_table = args
            mgr = (self.node.kv_cache_manager if is_kv
                   else self.node.image_cache_manager)
            import numpy as np
            from multiprocessing import shared_memory
            blocks = np.asarray(mgr.gather_blocks(block_table))
            shm = shared_memory.SharedMemory(create=True, size=blocks.nbytes)
            np.ndarray(blocks.shape, blocks.dtype, buffer=shm.buf)[...] = blocks
            reply = (shm.name, blocks.shape, blocks.dtype)
            _shm_untrack(shm)
            shm.close()
            return reply
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
        if method == "wire_peers":
            peers, = args
            self.wire_peers(peers)
            return None
        if method == "connect_tokens":
            token_addr, = args
            self.connect_tokens(token_addr)
            return None
        if method == "metrics":
            from .cluster import node_metrics
            row = {"name": self.node.name, **node_metrics(self.node)}
            shm_pulls = sum(p.shm_pulls for p in self._peer_proxies.values())
            if shm_pulls:
                row["migration_shm_pulls"] = shm_pulls
            return row
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


def main(argv=None) -> None:
    """Standalone node launcher — the multi-host deployment path.

    Start one node per chip-group on EACH host, then point a parent
    ProcessCluster (or the API server entrypoint) at their addresses with
    `NodeSpec(node_type=..., attach_addr="tcp://host:port")`. The parent
    wires the migrate graph and token plane over RPC at cluster start; all
    planes are plain tcp, so the same command works on one machine or
    across a DCN fabric (reference deployment shape: one Ray actor per GPU
    spanning hosts, cluster/cluster.py:123-141, epdnode.py:189-209).

    Example (2 hosts):
      hostA$ python -m hydrainfer_tpu.cluster.process_node \\
                 --name p0 --node-type P --port 18800 \\
                 --config config/node/p.yaml model.path=/models/llava
      hostB$ python -m hydrainfer_tpu.cluster.process_node \\
                 --name d0 --node-type D --port 18800 \\
                 --config config/node/d.yaml model.path=/models/llava
      parent: ProcessClusterConfig(nodes=[
                  NodeSpec("P", attach_addr="tcp://hostA:18800"),
                  NodeSpec("D", attach_addr="tcp://hostB:18800")],
                  advertise_host=<parent's routable IP>)
    """
    import argparse
    ap = argparse.ArgumentParser(
        description="standalone hydrainfer_tpu node (attach-mode worker)")
    ap.add_argument("--name", required=True, help="short node name, e.g. p0")
    ap.add_argument("--node-type", required=True,
                    help="one of E/P/D/EP/ED/PD/EPD")
    ap.add_argument("--host", default="0.0.0.0", help="RPC bind host")
    ap.add_argument("--port", type=int, required=True, help="RPC bind port")
    ap.add_argument("--config", default=None,
                    help="NodeConfig YAML (config/node/*.yaml)")
    ap.add_argument("--tpot-slo", type=float, default=0.4)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (tests: cpu)")
    ap.add_argument("--device-index", type=int, default=0,
                    help="which local jax device this node owns")
    ap.add_argument("overrides", nargs="*",
                    help="key.path=value NodeConfig overrides")
    args = ap.parse_args(argv)

    from ..config import load_config
    cfg = load_config(NodeConfig, args.config, args.overrides)
    boot = NodeBoot(name=args.name, node_type=args.node_type, config=cfg,
                    rpc_host=args.host, rpc_port=args.port,
                    tpot_slo=args.tpot_slo, platform=args.platform,
                    device_index=args.device_index)
    node_worker_main(boot)


if __name__ == "__main__":
    main()


# ---------------- parent-side cluster ----------------

@dataclass
class ProcessClusterConfig:
    cluster_type: str = "auto"
    nodes: List = field(default_factory=list)           # List[NodeSpec]
    node: NodeConfig = field(default_factory=NodeConfig)
    host: str = "127.0.0.1"
    # address other hosts can reach THIS process at (token plane). Defaults
    # to `host`; set it when `host` binds a wildcard/loopback but attached
    # nodes live on other machines (DCN).
    advertise_host: Optional[str] = None
    platform: Optional[str] = None      # force child jax platform (tests: cpu)
    xla_flags: Optional[str] = None
    start_timeout_s: float = 120.0
    # mid-flight failure detection: ping cadence and strikes before a node
    # is declared dead (its in-flight requests are then terminated instead
    # of hanging until RPC timeout). 0 disables the monitor.
    health_interval_s: float = 2.0
    health_strikes: int = 2
    # how many times a dead SPAWNED node is restarted (reference parity:
    # Ray actors use max_restarts=1, cluster.py:131). Attached nodes are
    # instead re-attached when their address answers pings again.
    max_respawns: int = 1


class NodeHandle:
    """Parent's view of one node process — spawned locally (proc set) or
    attached over tcp (proc None, node launched standalone on any host)."""

    def __init__(self, name: str, node_type: NodeType, addr: str,
                 proc: Optional[multiprocessing.Process],
                 node_type_str: str = "", tpot_slo: float = 0.4,
                 boot: Optional["NodeBoot"] = None):
        self.name = name            # full control name, e.g. "PDNode:p0"
        self.node_type = node_type
        self.node_type_str = node_type_str or str(node_type)
        self.tpot_slo = tpot_slo
        self.addr = addr
        self.proc = proc
        self.client = RpcClient(addr)
        self.alive = True
        self.boot = boot            # spawned nodes only: respawn recipe
        self.respawns = 0


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
        adv = config.advertise_host or config.host
        self.token_addr = f"tcp://{adv}:{token_port}"

        ctx = multiprocessing.get_context("spawn")
        self.handles: List[NodeHandle] = []
        name_counts: Dict[str, int] = {}
        n_spawned = 0
        for spec in specs:
            if getattr(spec, "attach_addr", None):
                # attach mode: the node is already serving at this address
                # (launched standalone, possibly on another host). The full
                # control name comes back from its first ping (wait_ready);
                # peers/tokens are wired over RPC in start().
                assert spec.n_replicas == 1, "attach specs are one node each"
                self.handles.append(NodeHandle(
                    name="", node_type=NodeType(spec.node_type),
                    addr=spec.attach_addr, proc=None,
                    node_type_str=spec.node_type, tpot_slo=spec.tpot_slo))
                continue
            for _ in range(spec.n_replicas):
                idx = name_counts.get(spec.node_type, 0)
                name_counts[spec.node_type] = idx + 1
                boot = NodeBoot(
                    name=f"{spec.node_type.lower()}{idx}",
                    node_type=spec.node_type,
                    config=spec_node_config(config.node, spec),
                    rpc_host=config.host,
                    rpc_port=find_free_port(),
                    token_addr=self.token_addr,
                    tpot_slo=spec.tpot_slo,
                    platform=config.platform,
                    xla_flags=config.xla_flags,
                    device_index=n_spawned)
                n_spawned += 1
                full_name = f"{NodeType(boot.node_type)}Node:{boot.name}"
                proc = ctx.Process(target=node_worker_main, args=(boot,),
                                   name=full_name, daemon=True)
                proc.start()
                self.handles.append(NodeHandle(
                    full_name, NodeType(boot.node_type),
                    f"tcp://{boot.rpc_host}:{boot.rpc_port}", proc,
                    node_type_str=boot.node_type, tpot_slo=boot.tpot_slo,
                    boot=boot))

        self._procs_by_request: Dict = {}
        self._node_by_request: Dict = {}     # request_id -> handle.name
        self._collector_task = None
        self._health_task = None
        self._enodes = [h for h in self.handles if h.node_type.can_encode]
        self._pnodes = [h for h in self.handles if h.node_type.can_prefill]
        assert self._pnodes, "cluster has no prefill-capable node"
        self._rr = {"e": 0, "p": 0}

    async def wait_ready(self) -> None:
        deadline = time.perf_counter() + self.config.start_timeout_s
        for h in self.handles:
            while True:
                try:
                    name = await h.client.call("ping", timeout=2.0)
                    if not h.name:
                        h.name = name      # attached node reports its name
                    elif name != h.name:
                        raise RuntimeError(
                            f"node at {h.addr} is {name}, expected {h.name}")
                    break
                except RuntimeError:
                    raise
                except Exception:
                    if h.proc is not None and not h.proc.is_alive():
                        raise RuntimeError(f"node process {h.name} died at startup")
                    if time.perf_counter() > deadline:
                        raise TimeoutError(f"node {h.name or h.addr} not ready")
                    await asyncio.sleep(0.2)

    async def start(self) -> None:
        await self.wait_ready()
        # wire the full peer table + token plane on every node (spawned
        # children got both at boot; re-wiring is idempotent and folds the
        # attached nodes into the same migrate graph)
        infos = [PeerInfo(name=h.name, node_type=h.node_type_str,
                          tpot_slo=h.tpot_slo, addr=h.addr)
                 for h in self.handles]
        for h in self.handles:
            await h.client.call("connect_tokens", self.token_addr)
            await h.client.call(
                "wire_peers", [p for p in infos if p.name != h.name])
        for h in self.handles:
            await h.client.call("start")
        if self._collector_task is None:
            self._collector_task = asyncio.ensure_future(self._collect_tokens())
        if self._health_task is None and self.config.health_interval_s > 0:
            self._health_task = asyncio.ensure_future(self._health_loop())

    async def _health_loop(self) -> None:
        """Mid-flight failure detection: a node that stops answering pings
        (or whose process died) is declared dead after `health_strikes`
        misses; its in-flight requests are terminated so callers see a
        closed stream instead of a hang (reference bar: Ray max_restarts=1
        + retry→terminate, cluster.py:131, epdnode.py:428-442)."""
        strikes: Dict[str, int] = {}
        while True:
            await asyncio.sleep(self.config.health_interval_s)
            for h in list(self.handles):
                if not h.alive:
                    continue
                dead = h.proc is not None and not h.proc.is_alive()
                if not dead:
                    try:
                        await h.client.call(
                            "ping", timeout=self.config.health_interval_s)
                        strikes[h.name] = 0
                        continue
                    except Exception:
                        strikes[h.name] = strikes.get(h.name, 0) + 1
                        if strikes[h.name] < self.config.health_strikes:
                            continue
                self._mark_dead(h)

    def _mark_dead(self, h: "NodeHandle") -> None:
        logger.error(f"node {h.name} ({h.addr}) is unreachable: "
                     f"terminating its in-flight requests")
        h.alive = False
        if h in self._enodes:
            self._enodes.remove(h)
        if h in self._pnodes:
            self._pnodes.remove(h)
        victims = [rid for rid, name in self._node_by_request.items()
                   if name == h.name]
        for rid in victims:
            self._node_by_request.pop(rid, None)
            for proc in self._procs_by_request.pop(rid, ()):
                proc.terminate()
        # elastic recovery: restart a dead spawned node once (reference:
        # Ray max_restarts=1, cluster.py:131); for an attached node keep
        # probing its address and fold it back in when it answers again
        if h.boot is not None and h.respawns < self.config.max_respawns:
            asyncio.ensure_future(self._respawn(h))
        elif h.proc is None:
            asyncio.ensure_future(self._reattach(h))

    async def _respawn(self, h: "NodeHandle") -> None:
        h.respawns += 1
        logger.info(f"respawning node {h.name} "
                    f"(attempt {h.respawns}/{self.config.max_respawns})")
        try:
            if h.proc is not None:
                # a node marked dead on ping strikes may still be RUNNING
                # (hung, not exited) — holding the TPU devices and the
                # token-push socket the replacement needs. Escalate:
                # terminate → join → kill → join before spawning anew.
                if h.proc.is_alive():
                    h.proc.terminate()
                h.proc.join(timeout=5.0)
                if h.proc.is_alive():
                    h.proc.kill()
                    h.proc.join(timeout=5.0)
            boot = dataclasses.replace(
                h.boot, rpc_port=find_free_port())   # old port may linger
            ctx = multiprocessing.get_context("spawn")
            proc = ctx.Process(target=node_worker_main, args=(boot,),
                               name=h.name, daemon=True)
            proc.start()
            h.boot = boot
            h.proc = proc
            h.client.close()
            h.addr = f"tcp://{boot.rpc_host}:{boot.rpc_port}"
            h.client = RpcClient(h.addr)
            await self._rejoin(h)
        except Exception:
            logger.exception(f"respawn of {h.name} failed; node stays dead")

    async def _reattach(self, h: "NodeHandle") -> None:
        deadline = time.perf_counter() + self.config.start_timeout_s
        while time.perf_counter() < deadline:
            await asyncio.sleep(max(1.0, self.config.health_interval_s))
            try:
                await h.client.call("ping", timeout=2.0)
            except Exception:
                continue
            try:
                await self._rejoin(h)
            except Exception:
                logger.exception(f"re-attach of {h.name} failed")
            return
        logger.error(f"node {h.name} ({h.addr}) never came back; giving up")

    async def _rejoin(self, h: "NodeHandle") -> None:
        """Wait for a restarted/recovered node, rewire every peer table
        (its address may have changed), and put it back in the routing
        pools."""
        deadline = time.perf_counter() + self.config.start_timeout_s
        while True:
            try:
                await h.client.call("ping", timeout=2.0)
                break
            except Exception:
                if h.proc is not None and not h.proc.is_alive():
                    raise RuntimeError(f"restarted node {h.name} died again")
                if time.perf_counter() > deadline:
                    raise TimeoutError(f"restarted node {h.name} not ready")
                await asyncio.sleep(0.2)
        infos = [PeerInfo(name=x.name, node_type=x.node_type_str,
                          tpot_slo=x.tpot_slo, addr=x.addr)
                 for x in self.handles if x.alive or x is h]
        await h.client.call("connect_tokens", self.token_addr)
        await h.client.call(
            "wire_peers", [p for p in infos if p.name != h.name])
        await h.client.call("start")
        for x in self.handles:
            if x.alive and x is not h:
                try:
                    await x.client.call(
                        "wire_peers", [p for p in infos if p.name != x.name])
                except Exception:
                    pass
        h.alive = True
        if h.node_type.can_encode and h not in self._enodes:
            self._enodes.append(h)
        if h.node_type.can_prefill and h not in self._pnodes:
            self._pnodes.append(h)
        logger.info(f"node {h.name} rejoined the cluster at {h.addr}")

    async def _collect_tokens(self) -> None:
        while True:
            request_id, token_id, is_last = await self.token_sock.recv_pyobj()
            procs = self._procs_by_request.get(request_id, ())
            for proc in procs:
                if token_id is None:
                    proc.terminate()
                else:
                    proc.append_token_id(token_id, is_last)
            if is_last:
                self._procs_by_request.pop(request_id, None)
                self._node_by_request.pop(request_id, None)

    async def add_request(self, request: Request,
                          params: RequestProcessParameters) -> None:
        self._procs_by_request[request.request_id] = \
            list(params.output_token_processors)
        has_image = request.image is not None or request.image_base64 is not None
        pool, key = ((self._enodes, "e") if has_image and self._enodes
                     else (self._pnodes, "p"))
        if not pool:
            raise RuntimeError("no live node can accept this request")
        h = pool[self._rr[key] % len(pool)]
        self._rr[key] += 1
        # best-effort request→node map for failure termination (the request
        # may later migrate; mid-flight death then terminates by entry node)
        self._node_by_request[request.request_id] = h.name
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
        for task in (self._collector_task, self._health_task):
            if task is not None:
                task.cancel()
        self._collector_task = self._health_task = None
        for h in self.handles:
            try:
                await h.client.call("stop", timeout=5.0)
            except Exception:
                pass
        for h in self.handles:
            if h.proc is not None:
                h.proc.join(timeout=5.0)
                if h.proc.is_alive():
                    h.proc.terminate()
                    h.proc.join(timeout=5.0)
            h.client.close()
        self.token_sock.close(linger=0)
