"""Cluster: the data-parallel control plane over EPD nodes.

Behavioral parity with the reference cluster (reference:
hydrainfer/cluster/cluster.py:52-183): spawn node replicas per node type,
wire the migrate graph, route incoming requests to encode-capable nodes
(image requests) or prefill-capable nodes (text requests) via round-robin
balancers.

Single-controller re-design: nodes are in-process asyncio actors bound to
device subsets instead of Ray actors in their own processes; there is no
NCCL world to rendezvous — the controller already owns every chip. The
`cluster_type` presets mirror the reference's auto/general/hybrid/single
heuristics over the visible chip count (reference: cluster.py:63-84).
"""
import asyncio
from dataclasses import dataclass, field
from typing import List, Optional

import jax

from ..engine.request_processor import RequestProcessParameters
from ..entrypoint.api_server import RequestObserver
from ..models.factory import ModelFactory
from ..request import Request
from ..utils.logger import getLogger
from .loadbalancer import LoadBalancer, LoadBalancerConfig
from .migrate import MigrateGraphBuilder, NodeType
from .node import AsyncEPDNode, NodeConfig, NodeContext

logger = getLogger(__name__)


@dataclass
class NodeSpec:
    node_type: str = "EPD"
    n_replicas: int = 1
    tpot_slo: float = 0.4
    # per-spec engine config OVERLAY (reference: config/node/*.yaml presets
    # composed into the cluster preset): a raw dict deep-merged over the
    # cluster-wide `node` config, so the model path etc. set once at
    # cluster.node still applies to every node type
    node: Optional[dict] = None
    # ProcessCluster only: attach to a node ALREADY SERVING at this
    # tcp://host:port (launched standalone on any host with
    # `python -m hydrainfer_tpu.cluster.process_node`) instead of spawning
    # a local child — the multi-host deployment path. n_replicas must be 1
    # for attach specs (one address, one node).
    attach_addr: Optional[str] = None


def spec_node_config(base: NodeConfig, spec: "NodeSpec") -> NodeConfig:
    """Materialize one spec's NodeConfig: base deep-merged with the spec's
    dict overlay (config/node/*.yaml fragments)."""
    overlay = getattr(spec, "node", None)
    if not overlay:
        return base
    import dataclasses as _dc

    from ..config import build_dataclass, deep_merge
    if _dc.is_dataclass(overlay):
        overlay = _dc.asdict(overlay)
    return build_dataclass(NodeConfig, deep_merge(_dc.asdict(base), overlay))


@dataclass
class ClusterConfig:
    cluster_type: str = "auto"          # auto | general | hybrid | single
    nodes: List[NodeSpec] = field(default_factory=list)
    node: NodeConfig = field(default_factory=NodeConfig)
    # tensor-parallel degree per node: each node owns tp_size devices and
    # shards its LM weights + kv-head axis over them (GSPMD)
    tp_size: int = 1
    # pipeline-parallel degree per node: each node owns pp_size devices and
    # shards its LAYER axis over them (stage relay, parallel/pipeline.py).
    # Mutually exclusive with tp_size > 1 (pp x tp composition is v2).
    pp_size: int = 1
    # deployment shape: "inprocess" = asyncio actors in this process;
    # "process" = one OS process per node over the ZMQ RPC plane (the
    # reference's actor-per-device shape, reference: cluster.py:123-141)
    deployment: str = "inprocess"
    # process deployment only: bind host for the RPC/token planes (tcp://
    # addresses — the same code spans hosts over DCN)
    host: str = "127.0.0.1"
    platform: Optional[str] = None      # force child jax platform (tests: cpu)
    xla_flags: Optional[str] = None


def resolve_cluster_topology(cluster_type: str, n_devices: int) -> List[NodeSpec]:
    """Preset → node specs (reference: cluster.py:63-84 heuristics)."""
    if cluster_type == "single" or n_devices == 1:
        return [NodeSpec("EPD", 1)]
    if cluster_type == "general":
        # dedicated stages: 1 encode, 1 prefill, rest decode
        n_d = max(1, n_devices - 2)
        return [NodeSpec("E", 1), NodeSpec("P", 1), NodeSpec("D", n_d)]
    if cluster_type == "hybrid":
        # hybrid EP nodes + dedicated decode
        n_ep = max(1, n_devices // 2)
        return [NodeSpec("EP", n_ep), NodeSpec("D", n_devices - n_ep)]
    # auto
    if n_devices == 2:
        return [NodeSpec("EP", 1), NodeSpec("D", 1)]
    if n_devices == 3:
        return [NodeSpec("E", 1), NodeSpec("P", 1), NodeSpec("D", 1)]
    return [NodeSpec("E", 1), NodeSpec("P", (n_devices - 1) // 2),
            NodeSpec("D", n_devices - 1 - (n_devices - 1) // 2)]


def node_metrics(node) -> dict:
    """One node's serving metrics as plain JSON (shared by the in-process
    cluster and the per-node RPC worker, so /metrics looks the same in
    both deployment shapes)."""
    row = {}
    kv = getattr(node, "kv_cache_manager", None)
    if kv is not None:
        m = kv.metrics()
        row["kv_free_blocks"] = m.allocator.n_free_blocks
        row["kv_total_blocks"] = m.allocator.n_total_blocks
        row["prefix_cache_hit_rate"] = round(m.prefix_cache_hit_rate, 4)
    sched = getattr(node, "batch_scheduler", None)
    if sched is not None:
        sm = sched.metrics()
        row["running_requests"] = sm.n_running_requests
        row["waiting_requests"] = len(sched.waiting)
        row["migrating_requests"] = sm.n_requests_waiting_migrate
    fx = getattr(getattr(node, "executor", None), "fill_executor", None)
    if fx is not None and getattr(fx, "spec_steps", 0):
        row["spec_steps"] = fx.spec_steps
        row["spec_tokens"] = fx.spec_tokens
    pulls = getattr(node, "_pull_stats", None)
    if pulls and pulls["n"]:
        row["migration_pulls"] = pulls["n"]
        row["migration_pull_s_total"] = round(pulls["seconds"], 4)
        row["migration_pull_mb"] = round(pulls["bytes"] / 1e6, 3)
    return row


class Cluster(RequestObserver):
    def __init__(self, config: ClusterConfig,
                 model_factory: Optional[ModelFactory] = None,
                 devices: Optional[list] = None,
                 model_factory_provider=None):
        """model_factory: ONE factory shared by all nodes (its cached models
        are shared — fine for single-device nodes / tests). For
        tensor-parallel nodes each node must own its weight copy: pass
        model_factory_provider (a zero-arg callable) or rely on the default,
        which builds a fresh factory per node from config.node.model."""
        self.config = config
        devices = devices if devices is not None else jax.devices()
        tp = max(1, config.tp_size)
        pp = max(1, config.pp_size)
        assert tp == 1 or pp == 1, "pp_size x tp_size composition is v2"
        group_n = tp * pp
        n_groups = max(1, len(devices) // group_n)
        specs = config.nodes or resolve_cluster_topology(
            config.cluster_type, n_groups)

        self.nodes: List[AsyncEPDNode] = []
        dev_idx = 0
        # names must be GLOBALLY unique: migrate-graph tables and the
        # self-migration check key on name, and two NodeSpecs with the same
        # node_type would otherwise collide (each spec restarts r at 0)
        name_counts: dict = {}
        for spec in specs:
            for r in range(spec.n_replicas):
                idx = name_counts.get(spec.node_type, 0)
                name_counts[spec.node_type] = idx + 1
                name = f"{spec.node_type.lower()}{idx}"
                group = [devices[(dev_idx * group_n + i) % len(devices)]
                         for i in range(group_n)]
                device = group if group_n > 1 else group[0]
                dev_idx += 1
                node = AsyncEPDNode(spec_node_config(config.node, spec), NodeContext(
                    name=name, node_type=NodeType(spec.node_type),
                    device=device, parallel=("pp" if pp > 1 else "tp")))
                node.spec = spec
                self.nodes.append(node)

        for node in self.nodes:
            if model_factory is not None:
                node.init(model_factory)
            elif model_factory_provider is not None:
                node.init(model_factory_provider())
            else:
                node.init(None)  # node builds from config.node.model

        builder = MigrateGraphBuilder()
        for node in self.nodes:
            builder.add_node(node.name, node.context.node_type, node,
                             tpot_slo=node.spec.tpot_slo)
        graph = builder.build_graph()
        for node in self.nodes:
            node.update_migrate_graph(graph)

        # request entry balancers (reference: cluster.py:178-183)
        self.ebalancer = LoadBalancer(LoadBalancerConfig("round"))
        self.pbalancer = LoadBalancer(LoadBalancerConfig("round"))
        for node in self.nodes:
            if node.context.node_type.can_encode:
                self.ebalancer.register_worker(node)
            if node.context.node_type.can_prefill:
                self.pbalancer.register_worker(node)
        assert len(self.pbalancer), "cluster has no prefill-capable node"
        logger.info(f"cluster up: {[n.name for n in self.nodes]}")

    def metrics(self) -> dict:
        """Aggregated per-node serving metrics (backs the API server's
        /metrics endpoint)."""
        return {node.name: node_metrics(node) for node in self.nodes}

    async def add_request(self, request: Request,
                          params: RequestProcessParameters) -> None:
        has_image = request.image is not None or request.image_base64 is not None
        balancer = (self.ebalancer if has_image and len(self.ebalancer)
                    else self.pbalancer)
        node = balancer.choice()
        await node.add_request(request, params)

    async def start(self) -> None:
        for node in self.nodes:
            await node.start()

    async def stop(self) -> None:
        for node in self.nodes:
            await node.stop()

    async def step_all(self) -> None:
        """Manually step every node once (test/driver mode)."""
        await asyncio.gather(*(node.step() for node in self.nodes))
