"""Node types and the migration graph (reference: hydrainfer/cluster/migrate.py).

A node type string over {E, P, D} derives capability flags:
  - 'E' → has vision model + image cache (encode stage)
  - 'P' → has language model + kv cache + image cache (prefill reads images)
  - 'D' → has language model + kv cache (decode)
Hybrid types (EP, ED, PD, EPD) union the flags. The migrate graph is the
full bipartite table: every E-capable node may hand off to every P-capable
node (ep_table), every P-capable to every D-capable (pd_table).
"""
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class NodeType:
    node_type: str = "EPD"

    def __post_init__(self):
        t = self.node_type.upper()
        assert t and set(t) <= {"E", "P", "D"}, f"bad node type {self.node_type}"
        self.node_type = t

    @property
    def has_vision_model(self) -> bool:
        return "E" in self.node_type

    @property
    def has_language_model(self) -> bool:
        return "P" in self.node_type or "D" in self.node_type

    @property
    def has_kv_cache(self) -> bool:
        return "P" in self.node_type or "D" in self.node_type

    @property
    def has_image_cache(self) -> bool:
        return "E" in self.node_type or "P" in self.node_type

    @property
    def can_encode(self) -> bool:
        return "E" in self.node_type

    @property
    def can_prefill(self) -> bool:
        return "P" in self.node_type

    @property
    def can_decode(self) -> bool:
        return "D" in self.node_type

    def __str__(self):
        return self.node_type


@dataclass
class MigrateNode:
    """An edge target in the migrate graph."""
    name: str                 # node's control-plane name
    node: object = None       # in-process node reference (single-controller)
    tpot_slo: float = 0.4     # used to route Strict-scenario requests


@dataclass
class MigrateGraph:
    ep_table: Dict[str, List[MigrateNode]] = field(default_factory=dict)
    pd_table: Dict[str, List[MigrateNode]] = field(default_factory=dict)


class MigrateGraphBuilder:
    def __init__(self):
        self._nodes: List[tuple] = []  # (name, NodeType, node_ref, tpot_slo)

    def add_node(self, name: str, node_type: NodeType, node=None,
                 tpot_slo: float = 0.4) -> None:
        self._nodes.append((name, node_type, node, tpot_slo))

    def build_graph(self) -> MigrateGraph:
        graph = MigrateGraph()
        for name, ntype, _, _ in self._nodes:
            if ntype.can_encode:
                graph.ep_table[name] = [
                    MigrateNode(n, node, slo)
                    for n, t, node, slo in self._nodes if t.can_prefill]
            if ntype.can_prefill:
                graph.pd_table[name] = [
                    MigrateNode(n, node, slo)
                    for n, t, node, slo in self._nodes if t.can_decode]
        return graph
