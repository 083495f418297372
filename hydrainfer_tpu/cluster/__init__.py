from .migrate import MigrateGraph, MigrateGraphBuilder, MigrateNode, NodeType
from .loadbalancer import (CompositeLoadBalancer, LoadBalancer,
                           LoadBalancerConfig)
from .node import AsyncEPDNode, NodeConfig, NodeContext

__all__ = [
    "MigrateGraph", "MigrateGraphBuilder", "MigrateNode", "NodeType",
    "CompositeLoadBalancer", "LoadBalancer", "LoadBalancerConfig",
    "AsyncEPDNode", "NodeConfig", "NodeContext",
]
