import textwrap

import pytest

from hydrainfer_tpu.cluster.cluster import ClusterConfig, NodeSpec, resolve_cluster_topology
from hydrainfer_tpu.config import load_config
from hydrainfer_tpu.entrypoint.entrypoint import EntryPointConfig


def test_defaults():
    cfg = load_config(EntryPointConfig)
    assert cfg.api_server.port == 8000
    assert cfg.cluster.cluster_type == "auto"
    assert cfg.cluster.node.kv_block_size == 16


def test_yaml_and_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent("""
        api_server:
          port: 9999
        cluster:
          cluster_type: general
          nodes:
            - node_type: EP
              n_replicas: 2
            - node_type: D
              n_replicas: 1
              tpot_slo: 0.02
          node:
            kv_block_size: 32
            model:
              dtype: bf16
    """))
    cfg = load_config(EntryPointConfig, str(p), overrides=[
        "api_server.host=0.0.0.0",
        "cluster.node.n_kv_blocks=512",
        "cluster.node.batch_scheduler.chunked_prefill=false",
    ])
    assert cfg.api_server.port == 9999
    assert cfg.api_server.host == "0.0.0.0"
    assert cfg.cluster.nodes[0].node_type == "EP"
    assert cfg.cluster.nodes[0].n_replicas == 2
    assert cfg.cluster.nodes[1].tpot_slo == 0.02
    assert cfg.cluster.node.kv_block_size == 32
    assert cfg.cluster.node.n_kv_blocks == 512
    assert cfg.cluster.node.batch_scheduler.chunked_prefill is False
    assert cfg.cluster.node.model.dtype == "bf16"


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("api_server:\n  portt: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(EntryPointConfig, str(p))


def test_topology_presets():
    assert [s.node_type for s in resolve_cluster_topology("auto", 1)] == ["EPD"]
    assert [s.node_type for s in resolve_cluster_topology("auto", 2)] == ["EP", "D"]
    assert [s.node_type for s in resolve_cluster_topology("general", 8)] == ["E", "P", "D"]
    specs = resolve_cluster_topology("auto", 8)
    assert sum(s.n_replicas for s in specs) == 8


def test_list_of_dataclass_override():
    """`cluster.nodes=[{node_type: P}, ...]` CLI overrides must materialize
    NodeSpec dataclasses, not raw dicts (the Cluster ctor reads .n_replicas)."""
    from hydrainfer_tpu.cluster.cluster import ClusterConfig, NodeSpec
    from hydrainfer_tpu.entrypoint.entrypoint import EntryPointConfig

    cfg = load_config(EntryPointConfig, None, [
        "cluster.nodes=[{node_type: P, n_replicas: 2}, {node_type: D}]"])
    assert all(isinstance(s, NodeSpec) for s in cfg.cluster.nodes)
    assert cfg.cluster.nodes[0].node_type == "P"
    assert cfg.cluster.nodes[0].n_replicas == 2
