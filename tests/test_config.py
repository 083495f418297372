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


def test_include_composition(tmp_path):
    """`include:` composes YAML fragments at any dict level, nearest wins."""
    (tmp_path / "base.yaml").write_text(
        "api_server: {port: 7000, host: 1.2.3.4}\n"
        "cluster: {node: {kv_block_size: 32}}\n")
    (tmp_path / "frag.yaml").write_text("n_kv_blocks: 99\n")
    (tmp_path / "top.yaml").write_text(textwrap.dedent("""
        include: [base.yaml]
        api_server: {port: 9001}
        cluster:
          nodes:
            - {node_type: P, node: {include: [frag.yaml], hbm_utilization: 0.5}}
    """))
    cfg = load_config(EntryPointConfig, str(tmp_path / "top.yaml"))
    assert cfg.api_server.port == 9001          # including file wins
    assert cfg.api_server.host == "1.2.3.4"     # inherited from base
    assert cfg.cluster.node.kv_block_size == 32
    assert cfg.cluster.nodes[0].node == {"n_kv_blocks": 99,
                                         "hbm_utilization": 0.5}


def test_include_cycle_rejected(tmp_path):
    (tmp_path / "a.yaml").write_text("include: [b.yaml]\n")
    (tmp_path / "b.yaml").write_text("include: [a.yaml]\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(EntryPointConfig, str(tmp_path / "a.yaml"))


def test_spec_node_overlay_merges_over_cluster_node():
    """config/node/*.yaml fragments overlay the cluster-wide node config —
    the model path set once at cluster.node reaches every node type."""
    from hydrainfer_tpu.cluster.cluster import spec_node_config
    from hydrainfer_tpu.cluster.node import NodeConfig

    base = load_config(EntryPointConfig, None, [
        "cluster.node.model.path=/models/x", "cluster.node.kv_block_size=32"])
    spec = NodeSpec("D", node={"batch_scheduler": {"priority": "decode"},
                               "n_kv_blocks": 4096})
    cfg = spec_node_config(base.cluster.node, spec)
    assert isinstance(cfg, NodeConfig)
    assert cfg.model.path == "/models/x"          # inherited
    assert cfg.kv_block_size == 32                # inherited
    assert cfg.batch_scheduler.priority == "decode"
    assert cfg.batch_scheduler.chunked_prefill is True  # untouched default
    assert cfg.n_kv_blocks == 4096


def test_cluster_presets_boot(monkeypatch):
    """Every shipped config/cluster/*.yaml parses and boots a fake-model
    cluster with the preset's node types (reference: config/ tree)."""
    import glob
    import os

    from hydrainfer_tpu.cluster.cluster import Cluster

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = {"single.yaml": ["EPD"], "general.yaml": ["E", "P", "D"],
                "hybrid.yaml": ["EP", "D"], "auto.yaml": None}
    paths = glob.glob(os.path.join(repo, "config/cluster/*.yaml"))
    assert len(paths) == len(expected)
    for path in paths:
        cfg = load_config(EntryPointConfig, path, [
            "cluster.node.model.name=fake",
            "cluster.node.n_kv_blocks=32",
            "cluster.node.n_image_blocks=4",
            "cluster.node.profiler.enabled=false"])
        types = expected[os.path.basename(path)]
        if types is None:
            continue  # auto resolves from the chip count at Cluster init
        assert [s.node_type for s in cfg.cluster.nodes] == types
        cluster = Cluster(cfg.cluster)
        assert [str(n.context.node_type) for n in cluster.nodes] == types
        if "hybrid" in path:
            d = cluster.nodes[-1]
            assert d.config.batch_scheduler.priority == "decode"
            assert d.config.model.name == "fake"    # base model inherited
