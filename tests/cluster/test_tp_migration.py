"""Migration between PARALLEL (tp-meshed) nodes: gather_blocks on a
GSPMD-sharded cache → device_put hop → scatter onto a DIFFERENTLY-placed
destination (another tp mesh, or a single device). This is the reference's
core deployment shape — TP prefill groups paired with decode groups
(reference: hydrainfer/cluster/cluster.py:123-141,
hydrainfer/memory/communication.py:50-123) — previously exercised only with
single-device nodes here."""
import asyncio
import time

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.cluster.migrate import MigrateGraphBuilder, NodeType
from hydrainfer_tpu.cluster.node import AsyncEPDNode, NodeConfig, NodeContext
from hydrainfer_tpu.engine.output_token_processor import LogOutputTokenProcessor
from hydrainfer_tpu.engine.request_processor import (RequestProcessorConfig,
                                                     RequestProcessParameters)
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
from hydrainfer_tpu.request import Request, SamplingParameters


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("tp_mig_llama")
    # kv heads divisible by the tp degree (2)
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        path, safe_serialization=True)
    return str(path)


def make_node(path, name, node_type, devices):
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32"))
    factory.getTokenizer = lambda: SimpleTokenizer()
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=64, n_image_blocks=2)
    cfg.model.dtype = "float32"
    node = AsyncEPDNode(cfg, NodeContext(
        name=name, node_type=NodeType(node_type), device=devices,
        parallel="tp"))
    node.init(factory)
    return node


def wire(nodes):
    builder = MigrateGraphBuilder()
    for node in nodes:
        builder.add_node(node.name, node.context.node_type, node,
                         tpot_slo=0.4)
    graph = builder.build_graph()
    for node in nodes:
        node.update_migrate_graph(graph)


def serve(nodes, n_requests=3, max_tokens=8):
    async def run():
        procs = [LogOutputTokenProcessor() for _ in range(n_requests)]
        for i, proc in enumerate(procs):
            await nodes[0].add_request(
                Request(request_id=f"tp{i}",
                        prompt=f"tensor parallel migration check {i}",
                        sampling_params=SamplingParameters(
                            max_tokens=max_tokens, ignore_eos=True)),
                RequestProcessParameters(output_token_processors=[proc]))
        deadline = time.perf_counter() + 120
        while not all(p.finished for p in procs):
            for node in nodes:
                await node.step()
            await asyncio.sleep(0)
            assert time.perf_counter() < deadline, (
                f"stalled: {[len(p.token_ids) for p in procs]}")
        return [p.token_ids for p in procs]

    return asyncio.run(run())


@pytest.fixture(scope="module")
def baseline_tokens(tiny_llama_path):
    """Greedy tokens from a single colocated EPD node (no migration)."""
    node = make_node(tiny_llama_path, "base", "EPD", jax.devices()[0])
    wire([node])
    return serve([node])


def test_tp2_prefill_to_tp2_decode_token_parity(tiny_llama_path,
                                                baseline_tokens):
    """P(tp=2 mesh) -> D(tp=2 mesh on DIFFERENT devices): the sharded cache
    is gathered on the source mesh, hops, and scatters onto the destination
    mesh's sharding; tokens must match the no-migration run exactly."""
    devs = jax.devices()
    p = make_node(tiny_llama_path, "p_tp", "P", devs[0:2])
    d = make_node(tiny_llama_path, "d_tp", "D", devs[2:4])
    assert p.mesh is not None and d.mesh is not None
    assert not p.kv_cache_manager.cache_array.sharding.is_fully_replicated
    wire([p, d])
    assert serve([p, d]) == baseline_tokens
    # the decode-side cache really is sharded over its own mesh
    assert not d.kv_cache_manager.cache_array.sharding.is_fully_replicated


def test_tp2_prefill_to_single_device_decode(tiny_llama_path,
                                             baseline_tokens):
    """P(tp=2) -> D(one device): sharded-source gather onto an unsharded
    destination pool."""
    devs = jax.devices()
    p = make_node(tiny_llama_path, "p_tp2", "P", devs[0:2])
    d = make_node(tiny_llama_path, "d_one", "D", devs[4])
    assert p.mesh is not None and d.mesh is None
    wire([p, d])
    assert serve([p, d]) == baseline_tokens


def test_single_prefill_to_tp2_decode(tiny_llama_path, baseline_tokens):
    """P(one device) -> D(tp=2): unsharded payload scattered onto a sharded
    destination pool (the reverse placement transfer)."""
    devs = jax.devices()
    p = make_node(tiny_llama_path, "p_one2", "P", devs[4])
    d = make_node(tiny_llama_path, "d_tp2", "D", devs[6:8])
    assert p.mesh is None and d.mesh is not None
    wire([p, d])
    assert serve([p, d]) == baseline_tokens
