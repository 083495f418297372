"""Tensor-parallel engine: the full serving path on an 8-device CPU mesh,
token-exact vs the single-device engine."""
import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hydrainfer_tpu.cluster.node import AsyncEPDNode, NodeConfig, NodeContext
from hydrainfer_tpu.cluster.migrate import NodeType
from hydrainfer_tpu.engine.request_processor import RequestProcessorConfig
from hydrainfer_tpu.engine.scheduler import BatchSchedulerConfig
from hydrainfer_tpu.entrypoint.offline import OfflineEngine
from hydrainfer_tpu.models import ModelFactoryConfig, getModelFactory
from hydrainfer_tpu.models.tokenizer import SimpleTokenizer
from hydrainfer_tpu.request import Request, SamplingParameters


@pytest.fixture(scope="module")
def tiny_llama_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("tp_llama")
    # kv heads divisible by 8 for the tp axis
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        max_position_embeddings=128)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).eval().float().save_pretrained(
        path, safe_serialization=True)
    return str(path)


def run_engine(path, devices):
    # attention_impl left at "auto": TP nodes route attention through
    # shard_map (ops/attention.py:paged_attention_tp) — the real kernel on
    # TPU, the jnp oracle per-shard on CPU — so this test fails if the
    # sharded-attention path breaks (no more attention_impl="jnp" pin).
    factory = getModelFactory(ModelFactoryConfig(path=path, dtype="float32"))
    factory.getTokenizer = lambda: SimpleTokenizer()
    cfg = NodeConfig(
        batch_scheduler=BatchSchedulerConfig(max_running_requests=4),
        request_processor=RequestProcessorConfig(
            num_request_process_workers=1, block_size=4),
        kv_block_size=4, n_kv_blocks=64, n_image_blocks=2)
    cfg.model.dtype = "float32"

    import asyncio
    from hydrainfer_tpu.cluster.migrate import MigrateGraphBuilder
    context = NodeContext(name="tp0", node_type=NodeType("EPD"),
                          device=devices)
    node = AsyncEPDNode(cfg, context)
    node.init(factory)
    b = MigrateGraphBuilder()
    b.add_node(node.name, context.node_type, node)
    node.update_migrate_graph(b.build_graph())

    from hydrainfer_tpu.engine.output_token_processor import (
        OfflineOutputTokenProcessor, OutputTokenParams)
    from hydrainfer_tpu.engine.request_processor import RequestProcessParameters
    from hydrainfer_tpu.request import OfflineInferenceOutput
    import time

    async def go():
        outs = [OfflineInferenceOutput(arrival_time=time.perf_counter())
                for _ in range(2)]
        done = []
        for i, out in enumerate(outs):
            proc = OfflineOutputTokenProcessor(out, SimpleTokenizer(),
                                               on_finish=lambda o: done.append(o))
            await node.add_request(
                Request(request_id=i, prompt=f"hello tp world {i}",
                        sampling_params=SamplingParameters(max_tokens=6,
                                                           ignore_eos=True)),
                RequestProcessParameters(output_token_processors=[proc],
                                         output_token_params=OutputTokenParams()))
        for _ in range(400):
            await node.step()
            if len(done) == 2:
                break
        assert len(done) == 2
        return [o.output_token_ids for o in outs]

    return asyncio.run(go())


def test_tp8_matches_single_device(tiny_llama_path):
    single = run_engine(tiny_llama_path, jax.devices()[0])
    tp8 = run_engine(tiny_llama_path, list(jax.devices()))
    assert len(jax.devices()) == 8
    assert tp8 == single


def test_cluster_tp_groups(tiny_llama_path):
    """tp_size=4 on 8 devices → 2 node groups, disaggregated serving works."""
    import asyncio

    from hydrainfer_tpu.cluster.cluster import Cluster, ClusterConfig
    from hydrainfer_tpu.engine.output_token_processor import (
        OfflineOutputTokenProcessor, OutputTokenParams)
    from hydrainfer_tpu.engine.request_processor import RequestProcessParameters
    from hydrainfer_tpu.request import OfflineInferenceOutput
    import time

    def provider():
        # attention_impl left at "auto": TP groups route through the
        # shard_map attention path, same as production (no oracle pin)
        f = getModelFactory(ModelFactoryConfig(
            path=tiny_llama_path, dtype="float32"))
        f.getTokenizer = lambda: SimpleTokenizer()
        return f
    cfg = ClusterConfig(tp_size=4)
    cfg.node.batch_scheduler = BatchSchedulerConfig(max_running_requests=4)
    cfg.node.request_processor = RequestProcessorConfig(
        num_request_process_workers=1, block_size=4)
    cfg.node.kv_block_size = 4
    cfg.node.n_kv_blocks = 64
    cfg.node.n_image_blocks = 2
    cfg.node.model.dtype = "float32"
    cluster = Cluster(cfg, model_factory_provider=provider)
    assert len(cluster.nodes) == 2          # 8 devices / tp 4
    assert all(n.mesh is not None and n.mesh.devices.size == 4
               for n in cluster.nodes)

    async def go():
        out = OfflineInferenceOutput(arrival_time=time.perf_counter())
        done = []
        proc = OfflineOutputTokenProcessor(out, SimpleTokenizer(),
                                           on_finish=lambda o: done.append(o))
        await cluster.add_request(
            Request(request_id="x", prompt="tp cluster",
                    sampling_params=SamplingParameters(max_tokens=4,
                                                       ignore_eos=True)),
            RequestProcessParameters(output_token_processors=[proc],
                                     output_token_params=OutputTokenParams()))
        for _ in range(300):
            await cluster.step_all()
            if done:
                break
        assert done and len(out.output_token_ids) == 4

    asyncio.run(go())
