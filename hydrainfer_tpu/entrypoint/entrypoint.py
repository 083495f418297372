"""Serve entrypoint: `python -m hydrainfer_tpu.entrypoint.entrypoint
[--config cfg.yaml] [key.path=value ...]`

(reference: hydrainfer/entrypoint/entrypoint.py — Hydra main wiring
APIServer + Cluster and registering the cluster as request observer).
"""
import argparse
import asyncio
from dataclasses import dataclass, field

from ..cluster.cluster import Cluster, ClusterConfig
from ..config import load_config
from ..utils.logger import getLogger
from .api_server import APIServer, APIServerConfig

logger = getLogger(__name__)


@dataclass
class EntryPointConfig:
    api_server: APIServerConfig = field(default_factory=APIServerConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)


class EntryPoint:
    def __init__(self, config: EntryPointConfig, model_factory=None):
        self.config = config
        if config.cluster.deployment == "process":
            # one OS process per node (the reference's actor-per-device
            # shape); the parent only needs the tokenizer + vision config,
            # built locally without touching model weights
            from ..cluster.process_node import (ProcessCluster,
                                                ProcessClusterConfig)
            c = config.cluster
            self.cluster = ProcessCluster(ProcessClusterConfig(
                cluster_type=c.cluster_type, nodes=c.nodes, node=c.node,
                host=c.host, platform=c.platform, xla_flags=c.xla_flags))
            if model_factory is None:
                from ..models.factory import getModelFactory
                model_factory = getModelFactory(c.node.model)
            factory = model_factory
        else:
            self.cluster = Cluster(config.cluster, model_factory=model_factory)
            factory = self.cluster.nodes[0].model_factory
        vision_cfg = factory.getVisionModelConfig()
        self.api_server = APIServer(
            config.api_server, factory.getTokenizer(),
            image_token=vision_cfg.image_token or "<image>",
            image_token_calculator=vision_cfg.image_token_calculator)
        self.api_server.register_observer(self.cluster)

    async def run(self) -> None:
        await self.cluster.start()
        runner = await self.api_server.start()
        try:
            while True:
                await asyncio.sleep(3600)
        finally:
            await self.cluster.stop()
            await runner.cleanup()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("overrides", nargs="*", help="key.path=value overrides")
    args = parser.parse_args()
    config = load_config(EntryPointConfig, args.config, args.overrides)
    entry = EntryPoint(config)
    asyncio.run(entry.run())


if __name__ == "__main__":
    main()
