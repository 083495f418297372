from .mesh import (make_mesh, shard_decoder_weights, shard_kv_cache,
                   replicate, DECODER_WEIGHT_RULES)

__all__ = ["make_mesh", "shard_decoder_weights", "shard_kv_cache",
           "replicate", "DECODER_WEIGHT_RULES"]
