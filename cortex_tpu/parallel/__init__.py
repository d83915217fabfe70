from .sharding import (build_mesh, sharded_cosine_topk, sharded_engine_step,
                       shard_corpus)

__all__ = ["build_mesh", "sharded_cosine_topk", "sharded_engine_step",
           "shard_corpus"]
