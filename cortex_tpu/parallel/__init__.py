from .sharded_index import ShardedCorpus, ShardedFlatIndex
from .sharding import (build_mesh, sharded_cosine_topk, sharded_engine_step,
                       shard_corpus)

__all__ = ["ShardedCorpus", "ShardedFlatIndex", "build_mesh",
           "sharded_cosine_topk", "sharded_engine_step", "shard_corpus"]
