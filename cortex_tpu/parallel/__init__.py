from .sharded_index import ShardedCorpus, ShardedFlatIndex
from .sharded_ivf import ShardedIvfCorpus, ShardedIvfIndex
from .sharding import (build_mesh, sharded_cosine_topk, sharded_engine_step,
                       shard_corpus)

__all__ = ["ShardedCorpus", "ShardedFlatIndex", "ShardedIvfCorpus",
           "ShardedIvfIndex", "build_mesh",
           "sharded_cosine_topk", "sharded_engine_step", "shard_corpus"]
