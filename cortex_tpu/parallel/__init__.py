from .sharded_index import ShardedCorpus, ShardedFlatIndex
from .sharded_ivf import ShardedIvfCorpus, ShardedIvfIndex
from .sharding import (REPLICA_AXIS, SHARD_AXIS, batch_spec, build_mesh,
                       replica_count, shard_corpus, shard_count,
                       sharded_cosine_topk, sharded_engine_step)

__all__ = ["ShardedCorpus", "ShardedFlatIndex", "ShardedIvfCorpus",
           "ShardedIvfIndex", "REPLICA_AXIS", "SHARD_AXIS", "batch_spec",
           "build_mesh", "replica_count", "shard_corpus", "shard_count",
           "sharded_cosine_topk", "sharded_engine_step"]
