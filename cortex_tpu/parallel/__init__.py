from .sharded_index import ShardedCorpus, ShardedFlatIndex
from .sharded_ivf import ShardedIvfCorpus, ShardedIvfIndex
from .sharding import (REPLICA_AXIS, SHARD_AXIS, batch_spec, build_mesh,
                       elementwise_spec, pad_batch, replica_count,
                       result_spec, shard_corpus, shard_count,
                       sharded_cosine_topk, sharded_engine_step, unpad_rows)

__all__ = ["ShardedCorpus", "ShardedFlatIndex", "ShardedIvfCorpus",
           "ShardedIvfIndex", "REPLICA_AXIS", "SHARD_AXIS", "batch_spec",
           "build_mesh", "elementwise_spec", "pad_batch", "replica_count",
           "result_spec", "shard_corpus", "shard_count",
           "sharded_cosine_topk", "sharded_engine_step", "unpad_rows"]
