from .config import SimilarityConfig
from .embedding import (EmbeddingService, HashingEmbedder, STEmbedder,
                        default_embedder, embedding_input)
from .index import (BruteForceIndex, SearchHit, TpuFlatIndex, VectorFilter,
                    VectorIndex)
from .ivf import IvfCorpus, TpuIvfIndex
from .scoring import (ScoreDecayConfig, apply_score_decay,
                      apply_score_decay_batch)
from .shard import (DeviceCorpus, DeviceFetchTimeout,
                    _fetch_array as fetch_array)

__all__ = [
    "SimilarityConfig",
    "EmbeddingService", "HashingEmbedder", "STEmbedder", "default_embedder",
    "embedding_input",
    "BruteForceIndex", "SearchHit", "TpuFlatIndex", "TpuIvfIndex",
    "IvfCorpus", "VectorFilter",
    "VectorIndex", "DeviceCorpus", "DeviceFetchTimeout", "fetch_array",
    "ScoreDecayConfig", "apply_score_decay", "apply_score_decay_batch",
]
