"""cortex_tpu — a TPU-native graph memory engine for AI agents.

A ground-up rebuild of the capabilities of MikeSquared-Agency/cortex
(an embedded Rust graph-memory engine) designed TPU-first:

  - host: durable node/edge store (SQLite), graph-of-record, app services,
    servers (gRPC/HTTP/SSE/MCP), CLI
  - device: embedding shards as padded [N, d] arrays, centered-int8
    cosine + top-k scans with exact fp32 re-rank, blocked all-pairs
    auto-link scans,
    adjacency-gather graph proximity, vectorized decay sweeps
  - mesh: corpus-axis sharding over jax.sharding.Mesh with cross-shard
    top-k merges over ICI
"""

from . import kinds, relations
from .errors import (CortexError, DuplicateEdge, EdgeNotFound, GateRejection,
                     InvalidEdge, NodeNotFound, QueryParseError,
                     ValidationError)
from .types import Edge, EdgeProvenance, Node, Source

__version__ = "0.4.0"

__all__ = [
    "kinds", "relations",
    "Node", "Edge", "EdgeProvenance", "Source",
    "CortexError", "ValidationError", "NodeNotFound", "EdgeNotFound",
    "DuplicateEdge", "InvalidEdge", "GateRejection", "QueryParseError",
    "Cortex",
]


def __getattr__(name):
    # Lazy import: keep `import cortex_tpu` light (no JAX) for host-only use.
    if name == "Cortex":
        from .api import Cortex
        return Cortex
    raise AttributeError(f"module 'cortex_tpu' has no attribute {name!r}")
