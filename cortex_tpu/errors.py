"""Exception hierarchy for cortex_tpu.

Mirrors the reference error taxonomy (reference: crates/cortex-core/src/error.rs:7+)
as an idiomatic Python exception tree.
"""

from __future__ import annotations


class CortexError(Exception):
    """Base class for all cortex_tpu errors."""


class ValidationError(CortexError):
    """Input failed a validation rule (types, schema, config)."""


class NodeNotFound(CortexError):
    def __init__(self, node_id: str):
        super().__init__(f"node not found: {node_id}")
        self.node_id = node_id


class EdgeNotFound(CortexError):
    def __init__(self, edge_id: str):
        super().__init__(f"edge not found: {edge_id}")
        self.edge_id = edge_id


class DuplicateEdge(CortexError):
    """An edge with the same (from, to, relation) already exists."""

    def __init__(self, from_id: str, to_id: str, relation: str):
        super().__init__(f"duplicate edge {from_id} -[{relation}]-> {to_id}")
        self.from_id = from_id
        self.to_id = to_id
        self.relation = relation


class InvalidEdge(CortexError):
    """Edge endpoints missing, soft-deleted, or edge fails validation."""


class SerializationError(CortexError):
    """Stored bytes could not be decoded (schema drift, corruption)."""


class StorageError(CortexError):
    """Underlying store failure (I/O, transaction, schema version)."""


class SchemaVersionError(StorageError):
    """On-disk schema version is incompatible with this build."""

    def __init__(self, found: int, expected: int):
        super().__init__(
            f"storage schema version {found} != expected {expected}; "
            f"run `cortex migrate` or upgrade"
        )
        self.found = found
        self.expected = expected


class GateRejection(CortexError):
    """A write was rejected by the quality gate."""

    def __init__(self, check: str, reason: str, suggestion: str | None = None,
                 existing_node: str | None = None,
                 existing_title: str | None = None):
        super().__init__(f"write gate [{check}]: {reason}")
        self.check = check
        self.reason = reason
        self.suggestion = suggestion
        self.existing_node = existing_node      # conflict-check context
        self.existing_title = existing_title


class QueryParseError(CortexError):
    """Query DSL text failed to parse."""


class ConfigError(CortexError):
    """Invalid configuration."""


class EmbeddingError(CortexError):
    """Embedding service failure."""


class IndexError_(CortexError):
    """Vector index failure (dimension mismatch, missing shard)."""


class PromptError(CortexError):
    """Prompt subsystem failure (unknown slug, cycle in inherits chain)."""


class DeviceUnavailable(CortexError):
    """The accelerator backend failed to initialize within its deadline.

    Raised by the boot-time device preflight: on a network-attached
    (tunneled) device, backend init is a handshake RPC that can block
    FOREVER when the transport is wedged — observed live as a server
    boot hung >10 min with zero log output, before any warmup deadline
    could arm. Failing loudly here is the recoverable posture: the
    operator restarts the tunnel (or sets JAX_PLATFORMS=cpu) instead of
    staring at a silent process."""
