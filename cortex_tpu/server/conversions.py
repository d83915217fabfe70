"""proto <-> core type conversions.

Role parity: cortex-server/src/grpc/conversions.rs (444 LoC, 18 in-file
tests) — timestamps (epoch-second doubles here), provenance flattening,
subgraph/path/briefing mapping.
"""

from __future__ import annotations

import json
from typing import List

from ..graph.subgraph import Subgraph
from ..graph.types import Path
from ..types import Edge, EdgeProvenance, Node, Source
from . import cortex_pb2 as pb


def node_to_pb(n: Node) -> pb.Node:
    return pb.Node(
        id=n.id, kind=n.kind, title=n.title, body=n.body,
        metadata_json=json.dumps(n.metadata), tags=list(n.tags),
        source_agent=n.source.agent,
        source_session=n.source.session or "",
        source_channel=n.source.channel or "",
        importance=n.importance, access_count=n.access_count,
        last_accessed_at=n.last_accessed_at, created_at=n.created_at,
        updated_at=n.updated_at, deleted=n.deleted)


def node_from_pb(p: pb.Node) -> Node:
    return Node(
        id=p.id, kind=p.kind, title=p.title, body=p.body,
        metadata=json.loads(p.metadata_json) if p.metadata_json else {},
        tags=list(p.tags),
        source=Source(agent=p.source_agent,
                      session=p.source_session or None,
                      channel=p.source_channel or None),
        importance=p.importance, access_count=p.access_count,
        last_accessed_at=p.last_accessed_at, created_at=p.created_at,
        updated_at=p.updated_at, deleted=p.deleted)


def edge_to_pb(e: Edge) -> pb.Edge:
    prov = e.provenance
    detail = prov.created_by or prov.rule or prov.reason or prov.source or ""
    score = prov.score if prov.score is not None else \
        (prov.similarity if prov.similarity is not None else 0.0)
    return pb.Edge(
        id=e.id, from_id=e.from_id, to_id=e.to_id, relation=e.relation,
        weight=e.weight, provenance_kind=prov.kind,
        provenance_detail=detail, provenance_score=score,
        created_at=e.created_at, updated_at=e.updated_at)


def provenance_from_pb(kind: str, detail: str,
                       score: float) -> EdgeProvenance:
    if kind == EdgeProvenance.AUTO_SIMILARITY:
        return EdgeProvenance.auto_similarity(score)
    if kind == EdgeProvenance.AUTO_STRUCTURAL:
        return EdgeProvenance.auto_structural(detail)
    if kind == EdgeProvenance.AUTO_CONTRADICTION:
        return EdgeProvenance.auto_contradiction(detail)
    if kind == EdgeProvenance.AUTO_DEDUP:
        return EdgeProvenance.auto_dedup(score)
    if kind == EdgeProvenance.IMPORTED:
        return EdgeProvenance.imported(detail)
    return EdgeProvenance.manual(detail or "grpc")


def subgraph_to_pb(sub: Subgraph) -> pb.SubgraphResponse:
    return pb.SubgraphResponse(
        nodes=[node_to_pb(n) for n in sub.nodes.values()],
        edges=[edge_to_pb(e) for e in sub.edges],
        depths=[pb.DepthEntry(node_id=i, depth=d)
                for i, d in sub.depths.items()],
        visited_count=sub.visited_count, truncated=sub.truncated)


def paths_to_pb(paths: List[Path]) -> pb.PathsResponse:
    return pb.PathsResponse(paths=[
        pb.Path(nodes=p.nodes, edges=p.edges, total_weight=p.total_weight,
                length=p.length) for p in paths])


def parse_direction(s: str) -> str:
    """Lenient direction parsing (conversions.rs:83-90): known values
    case-insensitively, anything else — including empty — is `both`."""
    v = (s or "").lower()
    return v if v in ("outgoing", "incoming", "both") else "both"


def parse_strategy(s: str) -> str:
    """Lenient strategy parsing (conversions.rs:93-100): unknown or
    empty falls back to `bfs`, never an error."""
    v = (s or "").lower()
    return v if v in ("bfs", "dfs", "weighted") else "bfs"
