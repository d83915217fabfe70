"""Wire models for the SDK (reference sdks/python/cortex_memory/models.py)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class NodeData:
    id: str
    kind: str
    title: str
    body: str = ""
    tags: List[str] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)
    importance: float = 0.5
    agent: Optional[str] = None
    created_at: Optional[float] = None
    updated_at: Optional[float] = None

    @staticmethod
    def from_wire(d: Dict[str, Any]) -> "NodeData":
        data = d.get("data", d)
        source = d.get("source") or {}
        return NodeData(
            id=d.get("id", ""),
            kind=d.get("kind", ""),
            title=data.get("title", d.get("title", "")),
            body=data.get("body", d.get("body", "")),
            tags=list(data.get("tags", d.get("tags", []) or [])),
            metadata=dict(data.get("metadata", d.get("metadata", {}) or {})),
            importance=float(d.get("importance", 0.5)),
            agent=source.get("agent"),
            created_at=d.get("created_at"),
            updated_at=d.get("updated_at"),
        )


@dataclass
class SearchHit:
    score: float
    node: NodeData
    vector_score: Optional[float] = None
    graph_score: Optional[float] = None

    @staticmethod
    def from_wire(d: Dict[str, Any]) -> "SearchHit":
        return SearchHit(
            score=float(d.get("score", d.get("combined_score", 0.0))),
            node=NodeData.from_wire(d.get("node", d)),
            vector_score=d.get("vector_score"),
            graph_score=d.get("graph_score"),
        )


@dataclass
class Briefing:
    agent_id: str
    text: str
    sections: List[Dict[str, Any]] = field(default_factory=list)
    generated_at: Optional[float] = None


@dataclass
class TraversalResult:
    nodes: List[NodeData] = field(default_factory=list)
    edges: List[Dict[str, Any]] = field(default_factory=list)
    truncated: bool = False

    @staticmethod
    def from_wire(d: Dict[str, Any]) -> "TraversalResult":
        return TraversalResult(
            nodes=[NodeData.from_wire(n) for n in d.get("nodes", [])],
            edges=list(d.get("edges", [])),
            truncated=bool(d.get("truncated", False)),
        )
