"""Hermetic test fake for agent code using the SDK.

Parity: reference sdks/python/cortex_memory/testing.py:35-60+ —
``MockCortex`` is an in-memory fake with substring-match "search"
(no embeddings, no server) plus ``mock_cortex()`` context manager.
"""

from __future__ import annotations

import contextlib
import itertools
import time
from typing import Any, Dict, List, Optional, Sequence

from .models import Briefing, NodeData, SearchHit, TraversalResult

_counter = itertools.count(1)


class MockCortex:
    """Duck-types the ``Cortex`` client for tests. Search is substring
    match over title+body+tags, ranked by importance."""

    def __init__(self):
        self.nodes: Dict[str, NodeData] = {}
        self.edges: List[Dict[str, Any]] = []
        self.briefings: Dict[str, str] = {}
        self.calls: List[tuple] = []       # (method, args) for assertions

    # ---------------------------------------------------------------- store
    def store(self, kind: str, title: str, body: str = "", *,
              importance: float = 0.5, tags: Optional[List[str]] = None,
              metadata: Optional[Dict[str, Any]] = None,
              agent: Optional[str] = None, gate: bool = False) -> str:
        nid = f"mock-{next(_counter):08d}"
        self.nodes[nid] = NodeData(
            id=nid, kind=kind, title=title, body=body or title,
            tags=tags or [], metadata=metadata or {},
            importance=importance, agent=agent,
            created_at=time.time(), updated_at=time.time())
        self.calls.append(("store", (kind, title)))
        return nid

    def get_node(self, node_id: str) -> Optional[NodeData]:
        return self.nodes.get(node_id)

    def delete_node(self, node_id: str) -> bool:
        return self.nodes.pop(node_id, None) is not None

    def relate(self, from_id: str, to_id: str, relation: str,
               weight: float = 0.5) -> str:
        eid = f"mock-edge-{next(_counter):08d}"
        self.edges.append({"id": eid, "from": from_id, "to": to_id,
                           "relation": relation, "weight": weight})
        return eid

    # --------------------------------------------------------------- search
    def search(self, query: str, limit: int = 10) -> List[SearchHit]:
        self.calls.append(("search", (query,)))
        terms = [t for t in query.lower().split() if t]
        hits = []
        for n in self.nodes.values():
            hay = f"{n.title} {n.body} {' '.join(n.tags)}".lower()
            matched = sum(1 for t in terms if t in hay)
            if matched:
                hits.append(SearchHit(
                    score=matched / len(terms) * (0.5 + n.importance / 2),
                    node=n))
        hits.sort(key=lambda h: -h.score)
        return hits[:limit]

    def search_hybrid(self, query: str, anchors: Sequence[str] = (),
                      limit: int = 10,
                      vector_weight: float = 0.7) -> List[SearchHit]:
        hits = self.search(query, limit)
        anchor_set = set(anchors)
        neighbor_ids = {e["to"] for e in self.edges
                        if e["from"] in anchor_set} | \
                       {e["from"] for e in self.edges
                        if e["to"] in anchor_set}
        out = []
        for h in hits:
            g = 0.5 if h.node.id in neighbor_ids else \
                (1.0 if h.node.id in anchor_set else 0.0)
            out.append(SearchHit(
                score=vector_weight * h.score + (1 - vector_weight) * g,
                node=h.node, vector_score=h.score, graph_score=g))
        out.sort(key=lambda h: -h.score)
        return out

    # ------------------------------------------------------------- briefing
    def briefing(self, agent_id: str, *, compact: bool = False) -> str:
        if agent_id in self.briefings:
            return self.briefings[agent_id]
        lines = [f"# Briefing for {agent_id}", ""]
        for n in sorted(self.nodes.values(),
                        key=lambda n: -n.importance)[:10]:
            lines.append(f"- [{n.kind}] {n.title}")
        return "\n".join(lines)

    def briefing_full(self, agent_id: str) -> Briefing:
        return Briefing(agent_id=agent_id, text=self.briefing(agent_id),
                        generated_at=time.time())

    # ---------------------------------------------------------------- graph
    def traverse(self, start: str, depth: int = 2) -> TraversalResult:
        seen = {start}
        frontier = {start}
        edges_out = []
        for _ in range(depth):
            nxt = set()
            for e in self.edges:
                if e["from"] in frontier and e["to"] not in seen:
                    nxt.add(e["to"])
                    edges_out.append(e)
                elif e["to"] in frontier and e["from"] not in seen:
                    nxt.add(e["from"])
                    edges_out.append(e)
            seen |= nxt
            frontier = nxt
        return TraversalResult(
            nodes=[self.nodes[i] for i in seen if i in self.nodes],
            edges=edges_out)

    def stats(self) -> Dict[str, Any]:
        by_kind: Dict[str, int] = {}
        for n in self.nodes.values():
            by_kind[n.kind] = by_kind.get(n.kind, 0) + 1
        return {"node_count": len(self.nodes),
                "edge_count": len(self.edges), "nodes_by_kind": by_kind}

    def close(self) -> None:
        pass


@contextlib.contextmanager
def mock_cortex():
    """``with mock_cortex() as cx: ...`` (reference testing.py ctx mgr)."""
    yield MockCortex()
