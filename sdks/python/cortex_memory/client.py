"""Cortex SDK client.

Parity: reference sdks/python/cortex_memory/client.py:12-217 — API:
store / search / search_hybrid / briefing / briefing_full / get_node /
traverse, plus relate / delete / stats. Remote transport is REST
(stdlib urllib, zero deps); ``Cortex.open(path)`` runs the engine
in-process instead of spawning a server on a free port (the engine is
Python here, so library mode needs no subprocess).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

from .models import Briefing, NodeData, SearchHit, TraversalResult


class CortexClientError(Exception):
    def __init__(self, message: str, status: Optional[int] = None):
        super().__init__(message)
        self.status = status


class Cortex:
    """Client for a running cortex server (REST) or an embedded engine.

    >>> cx = Cortex("http://localhost:9091")          # remote
    >>> cx = Cortex.open("./memory")                   # embedded
    """

    def __init__(self, addr: Optional[str] = None, *,
                 token: Optional[str] = None,
                 timeout: float = 30.0,
                 _embedded=None):
        self._embedded = _embedded
        self.addr = addr.rstrip("/") if addr else None
        self.token = token or os.environ.get("CORTEX_AUTH_TOKEN")
        self.timeout = timeout
        if self._embedded is None and not self.addr:
            raise CortexClientError("addr required (or use Cortex.open)")

    # ------------------------------------------------------------ lifecycle
    @staticmethod
    def open(path: str, config=None) -> "Cortex":
        """Embedded library mode: the engine runs in-process on a local
        data directory (reference client.py Cortex.open)."""
        from cortex_tpu.api import Cortex as Engine
        if path.endswith(".db"):
            # file form: create the PARENT, never a directory named
            # like the db file (makedirs(path) broke both the new-file
            # case — sqlite then can't open a directory — and the
            # existing-file case — FileExistsError)
            parent = os.path.dirname(os.path.abspath(path))
            os.makedirs(parent, exist_ok=True)
            db = path
        else:
            os.makedirs(path, exist_ok=True)
            db = os.path.join(path, "cortex.db")
        return Cortex(_embedded=Engine.open(db, config))

    def close(self) -> None:
        if self._embedded is not None:
            self._embedded.close()

    def __enter__(self) -> "Cortex":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------- plumbing
    def _request(self, method: str, path: str, *, params=None,
                 body=None, headers=None) -> Any:
        import urllib.error
        import urllib.parse
        import urllib.request
        url = self.addr + path
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None})
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("content-type", "application/json")
        if self.token:
            req.add_header("authorization", f"Bearer {self.token}")
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                payload = json.loads(e.read().decode())
                msg = payload.get("error", f"HTTP {e.code}")
            except Exception:
                msg = f"HTTP {e.code}"
            raise CortexClientError(msg, status=e.code) from None
        except urllib.error.URLError as e:
            raise CortexClientError(
                f"cannot reach {self.addr}: {e.reason}") from None
        if not payload.get("ok", False):
            raise CortexClientError(payload.get("error", "request failed"))
        return payload.get("data")

    # ---------------------------------------------------------------- store
    def store(self, kind: str, title: str, body: str = "", *,
              importance: float = 0.5, tags: Optional[List[str]] = None,
              metadata: Optional[Dict[str, Any]] = None,
              agent: Optional[str] = None, gate: bool = False) -> str:
        """Store a memory; returns the node id."""
        if self._embedded is not None:
            from cortex_tpu.types import Node, Source
            n = Node.new(kind, title, body or title,
                         Source(agent=agent or "sdk"), importance)
            n.tags = tags or []
            n.metadata = metadata or {}
            # match the REMOTE semantics exactly: the server always
            # runs the gate and gate=False only skips the quality
            # check (http.py gate=skip) — embedded gate=False
            # previously bypassed the whole gate, so code written
            # against embedded mode broke with 422s against a server
            return self._embedded.store(n, gate=True,
                                        skip_quality=not gate,
                                        actor="sdk")
        headers = {"x-agent-id": agent} if agent else {}
        d = self._request("POST", "/nodes", body={
            "kind": kind, "title": title, "body": body or title,
            "importance": importance, "tags": tags or [],
            "metadata": metadata or {}},
            params=None if gate else {"gate": "skip"},
            headers={**headers,
                     **({} if gate else {"x-gate-override": "true"})})
        return d["id"]

    def get_node(self, node_id: str) -> Optional[NodeData]:
        if self._embedded is not None:
            n = self._embedded.get_node(node_id)
            return None if n is None else NodeData.from_wire(n.to_dict())
        try:
            return NodeData.from_wire(self._request(
                "GET", f"/nodes/{node_id}"))
        except CortexClientError as e:
            if e.status == 404:
                return None
            raise

    def delete_node(self, node_id: str) -> bool:
        if self._embedded is not None:
            return self._embedded.delete_node(node_id)
        self._request("DELETE", f"/nodes/{node_id}")
        return True

    def relate(self, from_id: str, to_id: str, relation: str,
               weight: float = 0.5) -> str:
        if self._embedded is not None:
            from cortex_tpu.types import Edge, EdgeProvenance
            e = Edge.new(from_id, to_id, relation, weight,
                         EdgeProvenance.manual("sdk"))
            return self._embedded.create_edge(e)
        d = self._request("POST", "/edges", body={
            "from": from_id, "to": to_id, "relation": relation,
            "weight": weight})
        return d["id"]

    # --------------------------------------------------------------- search
    def search(self, query: str, limit: int = 10) -> List[SearchHit]:
        if self._embedded is not None:
            return [SearchHit(score=s, node=NodeData.from_wire(n.to_dict()))
                    for s, n in self._embedded.search(query, limit)]
        rows = self._request("GET", "/search",
                             params={"q": query, "limit": limit})
        return [SearchHit.from_wire(r) for r in rows]

    def search_hybrid(self, query: str, anchors: Sequence[str] = (),
                      limit: int = 10,
                      vector_weight: float = 0.7) -> List[SearchHit]:
        if self._embedded is not None:
            res = self._embedded.search_hybrid(
                query, anchors, limit, vector_weight=vector_weight)
            return [SearchHit(score=r.combined_score,
                              node=NodeData.from_wire(r.node.to_dict()),
                              vector_score=r.vector_score,
                              graph_score=r.graph_score) for r in res]
        rows = self._request("GET", "/search/hybrid", params={
            "q": query, "anchors": ",".join(anchors) or None,
            "limit": limit, "vector_weight": vector_weight})
        return [SearchHit.from_wire(r) for r in rows]

    # ------------------------------------------------------------- briefing
    def briefing(self, agent_id: str, *, compact: bool = False) -> str:
        if self._embedded is not None:
            return self._embedded.briefing(agent_id, compact=compact)
        # the text route returns raw markdown (no envelope); format=json
        # wraps it with metadata — use that for a parseable wire shape
        d = self._request("GET", f"/briefing/{agent_id}", params={
            "format": "json", "compact": "true" if compact else None})
        return d.get("text", "")

    def briefing_full(self, agent_id: str) -> Briefing:
        if self._embedded is not None:
            b = self._embedded.briefing_full(agent_id)
            return Briefing(
                agent_id=b.agent_id,
                text=self._embedded.briefing_engine.render(b),
                sections=[{"title": s.title,
                           "items": len(s.nodes)} for s in b.sections],
                generated_at=b.generated_at)
        d = self._request("GET", f"/briefing/{agent_id}",
                          params={"format": "json"})
        return Briefing(agent_id=d.get("agent_id", agent_id),
                        text=d.get("text", ""),
                        sections=d.get("sections", []),
                        generated_at=d.get("generated_at"))

    # --------------------------------------------------------------- graph
    def traverse(self, start: str, depth: int = 2) -> TraversalResult:
        if self._embedded is not None:
            sub = self._embedded.neighborhood(start, depth=depth)
            return TraversalResult(
                nodes=[NodeData.from_wire(n.to_dict())
                       for n in sub.nodes.values()],
                edges=[e.to_dict() for e in sub.edges],
                truncated=sub.truncated)
        d = self._request("GET", f"/nodes/{start}/neighbors",
                          params={"depth": depth})
        return TraversalResult.from_wire(d)

    def stats(self) -> Dict[str, Any]:
        if self._embedded is not None:
            s = self._embedded.stats()
            return {"node_count": s.node_count, "edge_count": s.edge_count,
                    "nodes_by_kind": s.nodes_by_kind}
        return self._request("GET", "/stats")
