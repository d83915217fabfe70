"""MCP server: stdio JSON-RPC for agent tool access.

Parity: cortex-server/src/mcp/mod.rs:23,135-360,965-1331 — 7 tools
(cortex_store, cortex_search, cortex_recall, cortex_briefing,
cortex_traverse, cortex_relate, cortex_observe) + resources
`cortex://stats` and `cortex://node/{id}`. Two modes:
**local** = embedded Cortex library on a data dir (the reference's
cortex_core::Cortex local mode); **remote** = proxy to a running
server over HTTP. Logging goes to stderr so stdout stays clean for
JSON-RPC frames (main.rs:127).
"""

from __future__ import annotations

import json
import sys
from typing import Any, Callable, Dict, List, Optional

from ..graph import BOTH, TraversalRequest
from ..storage.base import NodeFilter
from ..types import Edge, EdgeProvenance, Node, Source

PROTOCOL_VERSION = "2024-11-05"
from .. import __version__ as _pkg_version

SERVER_INFO = {"name": "cortex-tpu", "version": _pkg_version}


def _tool(name: str, description: str, props: Dict[str, Any],
          required: List[str]) -> Dict[str, Any]:
    return {"name": name, "description": description,
            "inputSchema": {"type": "object", "properties": props,
                            "required": required}}


TOOLS = [
    _tool("cortex_store",
          "Store a memory (fact, decision, event, observation, ...) in "
          "the graph. Returns the node id.",
          {"kind": {"type": "string"},
           "title": {"type": "string"},
           "body": {"type": "string"},
           "importance": {"type": "number"},
           "tags": {"type": "array", "items": {"type": "string"}}},
          ["kind", "title"]),
    _tool("cortex_search",
          "Semantic search over stored memories. Returns ranked nodes.",
          {"query": {"type": "string"},
           "limit": {"type": "integer"},
           "kind": {"type": "string"}},
          ["query"]),
    _tool("cortex_recall",
          "Hybrid recall: semantic similarity fused with graph proximity "
          "to anchor nodes.",
          {"query": {"type": "string"},
           "anchors": {"type": "array", "items": {"type": "string"}},
           "limit": {"type": "integer"}},
          ["query"]),
    _tool("cortex_briefing",
          "Generate the synthesized context briefing for an agent.",
          {"agent_id": {"type": "string"},
           "compact": {"type": "boolean"}},
          ["agent_id"]),
    _tool("cortex_traverse",
          "Traverse the graph from a start node.",
          {"start": {"type": "string"},
           "depth": {"type": "integer"},
           "direction": {"type": "string",
                         "enum": ["outgoing", "incoming", "both"]}},
          ["start"]),
    _tool("cortex_relate",
          "Create a typed edge between two nodes.",
          {"from_id": {"type": "string"},
           "to_id": {"type": "string"},
           "relation": {"type": "string"},
           "weight": {"type": "number"}},
          ["from_id", "to_id", "relation"]),
    _tool("cortex_observe",
          "Record an observation about an agent's performance with a "
          "prompt variant.",
          {"agent": {"type": "string"},
           "variant_id": {"type": "string"},
           "sentiment_score": {"type": "number"},
           "correction_count": {"type": "integer"},
           "task_outcome": {"type": "string"}},
          ["agent", "variant_id"]),
]


def _node_summary(n: Node, score: Optional[float] = None) -> Dict[str, Any]:
    d = {"id": n.id, "kind": n.kind, "title": n.title, "body": n.body,
         "tags": n.tags, "importance": n.importance,
         "created_at": n.created_at}
    if score is not None:
        d["score"] = round(float(score), 4)
    return d


class LocalBackend:
    """Embedded-library mode (mcp/mod.rs local mode)."""

    def __init__(self, cortex):
        self.cx = cortex

    def store(self, a: Dict[str, Any]) -> Any:
        n = Node.new(a["kind"], a["title"], a.get("body", a["title"]),
                     Source(agent=a.get("agent", "mcp")),
                     float(a.get("importance", 0.5)))
        n.tags = list(a.get("tags", []))
        # ONE admission pipeline for every surface: the MCP tool runs
        # the same 4-check gate + schema validation HTTP/gRPC enforce
        # (a GateRejection propagates as the tool error)
        self.cx.store(n, gate=True, actor="mcp")
        return {"id": n.id}

    def search(self, a: Dict[str, Any]) -> Any:
        from ..vector import VectorFilter
        flt = VectorFilter(kinds=[a["kind"]]) if a.get("kind") else None
        hits = self.cx.search(a["query"], int(a.get("limit", 10)), flt=flt)
        return [_node_summary(n, s) for s, n in hits]

    def recall(self, a: Dict[str, Any]) -> Any:
        results = self.cx.search_hybrid(
            a["query"], a.get("anchors", []), int(a.get("limit", 10)))
        return [{"id": r.node.id, "kind": r.node.kind,
                 "title": r.node.title,
                 "combined_score": round(r.combined_score, 4),
                 "vector_score": round(r.vector_score, 4),
                 "graph_score": round(r.graph_score, 4)} for r in results]

    def briefing(self, a: Dict[str, Any]) -> Any:
        return self.cx.briefing(a["agent_id"],
                                compact=bool(a.get("compact", False)))

    def traverse(self, a: Dict[str, Any]) -> Any:
        from ..graph import INCOMING, OUTGOING
        direction = {"outgoing": OUTGOING, "incoming": INCOMING,
                     "both": BOTH}.get(a.get("direction", "outgoing"),
                                       BOTH)
        sub = self.cx.traverse(TraversalRequest(
            start=[a["start"]], max_depth=int(a.get("depth", 2)),
            direction=direction))
        return {"nodes": [_node_summary(n) for n in sub.nodes.values()],
                "edges": [{"from": e.from_id, "to": e.to_id,
                           "relation": e.relation, "weight": e.weight}
                          for e in sub.edges],
                "truncated": sub.truncated}

    def relate(self, a: Dict[str, Any]) -> Any:
        e = Edge.new(a["from_id"], a["to_id"], a["relation"],
                     float(a.get("weight", 0.5)),
                     EdgeProvenance.manual("mcp"))
        self.cx.create_edge(e)
        return {"id": e.id}

    def observe(self, a: Dict[str, Any]) -> Any:
        import time
        from ..prompt import observation_score
        agent_name = a["agent"]
        agent = None
        for n in self.cx.list_nodes(NodeFilter(kinds=["agent"])):
            if n.title == agent_name or n.source.agent == agent_name:
                agent = n
                break
        if agent is None:
            raise ValueError(f"agent '{agent_name}' not found")
        sentiment = min(1.0, max(0.0,
                                 float(a.get("sentiment_score", 0.5))))
        corrections = int(a.get("correction_count", 0))
        outcome = a.get("task_outcome", "unknown")
        score = observation_score(sentiment, corrections, outcome)
        obs = Node.new("observation",
                       f"obs:{agent_name}:{int(time.time())}",
                       json.dumps({"agent": agent_name,
                                   "observation_type": "performance"}),
                       Source(agent=agent_name), 0.4)
        obs.metadata = {"observation_type": "performance",
                        "variant_id": a["variant_id"],
                        "observation_score": score,
                        "sentiment_score": sentiment,
                        "correction_count": corrections,
                        "task_outcome": outcome}
        self.cx.store(obs)
        variant_id = a["variant_id"]
        from ..errors import DuplicateEdge, InvalidEdge
        for from_id, to_id, rel, w in [
                (agent.id, obs.id, "performed", 1.0),
                (obs.id, variant_id, "informed_by", 1.0),
                (obs.id, variant_id, "observed_with", score),
                (obs.id, agent.id, "observed_by", 1.0)]:
            try:
                self.cx.create_edge(Edge.new(
                    from_id, to_id, rel, w,
                    EdgeProvenance.manual(agent_name)))
            except (DuplicateEdge, InvalidEdge):
                pass
        # same selection/rollback bookkeeping as the HTTP observe path
        # (http.py observe handler): the EMA on the uses edge, the
        # active-variant marker, and the rollback monitor — without
        # these, MCP-driven observations never influence variant
        # selection and a degraded prompt never auto-rolls back
        from ..prompt import update_edge_weight
        old_w = new_w = None
        for e in self.cx.storage.edges_from(agent.id):
            if e.relation == "uses" and e.to_id == variant_id:
                old_w = e.weight
                new_w = update_edge_weight(e.weight, score)
                self.cx.storage.update_edge_weight_atomic(e.id, new_w)
                break
        agent.metadata["active_variant_id"] = variant_id
        self.cx.storage.put_node(agent)
        cr = min(corrections * 0.1, 1.0)
        rb = self.cx.rollback_monitor.process_observation(
            obs.id, variant_id, cr, sentiment, score)
        return {"observation_id": obs.id, "score": round(score, 4),
                "old_weight": old_w, "new_weight": new_w,
                "rollback": None if rb is None else {
                    "trigger": rb.trigger.kind,
                    "to_version": rb.to_version,
                    "is_quarantined": rb.is_quarantined}}

    def stats(self) -> Any:
        s = self.cx.stats()
        return {"node_count": s.node_count, "edge_count": s.edge_count,
                "nodes_by_kind": s.nodes_by_kind}

    def get_node(self, node_id: str) -> Any:
        n = self.cx.get_node(node_id)
        if n is None:
            raise ValueError(f"node {node_id} not found")
        return _node_summary(n)


class RemoteBackend:
    """HTTP-proxy mode against a running server (mcp remote mode +
    the Node.js bridge's REST proxying)."""

    def __init__(self, base_url: str, token: Optional[str] = None):
        self.base = base_url.rstrip("/")
        self.token = token

    @staticmethod
    def _seg(ident: Any) -> str:
        """Percent-encode a caller-supplied id used as ONE path
        segment — spaces/'/'/'?' would otherwise produce a malformed
        request line or resolve to a different route."""
        import urllib.parse
        return urllib.parse.quote(str(ident), safe="")

    def _req(self, method: str, path: str, params=None, body=None) -> Any:
        import urllib.error
        import urllib.parse
        import urllib.request
        url = self.base + path
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None})
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("content-type", "application/json")
        if self.token:
            req.add_header("authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            payload = json.loads(e.read().decode())
            raise ValueError(payload.get("error", f"HTTP {e.code}"))
        if not payload.get("ok", True):
            raise ValueError(payload.get("error", "request failed"))
        return payload.get("data", payload)

    def store(self, a):
        return {"id": self._req("POST", "/nodes", body={
            "kind": a["kind"], "title": a["title"],
            "body": a.get("body", a["title"]),
            "importance": a.get("importance", 0.5),
            "tags": a.get("tags", [])})["id"]}

    def search(self, a):
        return self._req("GET", "/search", params={
            "q": a["query"], "limit": a.get("limit", 10),
            "kind": a.get("kind")})

    def recall(self, a):
        return self._req("GET", "/search/hybrid", params={
            "q": a["query"], "anchors": ",".join(a.get("anchors", [])),
            "limit": a.get("limit", 10)})

    def briefing(self, a):
        d = self._req("GET", f"/briefing/{self._seg(a['agent_id'])}",
                      params={
            "format": "json",
            "compact": "true" if a.get("compact") else None})
        return d.get("text", "") if isinstance(d, dict) else str(d)

    def traverse(self, a):
        return self._req(
            "GET", f"/nodes/{self._seg(a['start'])}/neighbors", params={
            "depth": a.get("depth", 2),
            "direction": a.get("direction", "outgoing")})

    def relate(self, a):
        return self._req("POST", "/edges", body={
            "from": a["from_id"], "to": a["to_id"],
            "relation": a["relation"], "weight": a.get("weight", 0.5)})

    def observe(self, a):
        return self._req(
            "POST", f"/agents/{self._seg(a['agent'])}/observe", body={
            "variant_id": a["variant_id"],
            "sentiment_score": a.get("sentiment_score", 0.5),
            "correction_count": a.get("correction_count", 0),
            "task_outcome": a.get("task_outcome", "unknown")})

    def stats(self):
        return self._req("GET", "/stats")

    def get_node(self, node_id):
        return self._req("GET", f"/nodes/{self._seg(node_id)}")


class McpServer:
    """JSON-RPC 2.0 request dispatcher over line-delimited stdio."""

    def __init__(self, backend):
        self.backend = backend
        self.tool_fns: Dict[str, Callable] = {
            "cortex_store": backend.store,
            "cortex_search": backend.search,
            "cortex_recall": backend.recall,
            "cortex_briefing": backend.briefing,
            "cortex_traverse": backend.traverse,
            "cortex_relate": backend.relate,
            "cortex_observe": backend.observe,
        }

    # ------------------------------------------------------------ dispatch
    def handle(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        mid = msg.get("id")
        method = msg.get("method", "")
        try:
            if method == "initialize":
                result = {"protocolVersion": PROTOCOL_VERSION,
                          "capabilities": {"tools": {}, "resources": {}},
                          "serverInfo": SERVER_INFO}
            elif method in ("notifications/initialized", "initialized"):
                return None
            elif method == "ping":
                result = {}
            elif method == "tools/list":
                result = {"tools": TOOLS}
            elif method == "tools/call":
                result = self._call_tool(msg.get("params", {}))
            elif method == "resources/list":
                result = {"resources": [
                    {"uri": "cortex://stats", "name": "Store statistics",
                     "mimeType": "application/json"},
                    {"uri": "cortex://node/{id}", "name": "Node by id",
                     "mimeType": "application/json"}]}
            elif method == "resources/read":
                result = self._read_resource(msg.get("params", {}))
            else:
                if mid is None:
                    return None     # unknown notification: ignore
                return self._error(mid, -32601,
                                   f"method not found: {method}")
            if mid is None:
                return None
            return {"jsonrpc": "2.0", "id": mid, "result": result}
        except Exception as e:  # noqa: BLE001 — protocol must answer
            if mid is None:
                return None
            return self._error(mid, -32000, str(e))

    def _call_tool(self, params: Dict[str, Any]) -> Dict[str, Any]:
        name = params.get("name", "")
        fn = self.tool_fns.get(name)
        if fn is None:
            raise ValueError(f"unknown tool: {name}")
        try:
            out = fn(params.get("arguments", {}))
            text = out if isinstance(out, str) else json.dumps(out,
                                                               default=str)
            return {"content": [{"type": "text", "text": text}],
                    "isError": False}
        except Exception as e:  # noqa: BLE001 — tool errors are results
            return {"content": [{"type": "text", "text": f"error: {e}"}],
                    "isError": True}

    def _read_resource(self, params: Dict[str, Any]) -> Dict[str, Any]:
        uri = params.get("uri", "")
        if uri == "cortex://stats":
            data = self.backend.stats()
        elif uri.startswith("cortex://node/"):
            data = self.backend.get_node(uri[len("cortex://node/"):])
        else:
            raise ValueError(f"unknown resource: {uri}")
        return {"contents": [{"uri": uri, "mimeType": "application/json",
                              "text": json.dumps(data, default=str)}]}

    @staticmethod
    def _error(mid, code: int, message: str) -> Dict[str, Any]:
        return {"jsonrpc": "2.0", "id": mid,
                "error": {"code": code, "message": message}}

    # --------------------------------------------------------------- loop
    def run(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                resp = self._error(None, -32700, "parse error")
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
                continue
            resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp, default=str) + "\n")
                stdout.flush()


def run_stdio(config, remote: Optional[str] = None,
              data_dir: Optional[str] = None) -> None:
    """CLI entry (`cortex mcp`). Remote if --server given, else local
    embedded on the data dir."""
    import logging
    import os
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    if remote:
        token = os.environ.get("CORTEX_AUTH_TOKEN") \
            or config.security.auth_token
        backend = RemoteBackend(remote, token)
        McpServer(backend).run()
        return
    from ..api import open_embedded
    if data_dir:
        config.server.data_dir = data_dir
    cortex, guard = open_embedded(config)   # honors encryption_at_rest
    try:
        McpServer(LocalBackend(cortex)).run()
    finally:
        cortex.close()
        if guard is not None:
            guard.close()
