"""MCP stdio server tests — drives the JSON-RPC loop with literal
frames (the reference's hand-rolled MCP test pattern,
mcp/mod.rs:1343-1428).
"""

import io
import json

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.server.mcp import LocalBackend, McpServer, TOOLS


@pytest.fixture
def server():
    cx = Cortex.in_memory()
    return McpServer(LocalBackend(cx)), cx


def rpc(server, method, params=None, mid=1):
    return server.handle({"jsonrpc": "2.0", "id": mid, "method": method,
                          "params": params or {}})


def call_tool(server, name, arguments):
    resp = rpc(server, "tools/call", {"name": name, "arguments": arguments})
    assert "result" in resp, resp
    result = resp["result"]
    text = result["content"][0]["text"]
    return result["isError"], text


class TestProtocol:
    def test_initialize(self, server):
        srv, _ = server
        resp = rpc(srv, "initialize")
        assert resp["result"]["serverInfo"]["name"] == "cortex-tpu"
        assert "tools" in resp["result"]["capabilities"]

    def test_tools_list(self, server):
        srv, _ = server
        resp = rpc(srv, "tools/list")
        names = [t["name"] for t in resp["result"]["tools"]]
        assert names == ["cortex_store", "cortex_search", "cortex_recall",
                         "cortex_briefing", "cortex_traverse",
                         "cortex_relate", "cortex_observe"]
        for t in TOOLS:
            assert t["inputSchema"]["type"] == "object"

    def test_unknown_method(self, server):
        srv, _ = server
        resp = rpc(srv, "bogus/method")
        assert resp["error"]["code"] == -32601

    def test_notification_no_response(self, server):
        srv, _ = server
        assert srv.handle({"jsonrpc": "2.0",
                           "method": "notifications/initialized"}) is None

    def test_stdio_loop(self, server):
        srv, _ = server
        frames = [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize"},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            "not json at all",
            {"jsonrpc": "2.0", "id": 3, "method": "ping"},
        ]
        stdin = io.StringIO("\n".join(
            f if isinstance(f, str) else json.dumps(f) for f in frames))
        stdout = io.StringIO()
        srv.run(stdin, stdout)
        lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
        assert len(lines) == 4   # 3 responses + 1 parse error
        assert lines[0]["id"] == 1
        assert lines[2]["error"]["code"] == -32700
        assert lines[3]["id"] == 3


class TestTools:
    def test_store_search_roundtrip(self, server):
        srv, cx = server
        err, text = call_tool(srv, "cortex_store", {
            "kind": "fact", "title": "MCP stored this fact",
            "body": "The MCP tool surface persists memories.",
            "tags": ["mcp"]})
        assert not err
        nid = json.loads(text)["id"]
        assert cx.get_node(nid) is not None
        err, text = call_tool(srv, "cortex_search",
                              {"query": "MCP persists memories"})
        assert not err
        hits = json.loads(text)
        assert hits and hits[0]["id"] == nid

    def test_relate_and_traverse(self, server):
        srv, cx = server
        _, t1 = call_tool(srv, "cortex_store", {
            "kind": "decision", "title": "Choose JSON-RPC for MCP",
            "body": "Decision to use stdio JSON-RPC framing."})
        _, t2 = call_tool(srv, "cortex_store", {
            "kind": "event", "title": "MCP server implemented",
            "body": "The MCP server shipped with 7 tools."})
        id1, id2 = json.loads(t1)["id"], json.loads(t2)["id"]
        err, _ = call_tool(srv, "cortex_relate", {
            "from_id": id1, "to_id": id2, "relation": "led_to",
            "weight": 0.8})
        assert not err
        err, text = call_tool(srv, "cortex_traverse",
                              {"start": id1, "depth": 1})
        sub = json.loads(text)
        assert len(sub["nodes"]) == 2
        assert sub["edges"][0]["relation"] == "led_to"

    def test_recall_hybrid(self, server):
        srv, cx = server
        _, t = call_tool(srv, "cortex_store", {
            "kind": "fact", "title": "Anchor fact for hybrid recall",
            "body": "This node anchors the graph proximity side."})
        anchor = json.loads(t)["id"]
        call_tool(srv, "cortex_store", {
            "kind": "fact", "title": "Neighbor fact about recall",
            "body": "Connected to the anchor through an edge."})
        err, text = call_tool(srv, "cortex_recall", {
            "query": "hybrid recall anchors", "anchors": [anchor]})
        assert not err
        results = json.loads(text)
        assert results and "combined_score" in results[0]

    def test_briefing(self, server):
        srv, cx = server
        cx.store(Cortex.agent("scout", "A research agent profile"))
        err, text = call_tool(srv, "cortex_briefing", {"agent_id": "scout"})
        assert not err
        assert "scout" in text.lower() or "briefing" in text.lower()

    def test_observe(self, server):
        srv, cx = server
        cx.store(Cortex.agent("scout", "A research agent profile"))
        from cortex_tpu.prompt import PromptContent
        pid = cx.prompts.create_prompt(PromptContent(slug="scout-persona"))
        err, text = call_tool(srv, "cortex_observe", {
            "agent": "scout", "variant_id": pid,
            "sentiment_score": 0.9, "task_outcome": "success"})
        assert not err
        d = json.loads(text)
        assert d["score"] > 0.5
        # edges created
        edges = cx.storage.edges_to(pid)
        assert any(e.relation == "observed_with" for e in edges)

    def test_tool_error_is_result(self, server):
        srv, _ = server
        err, text = call_tool(srv, "cortex_traverse", {"start": "missing"})
        # traverse of a missing node returns empty, not an error
        assert not err or "error" in text
        err, text = call_tool(srv, "cortex_observe", {
            "agent": "ghost", "variant_id": "x"})
        assert err and "not found" in text

    def test_unknown_tool(self, server):
        srv, _ = server
        resp = rpc(srv, "tools/call", {"name": "nope", "arguments": {}})
        assert "error" in resp


class TestResources:
    def test_list_and_read(self, server):
        srv, cx = server
        resp = rpc(srv, "resources/list")
        uris = [r["uri"] for r in resp["result"]["resources"]]
        assert "cortex://stats" in uris
        _, t = call_tool(srv, "cortex_store", {
            "kind": "fact", "title": "Resource read target",
            "body": "Read back through the resource URI."})
        nid = json.loads(t)["id"]
        resp = rpc(srv, "resources/read", {"uri": "cortex://stats"})
        stats = json.loads(resp["result"]["contents"][0]["text"])
        assert stats["node_count"] == 1
        resp = rpc(srv, "resources/read", {"uri": f"cortex://node/{nid}"})
        node = json.loads(resp["result"]["contents"][0]["text"])
        assert node["title"] == "Resource read target"

    def test_unknown_resource(self, server):
        srv, _ = server
        resp = rpc(srv, "resources/read", {"uri": "cortex://nope"})
        assert "error" in resp


class TestReferenceEdgeCases:
    """Remaining mcp/mod.rs in-file cases: store without required
    fields, stats/briefing on an empty graph."""

    def test_store_missing_title_is_error(self, server):
        srv, _ = server
        err, text = call_tool(srv, "cortex_store", {"kind": "fact"})
        assert err
        assert "title" in text.lower() or "required" in text.lower() \
            or "missing" in text.lower()

    def test_stats_empty_graph(self, server):
        srv, _ = server
        resp = rpc(srv, "resources/read", {"uri": "cortex://stats"})
        stats = json.loads(resp["result"]["contents"][0]["text"])
        assert stats["node_count"] == 0 and stats["edge_count"] == 0

    def test_briefing_empty_graph(self, server):
        """No agent node, nothing stored: the briefing must still
        return (global fallback), not error."""
        srv, _ = server
        err, text = call_tool(srv, "cortex_briefing", {"agent_id": "ghost"})
        assert not err
        assert isinstance(text, str) and len(text) > 0
