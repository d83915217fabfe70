"""Python SDK tests: MockCortex semantics, embedded mode, and the REST
client against a real composed server (reference
sdks/python/tests/test_client.py model).
"""

import asyncio
import socket
import sys
import os

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "sdks", "python"))

from cortex_memory import (Cortex, CortexClientError, MockCortex,  # noqa: E402
                           mock_cortex)


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestMockCortex:
    def test_store_and_search_substring(self):
        with mock_cortex() as cx:
            nid = cx.store("fact", "Redis runs on port 6379",
                           "The cache layer uses redis.")
            hits = cx.search("redis cache")
            assert hits and hits[0].node.id == nid
            assert cx.search("nonexistent-term") == []

    def test_importance_ranks(self):
        cx = MockCortex()
        cx.store("fact", "shared keyword low", importance=0.1)
        hi = cx.store("fact", "shared keyword high", importance=0.9)
        hits = cx.search("shared keyword")
        assert hits[0].node.id == hi

    def test_relate_traverse(self):
        cx = MockCortex()
        a = cx.store("decision", "pick grpc")
        b = cx.store("event", "grpc shipped")
        cx.relate(a, b, "led_to", 0.8)
        res = cx.traverse(a, depth=1)
        assert {n.id for n in res.nodes} == {a, b}

    def test_briefing_and_stats(self):
        cx = MockCortex()
        cx.store("fact", "alpha")
        cx.briefings["bot"] = "canned briefing"
        assert cx.briefing("bot") == "canned briefing"
        assert "alpha" in cx.briefing("other")
        assert cx.stats()["node_count"] == 1

    def test_call_recording(self):
        cx = MockCortex()
        cx.store("fact", "x")
        cx.search("y")
        assert ("store", ("fact", "x")) in cx.calls
        assert ("search", ("y",)) in cx.calls


class TestEmbedded:
    def test_open_store_search_roundtrip(self, tmp_path):
        with Cortex.open(str(tmp_path / "mem")) as cx:
            nid = cx.store("fact", "Embedded SDK stores memories",
                           "Library mode runs the engine in-process.",
                           tags=["sdk"])
            n = cx.get_node(nid)
            assert n is not None and n.tags == ["sdk"]
            hits = cx.search("embedded library engine")
            assert hits and hits[0].node.id == nid
            a = cx.store("decision", "Adopt the embedded mode",
                         "Decision to prefer in-process embedding.")
            cx.relate(a, nid, "informed_by", 0.7)
            res = cx.traverse(a, depth=1)
            assert len(res.nodes) == 2
            assert cx.stats()["node_count"] == 2
        # durable across close/reopen
        with Cortex.open(str(tmp_path / "mem")) as cx2:
            assert cx2.stats()["node_count"] == 2

    def test_hybrid_and_briefing(self, tmp_path):
        with Cortex.open(str(tmp_path / "m2")) as cx:
            anchor = cx.store("fact", "Anchor memory about deployments",
                              "Deployment anchor for proximity.")
            cx.store("agent", "deployer", "Deployment agent profile",
                     agent="deployer")
            hits = cx.search_hybrid("deployments", anchors=[anchor])
            assert hits and hits[0].vector_score is not None
            text = cx.briefing("deployer")
            assert "deployer" in text.lower()


class TestRestClient:
    @pytest.fixture(scope="class")
    def live_server(self, tmp_path_factory):
        """Boot the composed server once for the class."""
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.server.serve import Server

        cfg = CortexConfig()
        cfg.server.data_dir = str(tmp_path_factory.mktemp("sdk") / "data")
        cfg.server.http_addr = f"127.0.0.1:{free_port()}"
        cfg.server.grpc_addr = f"127.0.0.1:{free_port()}"
        cfg.auto_linker.interval_secs = 3600

        loop = asyncio.new_event_loop()
        srv = Server(cfg)
        loop.run_until_complete(srv.start())
        import threading
        t = threading.Thread(target=loop.run_forever, daemon=True)
        t.start()
        yield f"http://{cfg.server.http_addr}"
        asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(10)
        loop.call_soon_threadsafe(loop.stop)
        t.join(5)

    def test_remote_roundtrip(self, live_server):
        cx = Cortex(live_server)
        nid = cx.store("fact", "Remote SDK round trip works",
                       "Stored through the REST client over the wire.")
        n = cx.get_node(nid)
        assert n is not None and "Remote SDK" in n.title
        hits = cx.search("remote round trip wire")
        assert hits and hits[0].node.id == nid
        other = cx.store("event", "SDK test event happened",
                         "An event emitted while testing the remote SDK.")
        cx.relate(nid, other, "led_to", 0.9)
        res = cx.traverse(nid, depth=1)
        assert len(res.nodes) == 2
        assert cx.stats()["node_count"] == 2
        hy = cx.search_hybrid("remote sdk", anchors=[nid])
        assert hy and hy[0].graph_score is not None

    def test_remote_briefing(self, live_server):
        """Regression: GET /briefing default returns raw markdown (no
        envelope); the client must request format=json."""
        cx = Cortex(live_server)
        cx.store("agent", "briefbot", "An agent profile for briefing.",
                 agent="briefbot")
        text = cx.briefing("briefbot")
        assert "briefbot" in text.lower()
        compact = cx.briefing("briefbot", compact=True)
        assert compact     # compact rendering also round-trips
        full = cx.briefing_full("briefbot")
        assert full.agent_id == "briefbot" and full.sections

    def test_embedded_briefing_full(self, tmp_path):
        """Regression: BriefingSection has .nodes, not .items."""
        with Cortex.open(str(tmp_path / "bf")) as cx:
            cx.store("agent", "scout", "A scout agent profile here.",
                     agent="scout")
            b = cx.briefing_full("scout")
            assert b.text and b.sections
            assert all(isinstance(s["items"], int) for s in b.sections)

    def test_remote_missing_node_none(self, live_server):
        cx = Cortex(live_server)
        assert cx.get_node("00000000-0000-7000-0000-000000000000") is None

    def test_remote_error_surfaces(self, live_server):
        cx = Cortex(live_server)
        with pytest.raises(CortexClientError):
            cx.relate("missing-a", "missing-b", "led_to")

    def test_mcp_remote_backend(self, live_server):
        """The MCP remote backend proxies every tool over the same REST
        wire (mcp/mod.rs remote mode)."""
        import json as _json
        from cortex_tpu.server.mcp import McpServer, RemoteBackend
        srv = McpServer(RemoteBackend(live_server))

        def call(name, arguments):
            resp = srv.handle({"jsonrpc": "2.0", "id": 1,
                               "method": "tools/call",
                               "params": {"name": name,
                                          "arguments": arguments}})
            result = resp["result"]
            return result["isError"], result["content"][0]["text"]

        err, text = call("cortex_store", {
            "kind": "fact", "title": "MCP remote stored this",
            "body": "Stored through the remote backend over REST."})
        assert not err
        nid = _json.loads(text)["id"]
        err, text = call("cortex_search",
                         {"query": "MCP remote stored"})
        assert not err and nid in text
        err, text = call("cortex_relate", {
            "from_id": nid, "to_id": nid, "relation": "related_to"})
        assert err    # self-edge rejected by the server, surfaced as tool error
        resp = srv.handle({"jsonrpc": "2.0", "id": 2,
                           "method": "resources/read",
                           "params": {"uri": "cortex://stats"}})
        stats = _json.loads(resp["result"]["contents"][0]["text"])
        assert stats["node_count"] >= 1

    def test_unreachable_server(self):
        cx = Cortex("http://127.0.0.1:1")
        with pytest.raises(CortexClientError, match="cannot reach"):
            cx.stats()

    def test_addr_required(self):
        with pytest.raises(CortexClientError):
            Cortex()
