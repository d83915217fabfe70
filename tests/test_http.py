"""HTTP surface tests (parity model: reference integration_test.rs +
sse_test.rs). Runs aiohttp handlers via TestClient inside asyncio.run."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from cortex_tpu.api import Cortex
from cortex_tpu.server.http import create_app
from cortex_tpu.server.state import ServerState


def scenario(fn):
    """Run an async scenario with a fresh in-memory server + client."""
    async def run():
        cx = Cortex.in_memory()
        state = ServerState(cortex=cx)
        client = TestClient(TestServer(create_app(state)))
        await client.start_server()
        try:
            return await fn(client, cx, state)
        finally:
            await client.close()
    return asyncio.run(run())


GOOD_NODE = {
    "kind": "fact",
    "title": "The deploy pipeline uses blue-green",
    "body": "Deployments run blue-green with automated rollback on errors.",
    "importance": 0.6,
    "tags": ["deploy"],
}


class TestBasics:
    def test_health(self):
        async def s(client, cx, state):
            r = await client.get("/health")
            assert r.status == 200
            data = await r.json()
            assert data["data"]["status"] == "healthy"
        scenario(s)

    def test_stats_and_metrics(self):
        async def s(client, cx, state):
            await client.post("/nodes", json=GOOD_NODE)
            r = await client.get("/stats")
            data = (await r.json())["data"]
            assert data["node_count"] == 1
            # operational index description (index_info): which engine
            # serves queries and how it is configured right now
            assert data["index"]["kind"] in ("flat", "ivf")
            assert data["index"]["size"] == data["index_size"]
            assert data["index"]["resolved_path"] in (
                "xla", "quant", "approx")
            r = await client.get("/metrics")
            text = await r.text()
            assert "cortex_nodes_total 1" in text
            assert "cortex_http_requests_total" in text
        scenario(s)


class TestNodes:
    def test_create_get_roundtrip(self):
        async def s(client, cx, state):
            r = await client.post("/nodes", json=GOOD_NODE)
            assert r.status == 201
            nid = (await r.json())["data"]["id"]
            r = await client.get(f"/nodes/{nid}")
            got = (await r.json())["data"]
            assert got["data"]["title"] == GOOD_NODE["title"]
        scenario(s)

    def test_gate_rejects_422(self):
        async def s(client, cx, state):
            r = await client.post("/nodes", json={
                "kind": "fact", "title": "x", "body": "y"})
            assert r.status == 422
            data = await r.json()
            assert data["check"] == "substance"
            assert "suggestion" in data
        scenario(s)

    def test_gate_skip_header(self):
        async def s(client, cx, state):
            r = await client.post(
                "/nodes?gate=skip", json={
                    "kind": "fact", "title": "tiny", "body": "small"},
                headers={"x-gate-override": "true"})
            assert r.status == 201
        scenario(s)

    def test_patch_and_delete(self):
        async def s(client, cx, state):
            r = await client.post("/nodes", json=GOOD_NODE)
            nid = (await r.json())["data"]["id"]
            r = await client.patch(f"/nodes/{nid}",
                                   json={"importance": 0.9})
            assert (await r.json())["data"]["importance"] == 0.9
            r = await client.delete(f"/nodes/{nid}")
            assert r.status == 200
            assert cx.get_node(nid).deleted
        scenario(s)

    def test_list_with_dsl(self):
        async def s(client, cx, state):
            await client.post("/nodes", json=GOOD_NODE)
            await client.post("/nodes", json={
                **GOOD_NODE, "kind": "event",
                "title": "Deployed the new version today ok"})
            r = await client.get("/nodes", params={"q": "kind:fact"})
            data = (await r.json())["data"]
            assert len(data) == 1 and data[0]["kind"] == "fact"
        scenario(s)

    def test_neighbors(self):
        async def s(client, cx, state):
            r1 = await client.post("/nodes", json=GOOD_NODE)
            r2 = await client.post("/nodes", json={
                **GOOD_NODE, "title": "Second fact about deploys here"})
            a = (await r1.json())["data"]["id"]
            b = (await r2.json())["data"]["id"]
            await client.post("/edges", json={
                "from": a, "to": b, "relation": "related_to"})
            r = await client.get(f"/nodes/{a}/neighbors")
            data = (await r.json())["data"]
            assert any(n["id"] == b for n in data["nodes"])
        scenario(s)


class TestSearch:
    def test_search(self):
        async def s(client, cx, state):
            await client.post("/nodes", json=GOOD_NODE)
            await client.post("/nodes", json={
                **GOOD_NODE,
                "title": "Database vacuum schedule for postgres",
                "body": "The postgres vacuum runs nightly at two."})
            r = await client.get("/search",
                                 params={"q": "postgres vacuum", "limit": 1})
            data = (await r.json())["data"]
            assert data and "postgres" in data[0]["node"]["data"]["title"]
        scenario(s)

    def test_search_missing_q(self):
        async def s(client, cx, state):
            r = await client.get("/search")
            assert r.status == 400
        scenario(s)

    def test_hybrid(self):
        async def s(client, cx, state):
            r1 = await client.post("/nodes", json=GOOD_NODE)
            a = (await r1.json())["data"]["id"]
            r = await client.get("/search/hybrid", params={
                "q": "deploy pipeline", "anchors": a})
            assert r.status == 200
        scenario(s)


class TestGraphOps:
    def test_export_and_viz(self):
        async def s(client, cx, state):
            await client.post("/nodes", json=GOOD_NODE)
            r = await client.get("/graph/export")
            data = (await r.json())["data"]
            assert len(data["nodes"]) == 1
            r = await client.get("/viz")
            assert "d3" in (await r.text())
        scenario(s)

    def test_linker_status_and_trigger(self):
        async def s(client, cx, state):
            await client.post("/nodes", json=GOOD_NODE)
            r = await client.post("/auto-linker/trigger")
            assert (await r.json())["data"]["nodes_processed"] == 1
            r = await client.get("/auto-linker/status")
            assert (await r.json())["data"]["cycles_completed"] == 1
        scenario(s)

    def test_briefing(self):
        async def s(client, cx, state):
            await client.post("/nodes", json={
                "kind": "agent", "title": "Kai the assistant",
                "body": "Agent node body with enough text", "agent": "kai"})
            r = await client.get("/briefing/kai")
            assert "Briefing" in (await r.text())
            r = await client.get("/briefing/kai", params={"format": "json"})
            assert (await r.json())["data"]["agent_id"] == "kai"
        scenario(s)


class TestAuth:
    def test_bearer_required(self):
        async def s_run():
            cx = Cortex.in_memory()
            state = ServerState(cortex=cx, auth_token="sekrit")
            client = TestClient(TestServer(create_app(state)))
            await client.start_server()
            try:
                r = await client.get("/stats")
                assert r.status == 401
                r = await client.get("/stats", headers={
                    "Authorization": "Bearer sekrit"})
                assert r.status == 200
                # health stays open
                r = await client.get("/health")
                assert r.status == 200
            finally:
                await client.close()
        asyncio.run(s_run())


class TestPromptRoutes:
    async def _mk_prompt(self, client, slug="helper"):
        r = await client.post("/prompts", json={
            "slug": slug, "type": "persona",
            "sections": {"tone": "friendly"}})
        assert r.status == 201
        return (await r.json())["data"]["node_id"]

    def test_prompt_crud(self):
        async def s(client, cx, state):
            await self._mk_prompt(client)
            r = await client.get("/prompts")
            data = (await r.json())["data"]
            assert data[0]["slug"] == "helper"
            r = await client.post("/prompts/helper/versions", json={
                "sections": {"tone": "crisp"}})
            assert r.status == 201
            r = await client.get("/prompts/helper/latest")
            latest = (await r.json())["data"]
            assert latest["version"] == 2
            assert latest["content"]["tone"] == "crisp"
            r = await client.get("/prompts/helper/versions")
            assert len((await r.json())["data"]) == 2
            r = await client.get("/prompts/helper/versions/1")
            assert (await r.json())["data"]["version"] == 1
            r = await client.post("/prompts/helper/branch",
                                  json={"new_branch": "dev"})
            assert r.status == 201
        scenario(s)

    def test_bind_select_observe_flow(self):
        async def s(client, cx, state):
            pid = await self._mk_prompt(client)
            r = await client.put("/agents/kai/prompts/helper")
            assert r.status == 200
            r = await client.get("/agents/kai/prompts")
            assert len((await r.json())["data"]) == 1
            r = await client.get("/agents/kai/active-variant",
                                 params={"epsilon": "0"})
            sel = (await r.json())["data"]
            assert sel["selected"]["id"] == pid
            # observe good performance -> weight rises
            r = await client.post("/agents/kai/observe", json={
                "variant_id": pid, "variant_slug": "helper",
                "sentiment_score": 1.0, "correction_count": 0,
                "task_outcome": "success"})
            data = (await r.json())["data"]
            assert data["new_weight"] > data["old_weight"]
            r = await client.get("/agents/kai/variant-history")
            hist = (await r.json())["data"]
            assert hist and hist[0]["variant_id"] == pid
            r = await client.get("/agents/kai/resolved-prompt")
            assert (await r.json())["data"]["slug"] == "helper"
            r = await client.get("/prompts/helper/performance")
            perf = (await r.json())["data"]
            assert perf["observations"] == 1
        scenario(s)

    def test_deploy_and_rollback_status(self):
        async def s(client, cx, state):
            await self._mk_prompt(client)
            await client.post("/prompts/helper/versions",
                              json={"sections": {"v": 2}})
            r = await client.post("/prompts/helper/deploy", json={
                "agent_name": "kai",
                "baseline_observations": [[0.1, 0.8], [0.12, 0.75]]})
            assert r.status == 201
            r = await client.get("/prompts/helper/rollback-status")
            st = (await r.json())["data"]
            assert st["current_version"] == 2
            assert st["active_deployment"] is not None
        scenario(s)


class TestSSE:
    def test_event_stream_delivers_mutations(self):
        async def s(client, cx, state):
            resp = await client.get("/events/stream")
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(
                "text/event-stream")
            await client.post("/nodes", json=GOOD_NODE)
            line = b""
            while not line.startswith(b"event:"):
                line = await asyncio.wait_for(resp.content.readline(),
                                              timeout=5)
            assert b"node_created" in line
            resp.close()
        scenario(s)

    def test_event_filter(self):
        async def s(client, cx, state):
            resp = await client.get("/events/stream",
                                    params={"events": "edge_created"})
            await client.post("/nodes", json=GOOD_NODE)
            r2 = await client.post("/nodes", json={
                **GOOD_NODE, "title": "Another node for the edge tests"})
            a = (await r2.json())["data"]["id"]
            nodes = cx.list_nodes()
            await client.post("/edges", json={
                "from": nodes[0].id, "to": nodes[1].id,
                "relation": "related_to"})
            line = b""
            while not line.startswith(b"event:"):
                line = await asyncio.wait_for(resp.content.readline(),
                                              timeout=5)
            # node_created events were filtered out
            assert b"edge_created" in line
            resp.close()
        scenario(s)

    def test_multi_subscriber_fanout(self):
        async def s(client, cx, state):
            r1 = await client.get("/events/stream")
            r2 = await client.get("/events/stream")
            await client.post("/nodes", json=GOOD_NODE)

            async def first_event(resp):
                line = b""
                while not line.startswith(b"event:"):
                    line = await asyncio.wait_for(resp.content.readline(),
                                                  timeout=5)
                return line

            l1 = await first_event(r1)
            l2 = await first_event(r2)
            assert b"node_created" in l1 and b"node_created" in l2
            r1.close()
            r2.close()
        scenario(s)


class TestDeviceUnavailable:
    def test_wedged_device_maps_to_503_with_retry_after(self, monkeypatch):
        """A DeviceFetchTimeout that survives the bounded re-dispatch
        ladder must surface as 503 + Retry-After, not a naked 500
        (observed live against a wedged tunnel)."""
        from cortex_tpu.vector.shard import DeviceFetchTimeout

        async def s(client, cx, state):
            def wedged(*a, **k):
                raise DeviceFetchTimeout("device fetch not ready (test)")
            monkeypatch.setattr(type(cx), "search", wedged)
            r = await client.get("/search", params={"q": "anything"})
            assert r.status == 503
            assert r.headers.get("Retry-After") == "5"
            body = await r.json()
            assert body["ok"] is False
            assert "device unavailable" in body["error"]
        scenario(s)
