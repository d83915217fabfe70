"""HTTP variant-selection edge cases (reference http/selection.rs has
25 tests; this extends the flow test in test_http.py)."""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from cortex_tpu.api import Cortex
from cortex_tpu.prompt import PromptContent
from cortex_tpu.server.http import create_app
from cortex_tpu.server.state import ServerState
from cortex_tpu.types import Edge, EdgeProvenance


def scenario(fn):
    async def run():
        cx = Cortex.in_memory()
        state = ServerState(cortex=cx)
        client = TestClient(TestServer(create_app(state)))
        await client.start_server()
        try:
            return await fn(client, cx)
        finally:
            await client.close()
    return asyncio.run(run())


def bind_variant(cx, agent_name, slug, weight=0.5, context_weights=None):
    agent = None
    for n in cx.list_nodes():
        if n.kind == "agent" and n.title == agent_name:
            agent = n
            break
    if agent is None:
        agent = Cortex.agent(agent_name, f"{agent_name} profile")
        cx.store(agent)
    pid = cx.prompts.create_prompt(PromptContent(slug=slug))
    p = cx.get_node(pid)
    if context_weights:
        p.metadata["context_weights"] = context_weights
        cx.storage.put_node(p)
    cx.create_edge(Edge.new(agent.id, pid, "uses", weight,
                            EdgeProvenance.manual("t")))
    return agent, pid


class TestActiveVariant:
    def test_unknown_agent_404(self):
        async def s(client, cx):
            r = await client.get("/agents/ghost/active-variant")
            assert r.status == 404
        scenario(s)

    def test_no_variants_404_or_empty(self):
        async def s(client, cx):
            cx.store(Cortex.agent("bare", "Agent with no prompts"))
            r = await client.get("/agents/bare/active-variant",
                                 params={"epsilon": "0"})
            assert r.status in (200, 404)
        scenario(s)

    def test_epsilon_zero_picks_best(self):
        async def s(client, cx):
            bind_variant(cx, "kai", "weak", weight=0.2)
            bind_variant(cx, "kai", "strong", weight=0.9)
            for _ in range(5):   # deterministic at epsilon 0
                r = await client.get("/agents/kai/active-variant",
                                     params={"epsilon": "0"})
                d = (await r.json())["data"]
                assert d["selected"]["slug"].startswith("strong")
        scenario(s)

    def test_epsilon_clamped(self):
        async def s(client, cx):
            bind_variant(cx, "kai", "only", weight=0.5)
            r = await client.get("/agents/kai/active-variant",
                                 params={"epsilon": "7.5"})
            assert r.status == 200       # clamped to 1.0, not an error
            r = await client.get("/agents/kai/active-variant",
                                 params={"epsilon": "-3"})
            assert r.status == 200       # clamped to 0.0
        scenario(s)

    def test_context_weights_shift_selection(self):
        async def s(client, cx):
            # equal edge weights; context decides
            bind_variant(cx, "kai", "calm-style", weight=0.5,
                         context_weights={"user_frustrated": 1.0})
            bind_variant(cx, "kai", "fast-style", weight=0.5,
                         context_weights={"user_pleased": 1.0})
            r = await client.get("/agents/kai/active-variant", params={
                "epsilon": "0", "sentiment": "0.05"})   # frustrated
            d = (await r.json())["data"]
            assert d["selected"]["slug"].startswith("calm-style")
            r = await client.get("/agents/kai/active-variant", params={
                "epsilon": "0", "sentiment": "0.95"})   # pleased
            d = (await r.json())["data"]
            assert d["selected"]["slug"].startswith("fast-style")
        scenario(s)


class TestObserve:
    def test_missing_variant_id_422(self):
        async def s(client, cx):
            bind_variant(cx, "kai", "v1")
            r = await client.post("/agents/kai/observe", json={})
            assert r.status == 422
        scenario(s)

    def test_invalid_outcome_coerced(self):
        async def s(client, cx):
            _, pid = bind_variant(cx, "kai", "v1")
            r = await client.post("/agents/kai/observe", json={
                "variant_id": pid, "task_outcome": "amazing!!"})
            assert r.status == 200
            d = (await r.json())["data"]
            assert d.get("task_outcome", "unknown") == "unknown"
        scenario(s)

    def test_ema_weight_update_direction(self):
        async def s(client, cx):
            agent, pid = bind_variant(cx, "kai", "v1", weight=0.5)
            for _ in range(3):
                r = await client.post("/agents/kai/observe", json={
                    "variant_id": pid, "sentiment_score": 1.0,
                    "correction_count": 0, "task_outcome": "success"})
                assert r.status == 200
            w_up = [e.weight for e in cx.storage.edges_from(agent.id)
                    if e.relation == "uses"][0]
            assert w_up > 0.5            # EMA moved toward good obs
            for _ in range(6):
                await client.post("/agents/kai/observe", json={
                    "variant_id": pid, "sentiment_score": 0.0,
                    "correction_count": 9, "task_outcome": "failure"})
            w_down = [e.weight for e in cx.storage.edges_from(agent.id)
                      if e.relation == "uses"][0]
            assert w_down < w_up         # and back down on bad obs
        scenario(s)


class TestContextFilter:
    """Mirrors selection.rs:1076-1140 context-filter cases: recording
    context on observations and filtering variant-history/performance
    by ?context=key:value."""

    async def _setup(self, client, cx):
        agent, pid = bind_variant(cx, "ctx-agent", "ctx-prompt")
        for task, sent in (("coding", 0.9), ("writing", 0.3)):
            r = await client.post("/agents/ctx-agent/observe", json={
                "variant_id": pid,
                "sentiment_score": sent,
                "task_outcome": "success",
                "context": {"task_type": task}})
            assert r.status == 200, await r.text()
        return pid

    def test_history_filters_by_context(self):
        async def s(client, cx):
            await self._setup(client, cx)
            r = await client.get("/agents/ctx-agent/variant-history")
            assert len((await r.json())["data"]) == 2
            r = await client.get("/agents/ctx-agent/variant-history",
                                 params={"context": "task_type:coding"})
            rows = (await r.json())["data"]
            assert len(rows) == 1
            assert rows[0]["sentiment_score"] == pytest.approx(0.9)
            r = await client.get("/agents/ctx-agent/variant-history",
                                 params={"context": "task_type:reviewing"})
            assert (await r.json())["data"] == []
            # missing key on the observation = no match
            r = await client.get("/agents/ctx-agent/variant-history",
                                 params={"context": "energy:high"})
            assert (await r.json())["data"] == []
        scenario(s)

    def test_malformed_filters_ignored(self):
        """selection.rs parse cases: no colon / empty key / empty value
        -> no filter (full history); extra colons split once."""
        async def s(client, cx):
            await self._setup(client, cx)
            for bad in ("nocolon", ":coding", "task_type:", " : "):
                r = await client.get(
                    "/agents/ctx-agent/variant-history",
                    params={"context": bad})
                assert len((await r.json())["data"]) == 2, bad
            # "a:b:c" parses as key=a, value="b:c" -> matches nothing
            r = await client.get("/agents/ctx-agent/variant-history",
                                 params={"context": "task_type:coding:x"})
            assert (await r.json())["data"] == []
        scenario(s)

    def test_performance_filters_by_context(self):
        async def s(client, cx):
            await self._setup(client, cx)
            r = await client.get("/prompts/ctx-prompt/performance")
            full = (await r.json())["data"]
            r = await client.get("/prompts/ctx-prompt/performance",
                                 params={"context": "task_type:coding"})
            coding = (await r.json())["data"]
            assert full["observations"] == 2
            assert coding["observations"] == 1
            assert coding["avg_sentiment"] == pytest.approx(0.9)
        scenario(s)


class TestCostMetrics:
    def test_token_cost_partial_aggregation(self):
        """selection.rs aggregate_observations_token_cost_partial:
        avg_token_cost / avg_response_time_ms average over only the
        observations that carry them."""
        async def s(client, cx):
            _, pid = bind_variant(cx, "cost-agent", "cost-prompt")
            payloads = [
                {"variant_id": pid, "sentiment_score": 0.8,
                 "task_outcome": "success", "token_cost": 100,
                 "response_time_ms": 250},
                {"variant_id": pid, "sentiment_score": 0.6,
                 "task_outcome": "success", "token_cost": 300},
                {"variant_id": pid, "sentiment_score": 0.4,
                 "task_outcome": "partial"},
            ]
            for p in payloads:
                r = await client.post("/agents/cost-agent/observe", json=p)
                assert r.status == 200, await r.text()
            r = await client.get("/prompts/cost-prompt/performance")
            d = (await r.json())["data"]
            assert d["observations"] == 3
            assert d["avg_token_cost"] == pytest.approx(200.0)    # (100+300)/2
            assert d["avg_response_time_ms"] == pytest.approx(250.0)
            r = await client.get("/agents/cost-agent/variant-history")
            rows = (await r.json())["data"]
            assert {row.get("token_cost") for row in rows} == {100, 300, None}
        scenario(s)
