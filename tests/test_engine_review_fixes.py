"""Regression tests for the core-engine review findings."""

import json
import time

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.prompt import PromptContent
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


class TestContextWeightsReachSelection:
    def test_prompt_creation_puts_weights_in_metadata(self):
        cx = Cortex.in_memory()
        pid = cx.prompts.create_prompt(PromptContent(
            slug="ctx-aware",
            context_weights={"user_frustrated": 0.9}))
        node = cx.get_node(pid)
        assert node.metadata["context_weights"] == {
            "user_frustrated": 0.9}

    def test_selection_uses_the_weights_end_to_end(self):
        import asyncio
        from aiohttp.test_utils import TestClient, TestServer
        from cortex_tpu.server.http import create_app
        from cortex_tpu.server.state import ServerState

        async def s():
            cx = Cortex.in_memory()
            agent = Cortex.agent("kai", "Agent profile node")
            cx.store(agent)
            for slug, w in [("calm", {"user_frustrated": 1.0}),
                            ("fast", {"user_pleased": 1.0})]:
                pid = cx.prompts.create_prompt(PromptContent(
                    slug=slug, context_weights=w))
                cx.create_edge(Edge.new(agent.id, pid, "uses", 0.5,
                                        EdgeProvenance.manual("t")))
            client = TestClient(TestServer(create_app(
                ServerState(cortex=cx))))
            await client.start_server()
            try:
                r = await client.get("/agents/kai/active-variant",
                                     params={"epsilon": "0",
                                             "sentiment": "0.05"})
                d = (await r.json())["data"]
                # with weights live, context must differentiate scores
                scores = {v["slug"]: v["total_score"]
                          for v in d["all_variants"]}
                assert len(set(scores.values())) > 1
                assert d["selected"]["slug"].startswith("calm")
            finally:
                await client.close()
        asyncio.run(s())


class TestGrpcZeroValues:
    def test_zero_weight_and_importance_preserved(self):
        from cortex_tpu.server import cortex_pb2 as pb
        from cortex_tpu.server.grpc_service import CortexServiceImpl
        from cortex_tpu.server.state import ServerState

        cx = Cortex.in_memory()
        svc = CortexServiceImpl(ServerState(cortex=cx))

        class Ctx:
            def abort(self, code, msg):
                raise RuntimeError(f"{code}: {msg}")

        n1 = svc.CreateNode(pb.CreateNodeRequest(
            kind="fact", title="Zero importance node here",
            body="A node whose importance is explicitly zero.",
            importance=0.0, skip_gate=True), Ctx())
        assert cx.get_node(n1.node.id).importance == 0.0
        # unset importance still defaults
        n2 = svc.CreateNode(pb.CreateNodeRequest(
            kind="fact", title="Default importance node here",
            body="A node with no importance set at all.",
            skip_gate=True), Ctx())
        assert cx.get_node(n2.node.id).importance == 0.5
        e = svc.CreateEdge(pb.CreateEdgeRequest(
            from_id=n1.node.id, to_id=n2.node.id,
            relation="related_to", weight=0.0), Ctx())
        assert cx.storage.get_edge(e.edge.id).weight == 0.0


class TestLinkerCapCursor:
    def test_edge_budget_does_not_lose_links(self):
        cfg = None
        cx = Cortex.in_memory()
        cx.linker.config.max_edges_per_cycle = 3   # tiny budget
        cx.linker.config.max_nodes_per_cycle = 100
        nodes = []
        for i in range(6):
            n = Node.new("fact", f"nearly identical fact number {i}",
                         "The same content repeated for similarity.",
                         Source(agent="same-agent"))
            cx.store(n)
            nodes.append(n)
        m1 = cx.run_linker_cycle()
        assert m1.backlog_size > 0      # budget hit, backlog recorded
        # the cursor must NOT have passed the unprocessed nodes:
        # further cycles keep creating the remaining links
        created = m1.cycle_edges_created
        for _ in range(10):
            m = cx.run_linker_cycle()
            created += m.cycle_edges_created
            if m.cycle_edges_created == 0 and m.backlog_size == 0:
                break
        # every node got its same_agent/similarity links eventually
        linked = {e.from_id for n in nodes
                  for e in cx.storage.edges_from(n.id)}
        assert len(linked) >= 5


class TestReinforcement:
    def test_search_access_reinforces_edges(self):
        cx = Cortex.in_memory()
        a = cx.store(Cortex.fact("Reinforced memory about deploys"))
        b = cx.store(Cortex.fact("A neighbor memory about releases"))
        e = Edge.new(a, b, "related_to", 0.5,
                     EdgeProvenance.auto_similarity(0.8))
        cx.storage.put_edge(e)
        # age the edge and the node's last access past the window
        past = time.time() - 30 * 86400
        cx.storage.get_edge(e.id).updated_at = past
        na = cx.get_node(a)
        na.last_accessed_at = past
        cx.storage.put_node(na)

        hits = cx.search("reinforced memory deploys", limit=1)
        assert hits and hits[0][1].id == a
        # the edge decay clock was reset by the access
        assert cx.storage.get_edge(e.id).updated_at > past + 86400
        assert cx.get_node(a).access_count >= 1

    def test_reinforce_throttled_within_window(self):
        """Throttle keys on the LAST REINFORCEMENT, not last access —
        otherwise frequently-accessed nodes would never reinforce."""
        cx = Cortex.in_memory()
        a = cx.store(Cortex.fact("Throttled reinforcement target"))
        n = cx.get_node(a)
        # never reinforced -> eligible immediately
        assert cx.linker.decay_engine.should_reinforce(n)
        cx.linker.decay_engine.reinforce(a, node=n)
        assert not cx.linker.decay_engine.should_reinforce(n)
        # frequent ACCESS must not push eligibility away
        n.record_access()
        assert not cx.linker.decay_engine.should_reinforce(n)
        # but once the reinforcement window passes, eligible again
        n.metadata[cx.linker.decay_engine.REINFORCED_AT_KEY] = \
            time.time() - 10 * 86400
        assert cx.linker.decay_engine.should_reinforce(n)


class TestRollbackWindowBoundary:
    def test_trigger_on_final_window_observation(self):
        from cortex_tpu.prompt.rollback import RollbackConfig, RollbackMonitor
        from cortex_tpu.storage import MemoryStorage
        s = MemoryStorage()
        cfg = RollbackConfig(monitoring_window=6,
                             min_samples_before_check=3,
                             consecutive_negative_limit=3,
                             cooldown_base_hours=0)
        mon = RollbackMonitor(s, cfg)
        # two prompt versions so a rollback target exists
        from cortex_tpu.prompt import PromptContent, PromptResolver
        res = PromptResolver(s)
        res.create_prompt(PromptContent(slug="p"))
        v2 = res.create_version("p", "main", PromptContent(slug="p"))
        mon.record_deployment("p", "main", 2, v2, agent_name="t")

        def obs(i, score):
            o = Node.new("observation", f"obs {i} recorded here",
                         "observation body", Source(agent="t"))
            s.put_node(o)
            return mon.process_observation(o.id, v2, 0.1, 0.9, score)

        # observations 1-3 good; 4,5,6 (the boundary) negative
        for i in range(3):
            assert obs(i, 0.9) is None
        assert obs(3, 0.1) is None
        assert obs(4, 0.1) is None
        result = obs(5, 0.1)      # n == window: must still trigger
        assert result is not None


class TestDeepCycles:
    def test_long_chain_no_recursion_error(self):
        cx = Cortex.in_memory()
        ids = []
        for i in range(1500):
            n = Node.new("fact", f"chain node number {i} here",
                         "chain body", Source(agent="t"))
            cx.storage.put_node(n)
            ids.append(n.id)
        for a, b in zip(ids, ids[1:]):
            cx.storage.put_edge(Edge.new(a, b, "led_to", 0.5,
                                         EdgeProvenance.manual("t")))
        cx.graph.invalidate()
        assert cx.graph.find_cycles() == []    # no crash, no cycles
        # close the loop -> exactly one cycle found
        cx.storage.put_edge(Edge.new(ids[-1], ids[0], "led_to", 0.5,
                                     EdgeProvenance.manual("t")))
        cx.graph.invalidate()
        cycles = cx.graph.find_cycles(max_cycles=1)
        assert len(cycles) == 1 and len(cycles[0]) == 1501
