"""End-to-end integration scenarios (reference model:
cortex-server/tests/integration_test.rs, 16 tests) — the full engine
lifecycle through the embedded API on durable storage, plus randomized
invariant checks (the reference declared proptest but never used it;
these make the property-testing claim real).
"""

import math
import random
import time

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.config import CortexConfig
from cortex_tpu.errors import GateRejection
from cortex_tpu.graph import BOTH, PathRequest, TraversalRequest
from cortex_tpu.storage.base import NodeFilter
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def node(kind, title, body=None, agent="it", importance=0.5, tags=()):
    n = Node.new(kind, title, body or title + " body with substance.",
                 Source(agent=agent), importance)
    n.tags = list(tags)
    return n


class TestLifecycle:
    """One realistic session: seed -> link -> search -> decay ->
    retention -> restart."""

    def test_full_lifecycle(self, tmp_path):
        db = str(tmp_path / "life.db")
        cx = Cortex.open(db)

        # seed a working context
        agent = node("agent", "ops-bot", "Operations agent profile.",
                     agent="ops-bot", importance=0.9)
        decision = node("decision",
                        "We decided to adopt blue-green deploys",
                        "Decided to use blue-green for all services.",
                        importance=0.8, tags=["deploy"])
        event = node("event", "Deployed payments v3 blue-green",
                     "The payments service shipped via blue-green.",
                     tags=["deploy"])
        fact = node("fact", "Blue-green needs double capacity",
                    "Blue-green deploys require 2x standby capacity.")
        for n in (agent, decision, event, fact):
            cx.store(n)
        cx.create_edge(Edge.new(decision.id, event.id, "led_to", 0.9,
                                EdgeProvenance.manual("it")))

        # auto-linker grows the graph
        m = cx.run_linker_cycle()
        assert m.cycle_nodes_processed >= 4
        auto_edges = [e for n_ in cx.list_nodes()
                      for e in cx.storage.edges_from(n_.id)
                      if not e.provenance.is_manual]
        assert auto_edges, "similarity links should appear"

        # search finds the decision for a deploy question
        hits = cx.search("how should we deploy services", limit=3)
        assert any(h.id == decision.id for _, h in hits)

        # hybrid anchored to the event pulls graph-adjacent results up
        res = cx.search_hybrid("deploys", anchors=[event.id], limit=4)
        scores = {r.node.id: r for r in res}
        assert scores[event.id].graph_score == 1.0

        # briefing synthesizes the agent's world
        text = cx.briefing("ops-bot")
        assert "ops-bot" in text.lower()

        # graph queries
        sub = cx.traverse(TraversalRequest(start=[decision.id],
                                           max_depth=2, direction=BOTH))
        assert event.id in sub.nodes
        paths = cx.find_paths(PathRequest(from_id=decision.id,
                                          to_id=event.id)).paths
        assert paths and paths[0].nodes[0] == decision.id

        # restart: everything survives and the index rebuilds
        cx.close()
        cx2 = Cortex.open(db)
        assert cx2.stats().node_count == 4
        hits2 = cx2.search("blue-green capacity", limit=2)
        assert any(h.id == fact.id for _, h in hits2)
        cx2.close()

    def test_decay_preserves_recent_and_manual(self):
        """integration_test.rs decay behavior: recent edges keep their
        weight; manual edges are exempt from deletion."""
        cx = Cortex.in_memory()
        a = cx.store(node("fact", "Edge endpoint alpha stays"))
        b = cx.store(node("fact", "Edge endpoint beta stays"))
        c = cx.store(node("fact", "Edge endpoint gamma stays"))
        recent = Edge.new(a, b, "related_to", 0.5,
                          EdgeProvenance.auto_similarity(0.8))
        old_auto = Edge.new(b, c, "related_to", 0.06,
                            EdgeProvenance.auto_similarity(0.8))
        old_manual = Edge.new(a, c, "depends_on", 0.06,
                              EdgeProvenance.manual("it"))
        for e in (recent, old_auto, old_manual):
            cx.storage.put_edge(e)
        # age the old edges 400 days: mutate a fetched copy and re-put
        # (the memory store now copies at its boundary like SQLite —
        # mutating a returned object no longer reaches stored state)
        past = time.time() - 400 * 86400
        for eid in (old_auto.id, old_manual.id):
            aged = cx.storage.get_edge(eid)
            aged.updated_at = past
            cx.storage.put_edge(aged)

        pruned, deleted = cx.linker.decay_engine.apply_decay()
        assert cx.storage.get_edge(recent.id).weight == pytest.approx(
            0.5, abs=0.01), "recent edge must keep its weight"
        assert cx.storage.get_edge(old_auto.id) is None, \
            "decayed auto edge below delete threshold is removed"
        assert cx.storage.get_edge(old_manual.id) is not None, \
            "manual edges are exempt"
        assert deleted >= 1

    def test_gate_rejections_and_bypass(self):
        cfg = CortexConfig()
        cx = Cortex.in_memory(cfg)
        with pytest.raises(GateRejection):
            cx.store(node("fact", "tiny", "x"), gate=True)
        with pytest.raises(GateRejection):
            cx.store(node("decision", "A choice was made somewhere",
                          "There is text here but nothing actionable."),
                     gate=True)
        # observation wording passes as observation but fails as fact
        with pytest.raises(GateRejection):
            cx.store(node("fact", "Hedged claim about the system",
                          "maybe the system is fine most of the time"),
                     gate=True)
        ok = node("decision", "Adopt the new retry policy",
                  "We decided to use exponential backoff with jitter.")
        cx.store(ok, gate=True)
        assert cx.get_node(ok.id) is not None

    def test_reindex_after_model_change(self):
        cfg = CortexConfig()
        cfg.embedding.model = "hash-64"
        cfg.embedding.dimension = 64
        cx = Cortex.in_memory(cfg)
        ids = [cx.store(node("fact", f"reindex target {i} unique"))
               for i in range(5)]
        assert cx.reindex() == 5
        hits = cx.search("reindex target 3 unique", limit=1)
        assert hits and hits[0][1].id in ids


class TestRandomizedInvariants:
    """Property-style checks over random inputs."""

    def test_search_self_retrieval(self):
        """Any stored node is its own nearest neighbor by embedding."""
        cx = Cortex.in_memory()
        rng = random.Random(4)
        words = [f"tok{i}" for i in range(200)]
        nodes = []
        for i in range(40):
            text = " ".join(rng.sample(words, 8))
            n = node("fact", f"inv {i}: {text[:40]}", text)
            cx.store(n)
            nodes.append(n)
        for n in rng.sample(nodes, 8):
            emb = np.asarray(n.embedding, np.float32)
            hits = cx.index.search(emb, 1)
            assert hits[0][0] == n.id

    def test_decay_monotone_and_bounded(self):
        """Decay never raises a weight and never produces NaN."""
        from cortex_tpu.ops.decay import decay_sweep_host
        rng = np.random.default_rng(5)
        w = rng.uniform(0, 1, 500).astype(np.float32)
        days = rng.uniform(0, 1000, 500).astype(np.float32)
        imp = rng.uniform(0, 1, 500).astype(np.float32)
        exempt = rng.random(500) < 0.2
        nw, dele, prune, changed = decay_sweep_host(
            w, days, imp, exempt, 0.01, 0.8, 0.05, 0.1)
        assert np.all(nw <= w + 1e-6)
        assert np.all(np.isfinite(nw))
        assert not np.any(dele & exempt)
        assert not np.any(dele & prune)

    def test_traversal_budget_always_respected(self):
        cx = Cortex.in_memory()
        ids = [cx.store(node("fact", f"budget node {i} here"))
               for i in range(30)]
        rng = random.Random(6)
        for _ in range(80):
            a, b = rng.sample(ids, 2)
            try:
                cx.create_edge(Edge.new(a, b, "related_to", 0.5,
                                        EdgeProvenance.manual("it")))
            except Exception:
                pass
        from cortex_tpu.graph.types import TraversalBudget
        cx.graph.budget = TraversalBudget(max_visited=10)
        sub = cx.traverse(TraversalRequest(start=[ids[0]], max_depth=10,
                                           direction=BOTH))
        assert sub.visited_count <= 10 or sub.truncated

    def test_dsl_filter_equivalence(self):
        """DSL-compiled filters agree with hand-built NodeFilter."""
        cx = Cortex.in_memory()
        rng = random.Random(7)
        for i in range(30):
            cx.store(node(rng.choice(["fact", "event"]),
                          f"dsl node {i} with text",
                          importance=rng.random()))
        dsl = cx.query("kind:fact AND importance>=0.5")
        manual = cx.list_nodes(NodeFilter(kinds=["fact"],
                                          min_importance=0.5))
        assert {n.id for n in dsl} == {n.id for n in manual}
