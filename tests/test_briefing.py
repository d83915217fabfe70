"""Briefing engine tests (parity model: reference briefing tests, 32)."""

import time

import numpy as np
import pytest

from cortex_tpu.briefing import (Briefing, BriefingConfig, BriefingEngine,
                                 GraphVersion, kind_to_section_title,
                                 pluralise)
from cortex_tpu.graph import AdjacencyCache, DeviceGraphMirror, GraphEngine
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source
from cortex_tpu.vector import HashingEmbedder, TpuFlatIndex
from cortex_tpu.vector.hybrid import HybridSearch

DIM = 32


def mknode(kind, title, agent="kai", importance=0.6, body=None, tags=(),
           created=None):
    n = Node.new(kind, title, body or f"Body of {title}",
                 Source(agent=agent), importance)
    n.tags = list(tags)
    if created is not None:
        n.created_at = created
    return n


class World:
    def __init__(self, cfg=None):
        self.s = MemoryStorage()
        self.emb = HashingEmbedder(DIM)
        self.idx = TpuFlatIndex(DIM)
        self.graph = GraphEngine(self.s)
        self.mirror = DeviceGraphMirror(self.graph.cache)
        self.hybrid = HybridSearch(self.s, self.emb, self.idx, self.mirror)
        self.version = GraphVersion()
        self.engine = BriefingEngine(self.s, self.graph, self.idx, self.emb,
                                     self.hybrid, self.version,
                                     cfg or BriefingConfig())

    def put(self, node):
        node.embedding = self.emb.embed_node(node).tolist()
        self.s.put_node(node)
        self.idx.insert(node.id, np.asarray(node.embedding), kind=node.kind,
                        source_agent=node.source.agent)
        self.graph.invalidate()
        self.version.bump()
        return node

    def link(self, a, b, relation, weight=0.9):
        self.s.put_edge(Edge.new(a.id, b.id, relation, weight,
                                 EdgeProvenance.manual("t")))
        self.graph.invalidate()
        self.version.bump()


def agent_world():
    w = World()
    agent = w.put(mknode("agent", "Kai the assistant", agent="kai"))
    pref = w.put(mknode("preference", "Prefers concise answers",
                        importance=0.8))
    w.link(pref, agent, "applies_to")
    pattern = w.put(mknode("pattern", "Always reviews before merging",
                           importance=0.7))
    w.link(pattern, agent, "applies_to")
    goal = w.put(mknode("goal", "Ship the v2 release", importance=0.9))
    w.link(agent, goal, "depends_on")
    event = w.put(mknode("event", "Deployed to staging", importance=0.5))
    return w, agent, pref, pattern, goal, event


class TestSections:
    def test_identity_first_with_agent_node(self):
        w, agent, pref, *_ = agent_world()
        b = w.engine.generate("kai")
        assert b.sections[0].title == "Identity & Preferences"
        ids = [n.id for n in b.sections[0].nodes]
        assert ids[0] == agent.id      # agent node leads
        assert pref.id in ids

    def test_patterns_and_goals_sections(self):
        w, agent, pref, pattern, goal, event = agent_world()
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        assert "Patterns" in titles
        assert "Goals" in titles
        pat = next(s for s in b.sections if s.title == "Patterns")
        assert [n.id for n in pat.nodes] == [pattern.id]
        go = next(s for s in b.sections if s.title == "Goals")
        assert [n.id for n in go.nodes] == [goal.id]

    def test_section_order(self):
        w, *_ = agent_world()
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        order = ["Identity & Preferences", "Patterns", "Goals",
                 "Recent Events"]
        present = [t for t in order if t in titles]
        assert present == [t for t in titles if t in order]

    def test_unresolved_contradictions(self):
        w, agent, *_ = agent_world()
        a = w.put(mknode("fact", "Server uses port 8080", importance=0.2))
        b2 = w.put(mknode("fact", "Server no longer uses port 8080",
                          importance=0.2))
        w.link(a, b2, "contradicts")
        w.link(agent, a, "related_to")
        b = w.engine.generate("kai")
        sec = next((s for s in b.sections
                    if s.title == "Unresolved Contradictions"), None)
        assert sec is not None
        ids = {n.id for n in sec.nodes}
        # importance floor does NOT apply to contradictions
        assert a.id in ids or b2.id in ids

    def test_recent_events_window(self):
        w, *_ = agent_world()
        old = w.put(mknode("event", "Ancient deployment event",
                           created=time.time() - 5 * 86400))
        b = w.engine.generate("kai")
        ev = next(s for s in b.sections if s.title == "Recent Events")
        ids = [n.id for n in ev.nodes]
        assert old.id not in ids

    def test_global_fallback_without_agent_node(self):
        w = World()
        w.put(mknode("pattern", "Some recurring behavior pattern",
                     agent="other"))
        w.put(mknode("goal", "A global goal here", agent="other"))
        w.put(mknode("decision", "Decided to use postgres", agent="other"))
        b = w.engine.generate("ghost")
        titles = [s.title for s in b.sections]
        assert "Patterns" in titles
        assert "Goals" in titles
        assert "Key Decisions" in titles

    def test_auto_discovered_novel_kinds(self):
        w, *_ = agent_world()
        w.put(mknode("recipe", "Pasta carbonara steps", importance=0.9))
        w.put(mknode("recipe", "Risotto technique notes", importance=0.8))
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        assert "Recipes" in titles

    def test_active_context_last(self):
        w, *_ = agent_world()
        b = w.engine.generate("kai")
        if "Active Context" in [s.title for s in b.sections]:
            assert b.sections[-1].title == "Active Context"

    def test_no_duplicates_across_sections(self):
        w, *_ = agent_world()
        b = w.engine.generate("kai")
        all_ids = [n.id for s in b.sections for n in s.nodes]
        assert len(all_ids) == len(set(all_ids))

    def test_max_total_items(self):
        cfg = BriefingConfig(max_total_items=3)
        w = World(cfg)
        w.put(mknode("agent", "Kai the assistant"))
        for i in range(10):
            w.put(mknode("fact", f"Fact number {i}", importance=0.9))
        b = w.engine.generate("kai")
        assert sum(len(s.nodes) for s in b.sections) <= 3

    def test_min_importance_floor(self):
        w, agent, *_ = agent_world()
        weak = w.put(mknode("pattern", "Weak pattern not shown",
                            importance=0.1))
        w.link(weak, agent, "applies_to")
        b = w.engine.generate("kai")
        pat = next(s for s in b.sections if s.title == "Patterns")
        assert weak.id not in [n.id for n in pat.nodes]

    def test_rank_by_importance_then_access(self):
        w = World()
        lo = w.put(mknode("goal", "Less important goal", importance=0.5,
                          agent="x"))
        hi = w.put(mknode("goal", "More important goal", importance=0.9,
                          agent="x"))
        b = w.engine.generate("ghost")
        goals = next(s for s in b.sections if s.title == "Goals")
        assert [n.id for n in goals.nodes] == [hi.id, lo.id]


class TestCacheAndAccess:
    def test_cache_hit_same_version(self):
        w, *_ = agent_world()
        b1 = w.engine.generate("kai")
        assert not b1.cached
        b2 = w.engine.generate("kai")
        assert b2.cached

    def test_cache_invalidated_on_version_bump(self):
        w, *_ = agent_world()
        w.engine.generate("kai")
        w.put(mknode("fact", "Something new happened here"))
        b = w.engine.generate("kai")
        assert not b.cached

    def test_access_counts_bumped(self):
        w, agent, *_ = agent_world()
        before = w.s.get_node(agent.id).access_count
        w.engine.generate("kai")
        assert w.s.get_node(agent.id).access_count == before + 1


class TestRendering:
    def test_markdown_render(self):
        w, *_ = agent_world()
        b = w.engine.generate("kai")
        md = w.engine.render(b)
        assert md.startswith("# Briefing: kai")
        assert "## Identity & Preferences" in md
        assert "**Kai the assistant**" in md

    def test_compact_denser(self):
        w, *_ = agent_world()
        b = w.engine.generate("kai")
        md = w.engine.render(b, compact=False)
        compact = w.engine.render(b, compact=True)
        assert len(compact) < len(md)

    def test_char_budget_truncation(self):
        cfg = BriefingConfig(max_chars=120)
        w = World(cfg)
        w.put(mknode("agent", "Kai the assistant"))
        for i in range(5):
            w.put(mknode("fact", f"A rather long fact title number {i}",
                         importance=0.9))
        b = w.engine.generate("kai")
        md = w.engine.render(b)
        assert len(md) <= 120
        assert md.endswith("[truncated]")


class TestHelpers:
    def test_pluralise(self):
        assert pluralise("recipe") == "recipes"
        assert pluralise("query") == "queries"
        assert pluralise("key") == "keys"
        assert pluralise("boss") == "bosses"
        assert pluralise("box") == "boxes"
        assert pluralise("dish") == "dishes"
        assert pluralise("match") == "matches"

    def test_kind_to_section_title(self):
        assert kind_to_section_title("recipe") == "Recipes"
        assert kind_to_section_title("meeting_note") == "Meeting Notes"

    def test_find_agent_node_by_tag(self):
        w = World()
        a = mknode("agent", "Some Helper", agent="other")
        a.tags = ["zeta"]
        w.put(a)
        assert w.engine.find_agent_node("zeta") == a.id

    def test_find_agent_node_by_title(self):
        w = World()
        a = w.put(mknode("agent", "The Zeta Assistant", agent="other"))
        assert w.engine.find_agent_node("zeta") == a.id
