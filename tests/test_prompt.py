"""Prompt subsystem tests (parity model: 27 resolver + 34 selection +
rollback tests in the reference)."""

import json
import time

import pytest

from cortex_tpu.errors import PromptError
from cortex_tpu.prompt import (ContextSignals, PromptContent, PromptResolver,
                               RollbackConfig, RollbackMonitor,
                               compute_baseline_stats, context_fit,
                               epsilon_greedy_pick, observation_score,
                               score_variant, update_edge_weight)
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


@pytest.fixture
def store():
    return MemoryStorage()


@pytest.fixture
def resolver(store):
    return PromptResolver(store)


def content(slug, sections=None, overrides=None, ptype="persona"):
    return PromptContent(slug=slug, prompt_type=ptype,
                         sections=sections or {},
                         override_sections=overrides or {})


class TestResolver:
    def test_create_and_head(self, resolver):
        nid = resolver.create_prompt(content("helper", {"tone": "friendly"}))
        head = resolver.find_head("helper", "main")
        assert head is not None and head.id == nid
        assert head.title == "helper@main/v1"

    def test_duplicate_create_rejected(self, resolver):
        resolver.create_prompt(content("helper"))
        with pytest.raises(PromptError, match="already exists"):
            resolver.create_prompt(content("helper"))

    def test_version_chain(self, resolver):
        v1 = resolver.create_prompt(content("helper", {"tone": "a"}))
        v2 = resolver.create_version("helper", "main",
                                     content("helper", {"tone": "b"}))
        head = resolver.find_head("helper", "main")
        assert head.id == v2
        versions = resolver.list_versions("helper", "main")
        assert [v.version for v in versions] == [1, 2]
        assert [v.is_head for v in versions] == [False, True]

    def test_get_version(self, resolver):
        v1 = resolver.create_prompt(content("helper", {"tone": "a"}))
        resolver.create_version("helper", "main", content("helper"))
        got = resolver.get_version("helper", "main", 1)
        assert got is not None and got.id == v1

    def test_branching(self, resolver):
        resolver.create_prompt(content("helper", {"tone": "a"}))
        dev = resolver.create_branch("helper", "main", "dev")
        head_dev = resolver.find_head("helper", "dev")
        assert head_dev.id == dev
        c = PromptContent.from_node(head_dev)
        assert c.branch == "dev" and c.version == 1
        # main head unchanged
        assert resolver.find_head("helper", "main") is not None

    def test_branch_from_specific_version(self, resolver, store):
        resolver.create_prompt(content("helper", {"v": 1}))
        resolver.create_version("helper", "main", content("helper", {"v": 2}))
        nid = resolver.create_branch("helper", "main", "old", base_version=1)
        c = PromptContent.from_node(store.get_node(nid))
        assert c.sections == {"v": 1}

    def test_inheritance_merge(self, resolver, store):
        base_id = resolver.create_prompt(content(
            "base", {"tone": "neutral", "length": "short"}))
        child_id = resolver.create_prompt(content(
            "child", {"length": "long"}, overrides={"extra": "yes"}))
        store.put_edge(Edge.new(child_id, base_id, "inherits_from", 1.0,
                                EdgeProvenance.manual("t")))
        head = resolver.find_head("child", "main")
        r = resolver.resolve(head)
        assert r.content == {"tone": "neutral", "length": "long",
                             "extra": "yes"}
        assert r.lineage == ["base", "child"]

    def test_inheritance_cycle_guard(self, resolver, store):
        a = resolver.create_prompt(content("a"))
        b = resolver.create_prompt(content("b"))
        store.put_edge(Edge.new(a, b, "inherits_from", 1.0,
                                EdgeProvenance.manual("t")))
        store.put_edge(Edge.new(b, a, "inherits_from", 1.0,
                                EdgeProvenance.manual("t")))
        r = resolver.resolve(resolver.find_head("a", "main"))
        assert r.slug == "a"     # terminates

    def test_skills_via_used_by(self, resolver, store):
        p = resolver.create_prompt(content("persona-x"))
        s = resolver.create_prompt(content("skill-search", ptype="skill"))
        store.put_edge(Edge.new(s, p, "used_by", 1.0,
                                EdgeProvenance.manual("t")))
        r = resolver.resolve(resolver.find_head("persona-x", "main"))
        assert r.skills == ["skill-search"]

    def test_list_all_prompts_heads_only(self, resolver):
        resolver.create_prompt(content("a"))
        resolver.create_version("a", "main", content("a"))
        resolver.create_prompt(content("b"))
        infos = resolver.list_all_prompts()
        assert [(i.slug, i.version) for i in infos] == [("a", 2), ("b", 1)]

    def test_version_missing_prompt(self, resolver):
        with pytest.raises(PromptError, match="not found"):
            resolver.create_version("ghost", "main", content("ghost"))


class TestSelectionMath:
    def test_get_signal(self):
        s = ContextSignals(sentiment=0.8, task_type="coding",
                           correction_rate=0.2, topic_shift=0.4, energy=0.6)
        assert s.get_signal("user_pleased") == pytest.approx(0.8)
        assert s.get_signal("sentiment_high") == pytest.approx(0.8)
        assert s.get_signal("user_frustrated") == pytest.approx(0.2)
        assert s.get_signal("correction_rate_high") == pytest.approx(0.2)
        assert s.get_signal("topic_shift_high") == pytest.approx(0.4)
        assert s.get_signal("energy_high") == pytest.approx(0.6)
        assert s.get_signal("task_coding") == 1.0
        assert s.get_signal("task_CODING") == 1.0
        assert s.get_signal("task_casual") == 0.0
        assert s.get_signal("unknown_signal") == 0.0

    def test_signal_map(self):
        m = ContextSignals(task_type="crisis").to_signal_map()
        assert m["task_crisis"] == 1.0
        assert m["task_coding"] == 0.0
        assert "user_pleased" in m

    def test_context_fit_none_cases(self):
        s = ContextSignals()
        assert context_fit(None, s) is None
        assert context_fit({}, s) is None
        assert context_fit({"task_coding": 0.0}, s) is None

    def test_context_fit_normalized(self):
        s = ContextSignals(sentiment=1.0, task_type="coding")
        fit = context_fit({"user_pleased": 1.0, "task_coding": 1.0}, s)
        assert fit == pytest.approx(1.0)
        fit2 = context_fit({"user_pleased": 1.0, "task_casual": 1.0}, s)
        assert fit2 == pytest.approx(0.5)

    def test_context_fit_negative_weights(self):
        s = ContextSignals(sentiment=0.0)     # user_frustrated = 1
        fit = context_fit({"user_frustrated": -1.0}, s)
        assert fit == 0.0     # clamped

    def test_score_variant_blend(self):
        s = ContextSignals(sentiment=1.0)
        score = score_variant(0.6, {"user_pleased": 1.0}, s)
        assert score == pytest.approx(0.5 * 0.6 + 0.5 * 1.0)

    def test_score_variant_fallback(self):
        assert score_variant(0.42, None, ContextSignals()) == \
            pytest.approx(0.42)

    def test_observation_score(self):
        assert observation_score(1.0, 0, "success") == pytest.approx(1.0)
        assert observation_score(0.0, 10, "failure") == pytest.approx(0.0)
        assert observation_score(0.5, 0, "partial") == \
            pytest.approx(0.5 * 0.5 + 0.3 + 0.2 * 0.5)
        # penalty saturates at 10 corrections
        assert observation_score(0.5, 20, "unknown") == \
            pytest.approx(observation_score(0.5, 10, "unknown"))

    def test_update_edge_weight_ema(self):
        w = update_edge_weight(0.5, 1.0)
        assert w == pytest.approx(0.55)
        # converges toward observation
        for _ in range(100):
            w = update_edge_weight(w, 1.0)
        assert w > 0.99

    def test_epsilon_greedy(self):
        import random
        rng = random.Random(0)
        scored = {"a": 0.9, "b": 0.1}
        picks = [epsilon_greedy_pick(scored, 0.0, rng) for _ in range(10)]
        assert all(p == "a" for p in picks)
        picks = {epsilon_greedy_pick(scored, 1.0, rng) for _ in range(50)}
        assert picks == {"a", "b"}
        assert epsilon_greedy_pick({}, 0.2) is None


class TestRollback:
    def deploy(self, store, baseline=None):
        resolver = PromptResolver(store)
        v1 = resolver.create_prompt(content("helper", {"v": 1}))
        v2 = resolver.create_version("helper", "main",
                                     content("helper", {"v": 2}))
        mon = RollbackMonitor(store)
        dep_id = mon.record_deployment(
            "helper", "main", 2, v2, "kai",
            baseline or [(0.1, 0.8), (0.12, 0.75), (0.11, 0.82)])
        return store, mon, v1, v2, dep_id

    def obs_node(self, store, i=0):
        n = Node.new("observation", f"Interaction observation {i}",
                     "Observed interaction outcome details here",
                     Source(agent="kai"), 0.5)
        store.put_node(n)
        return n.id

    def test_baseline_stats(self):
        mc, sc, ms, ss = compute_baseline_stats([])
        assert (mc, sc, ms, ss) == (0.15, 0.05, 0.7, 0.1)
        mc, sc, ms, ss = compute_baseline_stats([(0.1, 0.8), (0.2, 0.6)])
        assert mc == pytest.approx(0.15)
        assert ms == pytest.approx(0.7)
        assert sc >= 0.01 and ss >= 0.01

    def test_healthy_observations_no_rollback(self, store):
        store, mon, v1, v2, dep = self.deploy(store)
        for i in range(6):
            r = mon.process_observation(self.obs_node(store, i), v2,
                                        0.1, 0.8, 0.8)
            assert r is None

    def test_consecutive_negative_triggers(self, store):
        store, mon, v1, v2, dep = self.deploy(store)
        result = None
        for i in range(5):
            result = mon.process_observation(self.obs_node(store, i), v2,
                                             0.12, 0.75, 0.2)
            if result:
                break
        assert result is not None
        assert result.trigger.kind == "consecutive_negative"
        assert result.to_node_id == v1
        # tags applied
        assert "auto-rolled-back" in store.get_node(v2).tags

    def test_correction_sigma_triggers(self, store):
        store, mon, v1, v2, dep = self.deploy(
            store, baseline=[(0.1, 0.8)] * 10)
        result = None
        for i in range(6):
            # large correction-rate spike, but positive obs score
            result = mon.process_observation(self.obs_node(store, i), v2,
                                             0.9, 0.8, 0.9)
            if result:
                break
        assert result is not None
        assert result.trigger.kind in ("correction_rate_sigma",
                                       "absolute_correction_increase")

    def test_cooldown_blocks_further_rollbacks(self, store):
        store, mon, v1, v2, dep = self.deploy(store)
        result = None
        for i in range(5):
            result = mon.process_observation(self.obs_node(store, i), v2,
                                             0.12, 0.75, 0.2)
            if result:
                break
        assert result is not None
        # re-deploy and observe again: cooldown suppresses
        mon.record_deployment("helper", "main", 2, v2, "kai", [(0.1, 0.8)])
        r2 = mon.process_observation(self.obs_node(store, 99), v2,
                                     0.9, 0.1, 0.1)
        assert r2 is None

    def test_stable_after_window(self, store):
        cfg = RollbackConfig(monitoring_window=3,
                             min_samples_before_check=5)
        resolver = PromptResolver(store)
        resolver.create_prompt(content("helper", {"v": 1}))
        v2 = resolver.create_version("helper", "main",
                                     content("helper", {"v": 2}))
        mon = RollbackMonitor(store, cfg)
        dep = mon.record_deployment("helper", "main", 2, v2, "kai",
                                    [(0.1, 0.8)])
        for i in range(3):
            mon.process_observation(self.obs_node(store, i), v2,
                                    0.1, 0.8, 0.8)
        dep_node = store.get_node(dep)
        assert json.loads(dep_node.body)["status"] == "stable"

    def test_status_reporting(self, store):
        store, mon, v1, v2, dep = self.deploy(store)
        st = mon.get_status("helper", "main")
        assert st is not None
        assert st.current_version == 2
        assert st.active_deployment is not None
        assert st.rollback_count == 0
        # trigger a rollback
        for i in range(5):
            if mon.process_observation(self.obs_node(store, i), v2,
                                       0.12, 0.75, 0.2):
                break
        st2 = mon.get_status("helper", "main")
        assert st2.rollback_count == 1
        assert st2.recent_rollbacks[0].trigger == "consecutive_negative"
        assert st2.cooldown_expires_at is not None

    def test_quarantine_and_unquarantine(self, store):
        cfg = RollbackConfig(max_rollbacks_before_quarantine=1)
        resolver = PromptResolver(store)
        v1 = resolver.create_prompt(content("helper", {"v": 1}))
        v2 = resolver.create_version("helper", "main",
                                     content("helper", {"v": 2}))
        mon = RollbackMonitor(store, cfg)
        mon.record_deployment("helper", "main", 2, v2, "kai", [(0.1, 0.8)])
        result = None
        for i in range(5):
            result = mon.process_observation(self.obs_node(store, i), v2,
                                             0.12, 0.75, 0.2)
            if result:
                break
        assert result is not None and result.is_quarantined
        assert "quarantined" in store.get_node(v2).tags
        mon.unquarantine(v2)
        assert "quarantined" not in store.get_node(v2).tags

    def test_rollback_without_previous_version_fails_gracefully(self, store):
        resolver = PromptResolver(store)
        v1 = resolver.create_prompt(content("solo", {"v": 1}))
        mon = RollbackMonitor(store)
        mon.record_deployment("solo", "main", 1, v1, "kai", [(0.1, 0.8)])
        with pytest.raises(PromptError, match="no previous version"):
            for i in range(5):
                mon.process_observation(self.obs_node(store, i), v1,
                                        0.12, 0.75, 0.2)

    def test_uses_edges_depressed(self, store):
        store, mon, v1, v2, dep = self.deploy(store)
        agent = Node.new("agent", "Kai the assistant", "The kai agent node",
                         Source(agent="kai"), 0.8)
        store.put_node(agent)
        e = Edge.new(agent.id, v2, "uses", 0.9, EdgeProvenance.manual("t"))
        store.put_edge(e)
        for i in range(5):
            if mon.process_observation(self.obs_node(store, i), v2,
                                       0.12, 0.75, 0.2):
                break
        assert store.get_edge(e.id).weight == pytest.approx(0.1)
