"""Differential semantics tests (r1 VERDICT #10): the reference's
densest in-file test cases for the briefing engine
(crates/cortex-core/src/briefing/engine.rs:906-1878) and the rollback
monitor (crates/cortex-core/src/prompt/rollback.rs:832-1421),
re-expressed as table-driven cases against this implementation. Each
test names the reference case it mirrors.
"""

import json

import pytest

from cortex_tpu.briefing import BriefingConfig
from cortex_tpu.prompt import PromptContent, PromptResolver
from cortex_tpu.prompt.rollback import (RollbackConfig, RollbackMonitor,
                                        compute_baseline_stats,
                                        compute_cooldown_hours)
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Node, Source

from test_briefing import World, agent_world, mknode


# ---------------------------------------------------------------------------
# briefing engine
# ---------------------------------------------------------------------------


class TestBriefingDifferential:
    def test_identity_section_includes_preferences(self):
        """engine.rs test_identity_section_includes_preferences."""
        w, agent, pref, *_ = agent_world()
        b = w.engine.generate("kai")
        sec = next(s for s in b.sections
                   if s.title == "Identity & Preferences")
        assert any(n.kind == "preference" for n in sec.nodes)

    def test_max_items_per_section_enforced(self):
        """engine.rs test_max_items_per_section_enforced: 20 linked
        preferences, cap 5 -> every section holds <= 5 items."""
        w = World(BriefingConfig(max_items_per_section=5))
        agent = w.put(mknode("agent", "Kai the assistant", agent="kai"))
        for i in range(20):
            p = w.put(mknode("preference", f"Preference number {i}",
                             importance=0.5))
            w.link(p, agent, "applies_to")
        b = w.engine.generate("kai")
        for s in b.sections:
            assert len(s.nodes) <= 5, (s.title, len(s.nodes))

    def test_recent_events_overflow_from_active_context(self):
        """engine.rs test_recent_events_section_overflow_from_active_
        context: 5 events with per-section cap 2 -> Recent Events is
        non-empty (Active Context can't absorb them all)."""
        w = World(BriefingConfig(max_items_per_section=2))
        for i in range(5):
            w.put(mknode("event", f"Event number {i}", importance=0.6))
        b = w.engine.generate("kai")
        assert any(s.title == "Recent Events" and s.nodes
                   for s in b.sections)

    def test_auto_discovery_default_kinds_only(self):
        """engine.rs test_auto_discovery_default_kinds_only: default
        kinds never spawn auto-discovered sections."""
        w = World()
        w.put(mknode("agent", "Kai the assistant", agent="kai"))
        w.put(mknode("fact", "A plain stored fact", importance=0.6))
        w.put(mknode("pattern", "A recurring pattern", importance=0.6))
        b = w.engine.generate("kai")
        known = {"Identity & Preferences", "Patterns", "Goals",
                 "Unresolved Contradictions", "Active Context",
                 "Recent Events", "Key Decisions", "Facts"}
        extra = [s.title for s in b.sections if s.title not in known]
        assert not extra, extra

    def test_auto_discovery_novel_kind(self):
        """engine.rs test_auto_discovery_novel_kind: a high-importance
        node of a novel kind spawns a pluralized section holding it."""
        w = World()
        w.put(mknode("experiment", "Test the A/B variant",
                     importance=0.8))
        b = w.engine.generate("kai")
        sec = next((s for s in b.sections if s.title == "Experiments"),
                   None)
        assert sec is not None
        assert [n.title for n in sec.nodes] == ["Test the A/B variant"]

    def test_auto_discovery_multiple_kinds_sorted(self):
        """engine.rs test_auto_discovery_multiple_kinds_sorted: sections
        ordered by total importance desc (constraint 0.9 before
        insight 0.4)."""
        w = World()
        w.put(mknode("insight", "Small observation insight",
                     importance=0.4))
        w.put(mknode("constraint", "Critical hard constraint",
                     importance=0.9))
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        assert "Constraints" in titles and "Insights" in titles
        assert titles.index("Constraints") < titles.index("Insights")

    def test_auto_discovery_skips_low_importance(self):
        """engine.rs test_auto_discovery_skips_low_importance:
        importance below the 0.3 floor never surfaces."""
        w = World()
        w.put(mknode("experiment", "Low importance experiment",
                     importance=0.1))
        b = w.engine.generate("kai")
        assert not any(s.title == "Experiments" for s in b.sections)

    def test_auto_discovery_seen_ids_dedup(self):
        """engine.rs test_auto_discovery_seen_ids_dedup: a node appears
        in exactly ONE section across the whole briefing."""
        w = World()
        exp = w.put(mknode("experiment", "Dedup check experiment",
                           importance=0.8))
        b = w.engine.generate("kai")
        appearances = sum(1 for s in b.sections
                          for n in s.nodes if n.id == exp.id)
        assert appearances == 1

    def test_auto_discovery_before_active_context(self):
        """engine.rs test_auto_discovery_before_active_context."""
        w = World()
        w.put(mknode("experiment", "Ordering check experiment",
                     importance=0.8))
        w.put(mknode("fact", "A fact for active context",
                     importance=0.5))
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        if "Experiments" in titles and "Active Context" in titles:
            assert (titles.index("Experiments")
                    < titles.index("Active Context"))

    def test_access_tracking_uses_record_access(self):
        """engine.rs test_access_tracking_uses_record_access: serving a
        briefing bumps access_count AND stamps last_accessed_at."""
        w, agent, pref, *_ = agent_world()
        a0 = w.s.get_node(agent.id)
        assert a0.access_count == 0
        w.engine.generate("kai")
        a1 = w.s.get_node(agent.id)
        p1 = w.s.get_node(pref.id)
        assert a1.access_count == 1
        assert a1.last_accessed_at is not None
        assert p1.access_count == 1

    def test_briefing_empty_graph(self):
        """engine.rs test_briefing_empty_graph: no nodes -> generate
        and render succeed with an empty-but-valid briefing."""
        w = World()
        b = w.engine.generate("nobody")
        assert sum(len(s.nodes) for s in b.sections) == 0
        text = w.engine.render(b, compact=False)
        assert isinstance(text, str)

    def test_renderer_unicode_no_panic(self):
        """engine.rs test_renderer_unicode_no_panic: multibyte content
        truncates on character boundaries without raising."""
        w = World(BriefingConfig(max_chars=120))
        w.put(mknode("fact", "Unicode content éèê test",
                     body="日本語" * 200, importance=0.8))
        b = w.engine.generate("kai")
        for compact in (False, True):
            text = w.engine.render(b, compact=compact)
            assert isinstance(text, str)
            text.encode("utf-8")      # must be valid text, no surrogates


# ---------------------------------------------------------------------------
# rollback monitor
# ---------------------------------------------------------------------------


def content(slug, sections):
    return PromptContent(slug=slug, prompt_type="system", sections=sections)


class TestRollbackDifferential:
    def test_baseline_stats_empty_returns_defaults(self):
        """rollback.rs baseline_stats_empty_returns_defaults."""
        assert compute_baseline_stats([]) == (0.15, 0.05, 0.7, 0.1)

    def test_baseline_stats_single_observation(self):
        """rollback.rs baseline_stats_single_observation: exact means,
        stddevs floored at 0.01."""
        mc, sc, ms, ss = compute_baseline_stats([(0.2, 0.8)])
        assert mc == pytest.approx(0.2)
        assert ms == pytest.approx(0.8)
        assert sc == pytest.approx(0.01)
        assert ss == pytest.approx(0.01)

    def test_baseline_stats_multiple(self):
        """rollback.rs baseline_stats_multiple: population stats over
        [(0.1,0.9),(0.2,0.8),(0.3,0.7)]."""
        mc, sc, ms, ss = compute_baseline_stats(
            [(0.1, 0.9), (0.2, 0.8), (0.3, 0.7)])
        assert mc == pytest.approx(0.2, abs=1e-4)
        assert ms == pytest.approx(0.8, abs=1e-4)
        assert sc > 0.01 and ss > 0.01
        assert sc == pytest.approx((0.02 / 3) ** 0.5, abs=1e-4)

    def test_rollback_config_default_thresholds(self):
        """rollback.rs rollback_config_default_thresholds."""
        cfg = RollbackConfig()
        assert cfg.monitoring_window == 20
        assert cfg.correction_rate_rollback == 3.0
        assert cfg.consecutive_negative_limit == 3
        assert cfg.max_rollbacks_before_quarantine == 3
        assert cfg.cooldown_base_hours == 1

    @pytest.mark.parametrize("base,count,hours", [
        # rollback.rs cooldown_doubles_with_cap, base = 1
        (1, 1, 1), (1, 2, 2), (1, 3, 4), (1, 8, 128),
        (1, 9, 128),           # shift capped at 7, stays 128
        (1, 20, 128),
        # base = 2: 2*128 = 256 is capped at 168h (one week)
        (2, 1, 2), (2, 2, 4), (2, 7, 128), (2, 8, 168), (2, 20, 168),
    ])
    def test_cooldown_doubles_with_cap(self, base, count, hours):
        assert compute_cooldown_hours(base, count) == hours

    # ---------------------------------------------------- trigger matrix
    def deploy(self, baseline):
        store = MemoryStorage()
        resolver = PromptResolver(store)
        resolver.create_prompt(content("helper", {"v": "one"}))
        v2 = resolver.create_version("helper", "main",
                                     content("helper", {"v": "two"}))
        mon = RollbackMonitor(store)
        mon.record_deployment("helper", "main", 2, v2, "kai", baseline)
        return store, mon, v2

    def obs(self, store, i):
        n = Node.new("observation", f"Differential observation {i}",
                     "Observed interaction outcome details here",
                     Source(agent="kai"), 0.5)
        store.put_node(n)
        return n.id

    def test_sentiment_sigma_triggers(self):
        """rollback.rs trigger family: sustained sentiment collapse
        with LOW correction rate -> sentiment_sigma fires (and not the
        correction triggers)."""
        store, mon, v2 = self.deploy([(0.1, 0.9)] * 10)
        result = None
        for i in range(8):
            # sentiment 0.1 vs baseline 0.9 (stddev floor 0.01) but
            # obs_score 0.5 avoids the consecutive-negative trigger
            result = mon.process_observation(self.obs(store, i), v2,
                                             0.1, 0.1, 0.5)
            if result:
                break
        assert result is not None
        assert result.trigger.kind == "sentiment_sigma"

    def test_absolute_correction_increase_triggers(self):
        """rollback.rs trigger family: +0.25 absolute correction-rate
        increase fires even when the baseline stddev is wide (sigma
        stays under 3)."""
        store, mon, v2 = self.deploy(
            [(0.05, 0.8), (0.45, 0.8), (0.05, 0.8), (0.45, 0.8),
             (0.05, 0.8), (0.45, 0.8)])      # mean .25, stddev .2
        result = None
        for i in range(10):
            result = mon.process_observation(self.obs(store, i), v2,
                                             0.75, 0.8, 0.9)
            if result:
                break
        assert result is not None
        assert result.trigger.kind == "absolute_correction_increase"

    def test_rollback_event_node_is_tag_queryable(self):
        """rollback.rs list_rollback_events_uses_tag_filter: rollback
        events are event-kind nodes tagged 'rollback' carrying the full
        trigger payload, discoverable via the tag index."""
        from cortex_tpu.storage import NodeFilter
        store, mon, v2 = self.deploy([(0.1, 0.8)] * 10)
        for i in range(6):
            if mon.process_observation(self.obs(store, i), v2,
                                       0.9, 0.8, 0.1):
                break
        events = store.list_nodes(NodeFilter(kinds=["event"],
                                             tags=["rollback"]))
        assert len(events) == 1
        body = json.loads(events[0].body)
        assert body["event_type"] == "rollback"
        assert body["slug"] == "helper" and body["branch"] == "main"
        assert body["from_version"] == 2 and body["to_version"] == 1
        assert body["rollback_count"] == 1
        assert body["cooldown_hours"] == 1

    def test_status_after_window_exhausted_is_stable(self):
        """rollback.rs monitoring_window_exhausted_marks_stable: after
        the monitoring window fills with healthy observations the
        deployment's status flips to 'stable' and no rollback fires."""
        from cortex_tpu.storage import NodeFilter
        store, mon, v2 = self.deploy([(0.1, 0.8)] * 5)
        for i in range(25):
            assert mon.process_observation(self.obs(store, i), v2,
                                           0.1, 0.8, 0.9) is None
        st = mon.get_status("helper", "main")
        assert st is not None and st.rollback_count == 0
        dep = next(n for n in store.list_nodes(NodeFilter(kinds=["event"]))
                   if "deployment" in n.title or
                   json.loads(n.body).get("event_type") == "deployment")
        body = json.loads(dep.body)
        assert body["status"] == "stable"
        assert body["n_observed"] >= 20
