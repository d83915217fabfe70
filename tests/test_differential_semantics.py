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


# ---------------------------------------------------------------------------
# prompt selection math (selection.rs in-file tests, 34 cases)
# ---------------------------------------------------------------------------

from cortex_tpu.prompt.selection import (ContextSignals, context_fit,
                                         observation_score, score_variant,
                                         update_edge_weight)


class TestSelectionDifferential:
    """Exact-value mirrors of selection.rs:202-579."""

    def test_get_signal_sentiment_keys(self):
        s = ContextSignals(sentiment=0.8)
        assert s.get_signal("user_pleased") == pytest.approx(0.8)
        assert s.get_signal("sentiment_high") == pytest.approx(0.8)
        assert s.get_signal("user_frustrated") == pytest.approx(0.2)

    def test_get_signal_task_case_insensitive_both_directions(self):
        """selection.rs:251-264: 'CODING' client value matches task_coding,
        and 'task_CODING' key matches a lowercase task_type."""
        assert ContextSignals(task_type="CODING").get_signal(
            "task_coding") == 1.0
        assert ContextSignals(task_type="coding").get_signal(
            "task_CODING") == 1.0

    def test_get_signal_unknown_task_prefix_zero(self):
        """selection.rs:273-281: task_debugging is not the active type."""
        s = ContextSignals(task_type="coding")
        assert s.get_signal("task_debugging") == 0.0
        assert s.get_signal("") == 0.0
        assert s.get_signal("nonexistent_key") == 0.0

    def test_context_fit_none_for_all_zero_weights(self):
        """selection.rs:296-300."""
        assert context_fit({"user_pleased": 0.0, "task_coding": 0.0},
                           ContextSignals()) is None

    def test_context_fit_reference_value(self):
        """selection.rs:302-318: dot=1.11, abs_sum=1.2, fit=0.925."""
        signals = ContextSignals(sentiment=0.1, task_type="coding")
        fit = context_fit({"user_frustrated": 0.9, "task_coding": 0.3},
                          signals)
        assert fit == pytest.approx(0.925, abs=1e-3)

    def test_context_fit_negative_weight_clamps_to_zero(self):
        """selection.rs:320-343."""
        cw = {"energy_high": -0.8}
        assert context_fit(cw, ContextSignals(energy=1.0)) \
            == pytest.approx(0.0)
        assert context_fit(cw, ContextSignals(energy=0.0)) \
            == pytest.approx(0.0)

    def test_context_fit_ignores_unknown_keys(self):
        """selection.rs:345-352: unknown signal contributes 0 to the dot
        but its |w| still normalizes."""
        fit = context_fit({"completely_unknown_signal": 1.0},
                          ContextSignals())
        assert fit == pytest.approx(0.0)

    def test_score_variant_blend_consistency(self):
        """selection.rs:369-385."""
        signals = ContextSignals(sentiment=0.2, task_type="crisis")
        cw = {"user_frustrated": 0.8, "task_crisis": 0.9}
        fit = context_fit(cw, signals)
        expected = min(1.0, max(0.0, 0.5 * 0.6 + 0.5 * fit))
        assert score_variant(0.6, cw, signals) == pytest.approx(expected)

    def test_score_variant_prefers_contextual_match(self):
        """selection.rs:387-410."""
        signals = ContextSignals(sentiment=0.1, task_type="coding")
        matched = score_variant(
            0.5, {"user_frustrated": 0.9, "task_coding": 0.8}, signals)
        mismatched = score_variant(
            0.5, {"user_pleased": 0.9, "task_casual": 0.8}, signals)
        assert matched > mismatched

    @pytest.mark.parametrize("sentiment,corrections,outcome,expected", [
        (0.8, 1, "success", 0.87),    # selection.rs:426-431
        (0.5, 0, "partial", 0.65),    # :433-438
        (0.2, 5, "failure", 0.25),    # :440-445
        (1.0, 0, "success", 1.0),     # :469-475
        (0.0, 10, "failure", 0.0),    # :477-482
    ])
    def test_observation_score_reference_values(self, sentiment, corrections,
                                                outcome, expected):
        assert observation_score(sentiment, corrections, outcome) \
            == pytest.approx(expected, abs=0.01)

    def test_observation_score_unknown_equals_failure(self):
        assert observation_score(0.5, 0, "unknown") \
            == pytest.approx(observation_score(0.5, 0, "failure"))

    def test_observation_score_correction_saturation(self):
        """selection.rs:458-467: >=10 corrections saturate the penalty."""
        assert observation_score(0.5, 10, "success") \
            == pytest.approx(observation_score(0.5, 20, "success"))

    def test_update_edge_weight_values(self):
        """selection.rs:486-498: 0.9*0.8+0.1*1.0=0.82; 0.9*0.8=0.72."""
        assert update_edge_weight(0.8, 1.0) == pytest.approx(0.82, abs=1e-3)
        assert update_edge_weight(0.8, 0.0) == pytest.approx(0.72, abs=1e-3)

    def test_update_edge_weight_converges_to_score(self):
        """selection.rs:522-530: 200 steps at obs=0.3 from 0.8 -> ~0.3."""
        w = 0.8
        for _ in range(200):
            w = update_edge_weight(w, 0.3)
        assert w == pytest.approx(0.3, abs=0.01)

    def test_to_signal_map_consistent_with_get_signal(self):
        """selection.rs:561-578."""
        s = ContextSignals(sentiment=0.7, task_type="planning",
                           correction_rate=0.2, topic_shift=0.5, energy=0.9)
        for key, val in s.to_signal_map().items():
            assert s.get_signal(key) == pytest.approx(val), key


# ---------------------------------------------------------------------------
# linker config rules (linker/config.rs in-file tests, 31 cases)
# ---------------------------------------------------------------------------

from cortex_tpu.errors import ValidationError
from cortex_tpu.linker import AutoLinkerConfig, ConfigRule, RuleCondition


def _cnode(kind="fact", title="A node title", body="Body text", agent="a",
           tags=(), created=None):
    n = Node.new(kind, title, body, Source(agent=agent))
    n.tags = list(tags)
    if created is not None:
        n.created_at = created
    return n


class TestConfigRuleDifferential:
    """Mirrors of linker/config.rs:696-860 cases not already covered by
    test_linker.TestConfigRules."""

    def test_self_edge_prevention(self):
        """config.rs:271-285: a rule never links a node to itself even
        when kinds match and the condition passes."""
        r = ConfigRule(name="r", from_kind="fact", to_kind="fact",
                       relation="related_to",
                       condition=RuleCondition(type="always"))
        n = _cnode()
        assert r.evaluate(n, n, 1.0) == []

    def test_kind_gate_rejects_wrong_kinds(self):
        """config.rs:246-267: neither direction fires for wrong kinds."""
        r = ConfigRule(name="r", from_kind="decision", to_kind="event",
                       relation="led_to",
                       condition=RuleCondition(type="always"))
        fact = _cnode(kind="fact")
        event = _cnode(kind="event", title="Other title")
        assert r.evaluate(fact, event, 0.0) == []
        assert r.evaluate(event, fact, 0.0) == []

    def test_condition_min_similarity_boundary(self):
        """config.rs:298-305: >= is inclusive at the threshold."""
        c = RuleCondition(type="min_similarity", threshold=0.85)
        a, b = _cnode(), _cnode(title="Other title")
        assert c.evaluate(a, b, 0.90)
        assert c.evaluate(a, b, 0.85)
        assert not c.evaluate(a, b, 0.80)

    def test_condition_shared_tags(self):
        """config.rs:309-321."""
        c = RuleCondition(type="shared_tags", min_shared=2)
        a = _cnode(tags=["x", "y", "z"])
        assert c.evaluate(a, _cnode(title="B", tags=["y", "z"]), 0.0)
        assert not c.evaluate(a, _cnode(title="C", tags=["z"]), 0.0)

    def test_condition_same_agent(self):
        """config.rs:324-330."""
        c = RuleCondition(type="same_agent")
        a = _cnode(agent="alice")
        assert c.evaluate(a, _cnode(title="B", agent="alice"), 0.0)
        assert not c.evaluate(a, _cnode(title="C", agent="bob"), 0.0)

    def test_condition_temporal_proximity(self):
        """config.rs:334-346: within the window fires, outside doesn't."""
        c = RuleCondition(type="temporal_proximity", window_minutes=30)
        t0 = 1_700_000_000.0
        a = _cnode(created=t0)
        near = _cnode(title="B", created=t0 + 10 * 60)
        far = _cnode(title="C", created=t0 + 120 * 60)
        assert c.evaluate(a, near, 0.0)
        assert not c.evaluate(a, far, 0.0)

    def test_condition_newer_than_is_directional(self):
        """config.rs:350-356."""
        c = RuleCondition(type="newer_than")
        older = _cnode(created=1_700_000_000.0)
        newer = _cnode(title="B", created=1_700_000_100.0)
        assert c.evaluate(newer, older, 0.0)
        assert not c.evaluate(older, newer, 0.0)

    def test_condition_malformed_body_json(self):
        """config.rs:398-414: malformed or non-object JSON bodies never
        match body_field conditions (no exception)."""
        ref = RuleCondition(type="body_field_ref", field="prompt_id",
                            match_field="id")
        contains = RuleCondition(type="body_field_contains", field="facts",
                                 match_field="title")
        target = _cnode(kind="prompt", title="T")
        for bad in ("not json at all", '["a", "list"]', '42', ''):
            src = _cnode(kind="observation", title="S", body=bad)
            assert not ref.evaluate(src, target, 0.0)
            assert not contains.evaluate(src, target, 0.0)

    def test_condition_negation_detected_asymmetric(self):
        """config.rs:433-439: fires only when exactly one side negates."""
        c = RuleCondition(type="negation_detected")
        pos = _cnode(title="Coffee is great", body="Everyone loves it")
        neg = _cnode(title="Coffee is not great",
                     body="We no longer serve it")
        pos2 = _cnode(title="Tea is great", body="Also loved by everyone")
        assert c.evaluate(pos, neg, 0.0)
        assert not c.evaluate(pos, pos2, 0.0)

    def test_provenance_contains_rule_name(self):
        """config.rs:563+: auto_structural provenance carries the rule
        name so edges are attributable."""
        r = ConfigRule(name="my-custom-rule", from_kind="fact",
                       to_kind="fact", relation="related_to",
                       condition=RuleCondition(type="always"))
        out = r.evaluate(_cnode(), _cnode(title="Other title"), 0.0)
        assert len(out) == 1
        assert out[0].provenance.kind == "auto_structural"
        assert out[0].provenance.rule == "my-custom-rule"

    def test_duplicate_rule_names_rejected(self):
        """config.rs:154, test at :785-811."""
        cfg = AutoLinkerConfig(rules=[
            ConfigRule(name="duplicate", from_kind="fact", to_kind="fact",
                       relation="related_to"),
            ConfigRule(name="duplicate", from_kind="event", to_kind="event",
                       relation="related_to"),
        ])
        with pytest.raises(ValidationError, match="Duplicate rule name"):
            cfg.validate()

    def test_use_legacy_rules_matrix(self):
        """config.rs:517-561: default on without rules, auto-off with
        rules, explicit flag always wins."""
        rule = ConfigRule(name="r", from_kind="fact", to_kind="fact",
                          relation="related_to")
        assert AutoLinkerConfig().use_legacy_rules() is True
        assert AutoLinkerConfig(rules=[rule]).use_legacy_rules() is False
        assert AutoLinkerConfig(
            rules=[rule], legacy_rules_enabled=True).use_legacy_rules() is True
        assert AutoLinkerConfig(
            legacy_rules_enabled=False).use_legacy_rules() is False

    def test_all_condition_types_from_dict(self):
        """config.rs:92-117: every condition variant deserializes from
        its TOML dict form and validates."""
        cases = [
            {"type": "always"},
            {"type": "min_similarity", "threshold": 0.8},
            {"type": "shared_tags", "min_shared": 2},
            {"type": "same_agent"},
            {"type": "temporal_proximity", "window_minutes": 45},
            {"type": "newer_than"},
            {"type": "body_field_ref", "field": "a", "match_field": "id"},
            {"type": "body_field_contains", "field": "xs",
             "match_field": "title"},
            {"type": "tag_references_title", "tag_prefix": "goal-"},
            {"type": "negation_detected"},
        ]
        for d in cases:
            cond = RuleCondition.from_dict(d)
            cond.validate("r")
            assert cond.type == d["type"]


# ---------------------------------------------------------------------------
# prompt resolver (resolver.rs in-file tests, 27 cases)
# ---------------------------------------------------------------------------

from cortex_tpu.errors import PromptError
from cortex_tpu.prompt import PromptContent, PromptResolver
from cortex_tpu.storage import MemoryStorage


def _pc(slug, sections=None, **kw):
    return PromptContent(slug=slug, sections=sections or {"core": "x"}, **kw)


class TestResolverDifferential:
    """Mirrors of resolver.rs:415-1006 cases not already in
    test_prompt.TestResolver."""

    def setup_method(self):
        self.store = MemoryStorage()
        self.r = PromptResolver(self.store)

    def test_different_branches_independent(self):
        """resolver.rs create_prompt_different_branches_independent:
        the same slug may exist on two branches; each has its own
        HEAD and version chain."""
        self.r.create_prompt(_pc("helper", {"a": "1"}), branch="main")
        self.r.create_prompt(_pc("helper", {"b": "2"}), branch="exp")
        self.r.create_version("helper", "main", _pc("helper", {"a": "3"}))
        main = self.r.find_head("helper", "main")
        exp = self.r.find_head("helper", "exp")
        assert PromptContent.from_node(main).version == 2
        assert PromptContent.from_node(exp).version == 1
        assert PromptContent.from_node(exp).sections == {"b": "2"}

    def test_find_head_missing_slug_and_branch_none(self):
        """resolver.rs find_head_missing_{slug,branch}_returns_none."""
        assert self.r.find_head("ghost", "main") is None
        self.r.create_prompt(_pc("helper"))
        assert self.r.find_head("helper", "nope") is None

    def test_find_head_returns_newest_in_chain(self):
        self.r.create_prompt(_pc("helper", {"v": "1"}))
        self.r.create_version("helper", "main", _pc("helper", {"v": "2"}))
        nid3 = self.r.create_version("helper", "main",
                                     _pc("helper", {"v": "3"}))
        head = self.r.find_head("helper", "main")
        assert head.id == nid3
        assert PromptContent.from_node(head).version == 3

    def test_create_version_creates_supersedes_edge(self):
        """resolver.rs create_version_creates_supersedes_edge: new
        version -> old version via `supersedes`."""
        v1 = self.r.create_prompt(_pc("helper"))
        v2 = self.r.create_version("helper", "main", _pc("helper"))
        rels = [(e.from_id, e.to_id, e.relation)
                for e in self.store.edges_from(v2)]
        assert (v2, v1, "supersedes") in rels

    def test_create_version_missing_slug_fails(self):
        with pytest.raises(PromptError):
            self.r.create_version("ghost", "main", _pc("ghost"))

    def test_branch_copies_head_and_creates_edge(self):
        """resolver.rs create_branch_{copies_head_content,
        creates_branched_from_edge}."""
        self.r.create_prompt(_pc("helper", {"tone": "calm"}))
        src = self.r.find_head("helper", "main")
        bid = self.r.create_branch("helper", "main", "exp")
        b = self.r.find_head("helper", "exp")
        assert b.id == bid
        bc = PromptContent.from_node(b)
        assert bc.sections == {"tone": "calm"}
        assert bc.branch == "exp" and bc.version == 1
        rels = [(e.to_id, e.relation) for e in self.store.edges_from(bid)]
        assert (src.id, "branched_from") in rels

    def test_list_all_prompts_multiple_slugs_and_branches(self):
        """resolver.rs list_all_prompts_multiple_slugs_and_branches:
        one row per (slug, branch), each the HEAD version."""
        self.r.create_prompt(_pc("alpha"))
        self.r.create_version("alpha", "main", _pc("alpha"))
        self.r.create_prompt(_pc("beta"))
        self.r.create_branch("alpha", "main", "exp")
        rows = {(p.slug, p.branch): p.version
                for p in self.r.list_all_prompts()}
        assert rows == {("alpha", "main"): 2, ("alpha", "exp"): 1,
                        ("beta", "main"): 1}

    def test_list_all_prompts_empty_db(self):
        assert self.r.list_all_prompts() == []

    def test_list_versions_sorted_and_head_marked(self):
        """resolver.rs list_versions_{marks_only_head,sorted_ascending}."""
        self.r.create_prompt(_pc("helper"))
        self.r.create_version("helper", "main", _pc("helper"))
        self.r.create_version("helper", "main", _pc("helper"))
        infos = self.r.list_versions("helper", "main")
        assert [i.version for i in infos] == [1, 2, 3]
        assert [i.is_head for i in infos] == [False, False, True]

    def test_list_versions_empty_for_missing_slug(self):
        assert self.r.list_versions("ghost", "main") == []

    def test_parse_content_round_trips(self):
        """resolver.rs parse_content_round_trips via to_json/from_json."""
        c = PromptContent(slug="helper", prompt_type="skill", branch="b",
                          version=7, sections={"a": "1"},
                          metadata={"m": 2},
                          override_sections={"a": "2"},
                          context_weights={"user_pleased": 0.5})
        c2 = PromptContent.from_json(c.to_json())
        assert c2 == c

    def test_superseded_set(self):
        """resolver.rs superseded_set_{empty_for_single_version,
        excludes_head}."""
        v1 = self.r.create_prompt(_pc("helper"))
        nodes = [self.store.get_node(v1)]
        assert self.r.build_superseded_set(nodes) == set()
        v2 = self.r.create_version("helper", "main", _pc("helper"))
        nodes = [self.store.get_node(v1), self.store.get_node(v2)]
        sup = self.r.build_superseded_set(nodes)
        assert v1 in sup and v2 not in sup


class TestBriefingAutoDiscoveryExclude:
    def test_auto_discovery_exclude_kinds(self):
        """engine.rs test_auto_discovery_exclude_kinds: kinds listed in
        config.exclude_kinds never spawn auto-discovered sections even
        at high importance."""
        from cortex_tpu.briefing import BriefingConfig
        w = World(BriefingConfig(exclude_kinds=["scratch"]))
        w.put(mknode("scratch", "Ephemeral scratch item", importance=0.9))
        w.put(mknode("insight", "A kept insight entry", importance=0.9))
        b = w.engine.generate("kai")
        titles = [s.title for s in b.sections]
        assert "Insights" in titles
        assert not any("cratch" in t for t in titles), titles
