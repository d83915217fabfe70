"""Write gate, query DSL, retention, audit, hooks tests
(parity model: reference gate tests, 37 DSL tests, retention tests)."""

import time

import numpy as np
import pytest

from cortex_tpu.gate import (SchemaValidator, WriteGate, WriteGateConfig,
                             KindOverrideConfig)
from cortex_tpu.gate.schema import FieldSchema, KindSchema
from cortex_tpu.hooks import HookRegistry, MutationHook
from cortex_tpu.policies import (AuditLog, KindRetention, RetentionConfig,
                                 RetentionEngine, RetentionMaxNodes)
from cortex_tpu.query import (CompileError, ParseError, parse,
                              parse_and_compile)
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source
from cortex_tpu.vector import HashingEmbedder, TpuFlatIndex

CFG = WriteGateConfig()


def mknode(kind="fact", title="A perfectly good title",
           body="This body has plenty of useful standalone context.",
           importance=0.5, tags=(), agent="t"):
    n = Node.new(kind, title, body, Source(agent=agent), importance)
    n.tags = list(tags)
    return n


class TestSubstance:
    def check(self, n):
        return WriteGate.check_substance(n, CFG)

    def test_pass(self):
        assert self.check(mknode()) is None

    def test_short_title(self):
        r = self.check(mknode(title="Short"))
        assert r and r.check == "substance" and "Title too short" in r.reason

    def test_short_body(self):
        r = self.check(mknode(body="tiny body"))
        assert r and "Body too short" in r.reason

    def test_body_equals_title(self):
        t = "Same text in both title and body"
        r = self.check(mknode(title=t, body=t))
        assert r and "identical to title" in r.reason

    def test_bare_url(self):
        r = self.check(mknode(body="https://example.com/some/long/path/here"))
        assert r and "bare URL" in r.reason

    def test_single_word(self):
        r = self.check(mknode(body="supercalifragilisticexpialidocious"))
        assert r and "single word" in r.reason

    def test_timestamp_rejected(self):
        # a bare timestamp body is rejected — via the single-word check for
        # single tokens, or the length floor for short ones (reference check
        # order: length -> url -> single word -> timestamp)
        for body in ("17268399571234567890", "2026-01-15T10:30:00Z",
                     "2026-01-15  "):
            r = self.check(mknode(body=body))
            assert r is not None and r.check == "substance"

    def test_is_just_timestamp_helper(self):
        from cortex_tpu.gate import _is_just_timestamp
        assert _is_just_timestamp("1726839957")
        assert _is_just_timestamp("2026-01-15")
        assert _is_just_timestamp("2026-01-15T10:30:00Z")
        assert not _is_just_timestamp("2026-01-15 10:30")
        assert not _is_just_timestamp("hello world")

    def test_decision_needs_action_words(self):
        r = self.check(mknode(kind="decision",
                              body="Something about the architecture topic."))
        assert r and "Decision nodes" in r.reason
        assert self.check(mknode(
            kind="decision",
            body="We decided to adopt postgres for the backend.")) is None

    def test_fact_hedging(self):
        r = self.check(mknode(kind="fact",
                              body="I think the server runs on port 8080."))
        assert r and "hedging" in r.reason
        assert self.check(mknode(
            kind="fact", body="The server runs on port 8080 in prod.")) is None

    def test_pattern_needs_recurrence(self):
        r = self.check(mknode(kind="pattern",
                              body="The deploy failed with an odd error."))
        assert r and "Pattern nodes" in r.reason
        assert self.check(mknode(
            kind="pattern",
            body="The deploy always fails when disk is full.")) is None

    def test_per_kind_min_body_override(self):
        cfg = WriteGateConfig(overrides={
            "event": KindOverrideConfig(min_body_length=5)})
        n = mknode(kind="event", body="tiny body")
        assert WriteGate.check_substance(n, cfg) is None


class TestSpecificity:
    def check(self, n, cfg=CFG):
        return WriteGate.check_specificity(n, cfg)

    def test_pass(self):
        assert self.check(mknode()) is None

    def test_unresolved_pronoun(self):
        r = self.check(mknode(title="the preference noted",
                              body="He prefers short answers in chat."))
        assert r and "pronoun" in r.reason

    def test_pronoun_resolved_by_title(self):
        n = mknode(title="Marcus communication preference",
                   body="He prefers short answers in chat.")
        assert self.check(n) is None

    def test_relative_time_in_title(self):
        r = self.check(mknode(title="What happened yesterday in standup"))
        assert r and "relative time" in r.reason

    def test_relative_time_body_start(self):
        r = self.check(mknode(body="Last week we changed the deploy "
                                   "process to use canary releases."))
        assert r and "relative time" in r.reason

    def test_high_importance_needs_long_body(self):
        r = self.check(mknode(importance=0.9, tags=["x"],
                              body="Short-ish body under one hundred chars."))
        assert r and "High importance" in r.reason
        long_body = "x" * 100 + " detailed explanation of the thing."
        assert self.check(mknode(importance=0.9, tags=["x"],
                                 body=long_body)) is None

    def test_importance_08_needs_50(self):
        r = self.check(mknode(importance=0.8, tags=["x"],
                              body="under fifty characters body"))
        assert r and "High importance" in r.reason

    def test_high_importance_needs_tags(self):
        body = "x" * 120
        r = self.check(mknode(importance=0.75, body=body))
        assert r and "tags" in r.reason
        assert self.check(mknode(importance=0.75, tags=["y"],
                                 body=body)) is None


class TestConflict:
    def setup_index(self):
        s = MemoryStorage()
        emb = HashingEmbedder(64)
        idx = TpuFlatIndex(64)
        existing = mknode(title="Database runs postgres fourteen",
                          body="Our primary database is postgres fourteen.",
                          agent="alice")
        existing.embedding = emb.embed_node(existing).tolist()
        s.put_node(existing)
        idx.insert(existing.id, np.asarray(existing.embedding),
                   kind=existing.kind, source_agent=existing.source.agent)
        return s, emb, idx, existing

    def test_duplicate_rejected(self):
        s, emb, idx, existing = self.setup_index()
        dup = mknode(title="Database runs postgres fourteen",
                     body="Our primary database is postgres fourteen.",
                     agent="bob")
        e = emb.embed_node(dup)
        r = WriteGate.check_conflict(dup, e, idx, s, CFG)
        assert r and "Near-duplicate" in r.reason
        assert r.existing_node == existing.id
        assert r.existing_title == existing.title

    def test_same_kind_other_agent_contradiction(self):
        s, emb, idx, existing = self.setup_index()
        near = mknode(title="Database runs postgres fifteen",
                      body="Our primary database is postgres fifteen now ok.",
                      agent="bob")
        e = emb.embed_node(near)
        r = WriteGate.check_conflict(near, e, idx, s, CFG)
        if r is not None:   # similarity depends on hash embedding overlap
            assert r.check == "conflict"

    def test_unrelated_passes(self):
        s, emb, idx, _ = self.setup_index()
        other = mknode(title="Weather tomorrow is sunny",
                       body="Completely unrelated content about weather.")
        e = emb.embed_node(other)
        assert WriteGate.check_conflict(other, e, idx, s, CFG) is None

    def test_empty_index_passes(self):
        s = MemoryStorage()
        idx = TpuFlatIndex(8)
        n = mknode()
        assert WriteGate.check_conflict(n, np.ones(8, np.float32), idx, s,
                                        CFG) is None


class TestSchemaCheck:
    def validator(self):
        return SchemaValidator({"decision": KindSchema(
            required_fields=["status"],
            fields={
                "status": FieldSchema(field_type="string",
                                      allowed_values=["active", "done"]),
                "confidence": FieldSchema(field_type="number", min=0, max=1),
                "reviewed": FieldSchema(field_type="boolean"),
                "links": FieldSchema(field_type="array"),
            })})

    def test_missing_required(self):
        n = mknode(kind="decision")
        r = WriteGate.check_schema(n, self.validator())
        assert r and "required field missing" in r.reason

    def test_wrong_type(self):
        n = mknode(kind="decision")
        n.metadata = {"status": 42}
        r = WriteGate.check_schema(n, self.validator())
        assert r and "expected type string" in r.reason

    def test_range(self):
        n = mknode(kind="decision")
        n.metadata = {"status": "active", "confidence": 1.5}
        r = WriteGate.check_schema(n, self.validator())
        assert r and "exceeds maximum" in r.reason

    def test_allowed_values(self):
        n = mknode(kind="decision")
        n.metadata = {"status": "pending"}
        r = WriteGate.check_schema(n, self.validator())
        assert r and "not in allowed values" in r.reason

    def test_unschema_kind_passes(self):
        n = mknode(kind="fact")
        n.metadata = {"anything": [1, 2, 3]}
        assert WriteGate.check_schema(n, self.validator()) is None

    def test_valid_passes(self):
        n = mknode(kind="decision")
        n.metadata = {"status": "active", "confidence": 0.8,
                      "reviewed": True, "links": ["a"]}
        assert WriteGate.check_schema(n, self.validator()) is None

    def test_gate_skip_still_enforces_schema(self):
        s = MemoryStorage()
        n = mknode(kind="decision", title="ok", body="x")
        r = WriteGate.check_all(n, None, None, s, CFG, self.validator(),
                                skip_quality=True)
        assert r and r.check == "schema"


class TestQueryDsl:
    def test_kind(self):
        f = parse_and_compile("kind:decision")
        assert f.kinds == ["decision"]

    def test_kind_list(self):
        f = parse_and_compile("kind:decision,pattern")
        assert f.kinds == ["decision", "pattern"]

    def test_tags(self):
        f = parse_and_compile("tags:backend,rust")
        assert f.tags == ["backend", "rust"]

    def test_agent(self):
        f = parse_and_compile("agent:kai")
        assert f.source_agent == "kai"

    def test_importance_ops(self):
        assert parse_and_compile("importance>0.7").min_importance == \
            pytest.approx(0.7)
        assert parse_and_compile("importance>=0.5").min_importance == \
            pytest.approx(0.5)
        eq = parse_and_compile("importance=0.3")
        assert eq.min_importance == pytest.approx(0.3)
        assert eq.max_importance == pytest.approx(0.3)   # true equality

    def test_importance_upper_bounds(self):
        assert parse_and_compile("importance<=0.5").max_importance == \
            pytest.approx(0.5)
        lt = parse_and_compile("importance<0.5")
        assert lt.max_importance < 0.5                   # strict

    def test_tags_or_is_any(self):
        """tags:a OR tags:b must be a union, not an ALL-of intersection."""
        from cortex_tpu.storage import MemoryStorage
        from cortex_tpu.types import Node, Source
        s = MemoryStorage()
        a = Node.new("fact", "only backend tagged node",
                     "body text", Source(agent="t"))
        a.tags = ["backend"]
        b = Node.new("fact", "only rust tagged node",
                     "body text", Source(agent="t"))
        b.tags = ["rust"]
        c = Node.new("fact", "untagged node here",
                     "body text", Source(agent="t"))
        for n in (a, b, c):
            s.put_node(n)
        f = parse_and_compile("tags:backend OR tags:rust")
        got = {n.id for n in s.list_nodes(f)}
        assert got == {a.id, b.id}
        # AND list form stays ALL-of
        f2 = parse_and_compile("tags:backend,rust")
        assert s.list_nodes(f2) == []

    def test_init_example_config_parses(self, tmp_path):
        """`cortex init` writes this config; it must always load."""
        from cortex_tpu.cli.main import EXAMPLE_CONFIG
        from cortex_tpu.config import CortexConfig
        p = tmp_path / "init.toml"
        p.write_text(EXAMPLE_CONFIG)
        cfg = CortexConfig.load(str(p))
        cfg.validate()
        assert cfg.embedding.model == "hash"

    def test_docs_config_example_parses(self, tmp_path):
        """The getting-started config example must load with every key
        actually recognized (guards against doc/parser drift)."""
        import os
        import re
        from cortex_tpu.config import CortexConfig
        doc = os.path.join(os.path.dirname(__file__), "..", "docs",
                           "getting-started", "configuration.md")
        text = open(doc).read()
        block = re.search(r"```toml\n(.*?)```", text, re.S).group(1)
        p = tmp_path / "doc.toml"
        p.write_text(block)
        cfg = CortexConfig.load(str(p))
        cfg.validate()
        assert cfg.auto_linker.similarity.auto_link_threshold == 0.75
        assert cfg.auto_linker.candidate_k == 100
        assert cfg.retention.by_kind["event"].ttl_days == 90.0
        assert cfg.schemas.get("decision").required_fields == ["outcome"]
        assert cfg.auto_linker.rules[0].name == "decision-informs-pattern"
        assert cfg.plugins[0].type == "linker_rule"

    def test_root_example_config_parses(self):
        """cortex.example.toml (the shipped starter config) must load
        with every key recognized and validate cleanly — parse-pinned
        like the docs examples so it can never drift from the parser."""
        import os
        from cortex_tpu.config import CortexConfig
        p = os.path.join(os.path.dirname(__file__), "..",
                         "cortex.example.toml")
        cfg = CortexConfig.load(p)
        cfg.validate()
        # spot-check one key per block so a silently-ignored table fails
        assert cfg.server.warmup is True
        assert cfg.schema.kinds == ["meeting-note"]
        assert cfg.embedding.search_path == "auto"
        assert cfg.auto_linker.candidate_k == 100
        assert cfg.auto_linker.similarity.auto_link_threshold == 0.75
        assert cfg.auto_linker.decay.importance_shield == 0.8
        assert cfg.auto_linker.rules[0].condition.type == "min_similarity"
        assert cfg.auto_linker.rules[0].condition.threshold == 0.7
        assert cfg.briefing.recent_window_secs == 48 * 3600
        assert cfg.ingest.file.watch_dir == "./ingest"
        assert cfg.observability.sse_buffer == 1024
        assert cfg.retention.by_kind["event"].ttl_days == 90.0
        assert cfg.retention.by_kind["event"].min_score == 0.2
        assert cfg.security.encryption_at_rest is False
        assert cfg.prompt_rollback.cooldown_base_hours == 1
        assert cfg.score_decay.by_kind["event"] == 0.05
        assert cfg.write_gate.overrides["observation"].min_body_length == 10
        assert cfg.schemas["decision"].required_fields == ["rationale"]
        assert cfg.schemas["decision"].fields["priority"].max == 5.0

    def test_fuzz_garbage_never_crashes(self):
        """Any input must either compile or raise the DSL's own errors —
        never an unrelated exception (parser robustness)."""
        import random
        import string
        from cortex_tpu.errors import QueryParseError
        rng = random.Random(99)
        atoms = ["kind:fact", "tags:a", "agent:kai", "importance>0.5",
                 "created_after:7d", "deleted:true", "limit:5", "AND",
                 "OR", "NOT", "(", ")", ":::", ">>", "kind:", "importance>",
                 "", "🦑", '"unterminated', "AND AND", ")(", "limit:x"]
        for _ in range(300):
            n = rng.randint(1, 6)
            q = " ".join(rng.choice(atoms) for _ in range(n))
            try:
                parse_and_compile(q)
            except (QueryParseError, CompileError):
                pass   # the DSL's own failure modes are fine
        # pure random bytes too
        for _ in range(100):
            q = "".join(rng.choice(string.printable) for _ in
                        range(rng.randint(1, 40)))
            try:
                parse_and_compile(q)
            except (QueryParseError, CompileError):
                pass

    def test_created_after_relative(self):
        f = parse_and_compile("created_after:7d")
        assert f.created_after == pytest.approx(time.time() - 7 * 86400, abs=5)
        f = parse_and_compile("created_after:24h")
        assert f.created_after == pytest.approx(time.time() - 86400, abs=5)
        f = parse_and_compile("created_after:30m")
        assert f.created_after == pytest.approx(time.time() - 1800, abs=5)

    def test_created_before_iso(self):
        f = parse_and_compile("created_before:2026-01-01T00:00:00Z")
        assert f.created_before == pytest.approx(1767225600.0)

    def test_and_combination(self):
        f = parse_and_compile("kind:decision AND importance>0.7 AND agent:kai")
        assert f.kinds == ["decision"]
        assert f.min_importance == pytest.approx(0.7)
        assert f.source_agent == "kai"

    def test_or_same_field(self):
        f = parse_and_compile("kind:decision OR kind:pattern")
        assert f.kinds == ["decision", "pattern"]

    def test_or_parenthesized_with_and(self):
        f = parse_and_compile(
            "(kind:decision OR kind:pattern) AND tags:architecture")
        assert sorted(f.kinds) == ["decision", "pattern"]
        assert f.tags == ["architecture"]

    def test_or_mixed_fields_uncompilable(self):
        with pytest.raises(CompileError):
            parse_and_compile("kind:decision OR agent:kai")

    def test_nested_or_kinds_flattened(self):
        f = parse_and_compile("(kind:a OR kind:b) OR kind:c")
        assert f.kinds == ["a", "b", "c"]

    def test_not_deleted(self):
        f = parse_and_compile("NOT deleted:true")
        assert not f.deleted_only and not f.include_deleted

    def test_deleted_true(self):
        f = parse_and_compile("deleted:true")
        assert f.deleted_only and f.include_deleted

    def test_not_other_field_uncompilable(self):
        with pytest.raises(CompileError):
            parse_and_compile("NOT kind:event")

    def test_limit(self):
        assert parse_and_compile("limit:25").limit == 25

    def test_unknown_field(self):
        with pytest.raises(ParseError):
            parse("banana:split")

    def test_empty_query(self):
        with pytest.raises(ParseError):
            parse("")

    def test_missing_colon(self):
        with pytest.raises(ParseError):
            parse("kind decision")

    def test_unbalanced_paren(self):
        with pytest.raises(ParseError):
            parse("(kind:a OR kind:b")

    def test_bad_duration(self):
        with pytest.raises(ParseError):
            parse("created_after:banana")

    def test_invalid_kind_at_compile(self):
        with pytest.raises(CompileError):
            parse_and_compile("kind:BadKind")

    def test_keywords_are_uppercase_only(self):
        # lowercase and/or are plain words -> parse error, matching the
        # reference tokenizer
        with pytest.raises(ParseError):
            parse("kind:a and kind:b")


class TestRetention:
    def mk(self, s, kind="observation", age_days=100, idle_days=100,
           importance=0.1):
        now = time.time()
        n = mknode(kind=kind, importance=importance)
        n.created_at = now - age_days * 86400
        n.last_accessed_at = now - idle_days * 86400
        s.put_node(n)
        return n

    def test_ttl_sweep(self):
        s = MemoryStorage()
        old = self.mk(s, age_days=100, idle_days=100)
        fresh = self.mk(s, age_days=1, idle_days=1)
        eng = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)}))
        assert eng.sweep(s) == 1
        assert s.get_node(old.id).deleted
        assert not s.get_node(fresh.id).deleted

    def test_grace_protects_recently_accessed(self):
        s = MemoryStorage()
        n = self.mk(s, age_days=100, idle_days=5)
        eng = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)}))
        assert eng.sweep(s) == 0

    def test_inbound_edge_protection(self):
        s = MemoryStorage()
        target = self.mk(s, age_days=100, idle_days=100)
        ref = self.mk(s, kind="fact", age_days=1, idle_days=1)
        s.put_edge(Edge.new(ref.id, target.id, "informed_by", 0.9,
                            EdgeProvenance.manual("t")))
        eng = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)}))
        assert eng.sweep(s) == 0
        # disable protection -> deleted
        eng2 = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)},
            protect_with_inbound_edges=False))
        assert eng2.sweep(s) == 1

    def test_min_score_gate(self):
        s = MemoryStorage()
        # heavily accessed node: echo boost keeps decayed score high
        hot = self.mk(s, age_days=100, idle_days=31)
        hot.access_count = 100
        s.put_node(hot)
        cold = self.mk(s, age_days=100, idle_days=400)
        eng = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30,
                                                  min_score=0.5)}))
        deleted = eng.sweep(s)
        assert deleted == 1
        assert s.get_node(cold.id).deleted
        assert not s.get_node(hot.id).deleted

    def test_default_ttl_skips_configured_kinds(self):
        s = MemoryStorage()
        obs = self.mk(s, kind="observation", age_days=100, idle_days=100)
        fact = self.mk(s, kind="fact", age_days=100, idle_days=100)
        eng = RetentionEngine(RetentionConfig(
            default_ttl_days=30,
            by_kind={"observation": KindRetention(ttl_days=0)}))  # pinned
        assert eng.sweep(s) == 1
        assert not s.get_node(obs.id).deleted
        assert s.get_node(fact.id).deleted

    def test_max_nodes_eviction(self):
        s = MemoryStorage()
        for i in range(5):
            self.mk(s, age_days=i + 1, idle_days=1,
                    importance=0.1 * (i + 1))
        eng = RetentionEngine(RetentionConfig(
            max_nodes=RetentionMaxNodes(limit=3)))
        assert eng.sweep(s) == 2
        survivors = [n.importance for n in s.list_nodes()]
        assert min(survivors) == pytest.approx(0.3)

    def test_purge_expired(self):
        s = MemoryStorage()
        n = self.mk(s, age_days=200, idle_days=200)
        s.delete_node(n.id)
        got = s.get_node(n.id)
        got.updated_at = time.time() - 40 * 86400
        s.put_node(got)     # keep tombstone, backdate
        eng = RetentionEngine(RetentionConfig(grace_days=30))
        assert eng.purge_expired(s) == 1
        assert s.get_node(n.id) is None

    def test_outbound_edges_cleaned(self):
        s = MemoryStorage()
        old = self.mk(s, age_days=100, idle_days=100)
        other = self.mk(s, kind="fact", age_days=1, idle_days=1)
        s.put_edge(Edge.new(old.id, other.id, "related_to", 0.5,
                            EdgeProvenance.manual("t")))
        eng = RetentionEngine(RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)}))
        eng.sweep(s)
        assert s.edges_from(old.id) == []


class TestAuditAndHooks:
    def test_audit_log_roundtrip(self):
        s = MemoryStorage()
        log = AuditLog(s)
        log.record("node_created", "n1", actor="cli")
        got = log.query(target_id="n1")
        assert got and got[0].actor == "cli"

    def test_hooks_isolation(self):
        reg = HookRegistry()
        calls = []

        class Bad(MutationHook):
            def on_node_mutation(self, action, node):
                raise RuntimeError("boom")

        reg.add(Bad())
        reg.add_fn(on_node=lambda a, n: calls.append((a, n.id)))
        n = mknode()
        reg.notify_node("created", n)     # must not raise
        assert calls == [("created", n.id)]

    def test_edge_hooks(self):
        reg = HookRegistry()
        seen = []
        reg.add_fn(on_edge=lambda a, e: seen.append(a))
        e = Edge.new("a", "b", "uses", 0.5, EdgeProvenance.manual("t"))
        reg.notify_edge("created", e)
        assert seen == ["created"]

    def test_relative_data_dir_resolves_against_config_file(self, tmp_path):
        """A relative data_dir in a config FILE means relative to that
        file, not the process cwd — `cortex --config some/dir/cortex.toml
        serve` must open the store next to the config, not create a
        fresh one in the cwd."""
        from cortex_tpu.config import CortexConfig
        sub = tmp_path / "deploy"
        sub.mkdir()
        p = sub / "cortex.toml"
        p.write_text('[server]\ndata_dir = "."\n')
        cfg = CortexConfig.load(str(p))
        import os
        assert os.path.isabs(cfg.server.data_dir)
        assert cfg.server.data_dir == str(sub)
        p2 = sub / "cortex2.toml"
        p2.write_text('[server]\ndata_dir = "./data"\n')
        cfg2 = CortexConfig.load(str(p2))
        assert cfg2.server.data_dir == str(sub / "data")
        # absolute dirs pass through untouched
        p3 = sub / "cortex3.toml"
        p3.write_text(f'[server]\ndata_dir = "{tmp_path}"\n')
        assert CortexConfig.load(str(p3)).server.data_dir == str(tmp_path)


class TestRetentionIndexConsistency:
    def test_swept_nodes_leave_the_live_index(self):
        """Regression (review finding): the retention sweep deleted
        from storage only — swept nodes kept answering searches and
        blocking the gate's conflict check until restart, and a
        snapshot checkpoint would have persisted the divergence."""
        import time as _t
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.types import Node, Source
        cfg = CortexConfig()
        from cortex_tpu.policies.retention import (KindRetention,
                                                   RetentionConfig)
        cfg.retention = RetentionConfig(
            by_kind={"observation": KindRetention(ttl_days=30)})
        cx = Cortex.in_memory(cfg)
        old = Node.new("observation", "Stale observation entry",
                       "Body long enough for the checks here.",
                       Source(agent="t"), 0.1)
        old.created_at = _t.time() - 100 * 86400
        old.last_accessed_at = _t.time() - 100 * 86400
        cx.store(old)
        keep = Node.new("fact", "A kept fact entry",
                        "Body long enough for the checks too.",
                        Source(agent="t"))
        cx.store(keep)
        assert old.id in cx.index
        swept, _ = cx.run_retention()
        assert swept == 1
        assert old.id not in cx.index          # index in step with store
        hits = cx.search("stale observation entry", limit=10,
                         record_access=False)
        assert old.id not in {n.id for _, n in hits}
