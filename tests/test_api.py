"""Embedded Cortex API end-to-end tests — the library-mode E2E milestone
(SURVEY §7 step 2: open -> store -> search returns ranked nodes)."""

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.config import CortexConfig
from cortex_tpu.errors import DuplicateEdge, GateRejection
from cortex_tpu.storage import NodeFilter
from cortex_tpu.types import Edge, EdgeProvenance
from cortex_tpu.graph import PathRequest, TraversalRequest


@pytest.fixture
def cx():
    c = Cortex.in_memory()
    yield c
    c.close()


class TestHookIsolation:
    def test_raising_hook_never_blocks_writes(self):
        """Hook faults are isolated (reference catch_unwind,
        hooks/mod.rs:46-57) and later hooks still run."""
        from cortex_tpu.api import Cortex
        from cortex_tpu.hooks import MutationHook
        cx = Cortex.in_memory()
        seen = []

        class Bad(MutationHook):
            def on_node_mutation(self, action, node):
                raise RuntimeError("hook explodes")

        class Good(MutationHook):
            def on_node_mutation(self, action, node):
                seen.append((action, node.id))

        cx.add_hook(Bad())
        cx.add_hook(Good())
        nid = cx.store(Cortex.fact("Hook isolation test fact"))
        assert cx.get_node(nid) is not None     # write landed
        assert seen == [("created", nid)]       # later hook still ran

    def test_hook_doing_gated_store_does_not_deadlock(self):
        """A hook that performs its own GATED store must not deadlock
        on the admission lock (hooks fire after release)."""
        from cortex_tpu.api import Cortex
        from cortex_tpu.hooks import MutationHook
        cx = Cortex.in_memory()

        class Derives(MutationHook):
            def on_node_mutation(self, action, node):
                if node.kind == "decision" and action == "created":
                    cx.store(Cortex.event(
                        f"derived from {node.title[:30]}",
                        "Automatically derived follow-up event entry."),
                        gate=True)

        cx.add_hook(Derives())
        cx.store(Cortex.decision("Adopt the derived-event hook",
                                 "We decided to derive follow-ups."),
                 gate=True)
        kinds = sorted(n.kind for n in cx.list_nodes())
        assert kinds == ["decision", "event"]


class TestEndToEnd:
    def test_store_search_roundtrip(self, cx):
        cx.store(Cortex.fact("The database is postgres fourteen", 0.8))
        cx.store(Cortex.fact("The cache layer uses redis seven", 0.6))
        cx.store(Cortex.event("Deployed new version to production",
                              "The deploy completed fine", 0.5))
        hits = cx.search("postgres database", limit=2)
        assert hits
        assert "postgres" in hits[0][1].title

    def test_open_persists_and_rebuilds_index(self, tmp_path):
        path = str(tmp_path / "cx.db")
        c1 = Cortex.open(path)
        c1.store(Cortex.fact("Persistent fact about databases", 0.7))
        c1.close()
        c2 = Cortex.open(path)
        hits = c2.search("databases", limit=1)
        assert hits and "databases" in hits[0][1].title
        c2.close()

    def test_edges_and_traverse(self, cx):
        a = Cortex.decision("Use postgres for storage",
                            "We decided to use postgres", 0.8)
        b = Cortex.event("Migrated to postgres", "Migration done", 0.5)
        cx.store(a)
        cx.store(b)
        cx.create_edge(Edge.new(a.id, b.id, "led_to", 0.9,
                                EdgeProvenance.manual("me")))
        sub = cx.neighborhood(a.id, depth=1)
        assert b.id in sub.nodes
        paths = cx.find_paths(PathRequest(from_id=a.id, to_id=b.id))
        assert paths.paths and paths.paths[0].length == 1

    def test_duplicate_edge_raises(self, cx):
        a, b = Cortex.fact("Fact one here", 0.5), Cortex.fact("Fact two here", 0.5)
        cx.store(a)
        cx.store(b)
        cx.create_edge(Edge.new(a.id, b.id, "related_to", 0.5,
                                EdgeProvenance.manual("m")))
        with pytest.raises(DuplicateEdge):
            cx.create_edge(Edge.new(a.id, b.id, "related_to", 0.5,
                                    EdgeProvenance.manual("m")))

    def test_delete_removes_from_search(self, cx):
        n = Cortex.fact("Removable fact about quokkas", 0.5)
        cx.store(n)
        assert cx.delete_node(n.id)
        hits = cx.search("quokkas", limit=5)
        assert all(h[1].id != n.id for h in hits)

    def test_gate_enforced_when_requested(self, cx):
        bad = Cortex.fact("short", 0.5)
        bad.body = "tiny"
        with pytest.raises(GateRejection):
            cx.store(bad, gate=True)

    def test_query_dsl(self, cx):
        cx.store(Cortex.fact("Important fact stored here", 0.9))
        cx.store(Cortex.event("Minor event stored here", "body text", 0.2))
        got = cx.query("kind:fact AND importance>0.5")
        assert len(got) == 1 and got[0].kind == "fact"

    def test_search_records_access(self, cx):
        n = Cortex.fact("Access counted fact here", 0.5)
        cx.store(n)
        cx.search("access counted", limit=1)
        assert cx.get_node(n.id).access_count == 1

    def test_hybrid_search_via_api(self, cx):
        anchor = Cortex.fact("Anchor fact about deployments", 0.8)
        near = Cortex.fact("Deployment details noted down", 0.5)
        cx.store(anchor)
        cx.store(near)
        cx.create_edge(Edge.new(anchor.id, near.id, "related_to", 0.9,
                                EdgeProvenance.manual("m")))
        res = cx.search_hybrid("deployment details", anchors=[anchor.id])
        assert res and res[0].combined_score > 0

    def test_briefing_via_api(self, cx):
        cx.store(Cortex.agent("Kai the assistant", "An agent node for kai"))
        cx.store(Cortex.goal("Ship the release", "Finish v2", 0.8))
        text = cx.briefing("library")
        assert "Briefing" in text

    def test_linker_cycle_via_api(self, cx):
        cx.store(Cortex.fact("Kubernetes upgrade procedure notes", 0.6))
        cx.store(Cortex.fact("Kubernetes upgrade procedure steps", 0.6))
        m = cx.run_linker_cycle()
        assert m.cycle_nodes_processed == 2

    def test_stats(self, cx):
        cx.store(Cortex.fact("A fact for the stats", 0.5))
        s = cx.stats()
        assert s.node_count == 1

    def test_reindex(self, cx):
        cx.store(Cortex.fact("Reindexable fact about llamas", 0.5))
        count = cx.reindex()
        assert count == 1
        hits = cx.search("llamas", limit=1)
        assert hits

    def test_update_node_reembeds(self, cx):
        n = Cortex.fact("Original topic about trains", 0.5)
        cx.store(n)
        n.title = "Changed topic about boats"
        n.body = "Now all about boats instead"
        cx.update_node(n)
        hits = cx.search("boats", limit=1)
        assert hits[0][1].id == n.id

    def test_retention_via_api(self, cx):
        import time
        from cortex_tpu.policies import KindRetention
        cx.config.retention.by_kind["observation"] = KindRetention(ttl_days=1)
        n = Cortex.observation("Old observation gone soon", "body here", 0.1)
        n.created_at = time.time() - 10 * 86400
        n.last_accessed_at = time.time() - 40 * 86400
        cx.store(n)
        swept, purged = cx.run_retention()
        assert swept == 1


class TestSnapshotBoot:
    """Index snapshot sidecar: clean close writes cortex.db.index.npz +
    a mutation-sequence marker; the next open loads it instead of
    decoding every stored embedding, and any store mutation since the
    snapshot invalidates it (trigger-maintained index_seq)."""

    def _open(self, tmp_path):
        from cortex_tpu.api import Cortex
        return Cortex.open(str(tmp_path / "cortex.db"))

    def _store(self, cx, i):
        from cortex_tpu.types import Node, Source
        n = Node.new("fact", f"Snapshot boot fact {i}",
                     f"Body long enough for the checks, entry {i}.",
                     Source(agent="t"))
        cx.store(n)
        return n.id

    def test_snapshot_round_trip_skips_rebuild(self, tmp_path, monkeypatch):
        import os
        cx = self._open(tmp_path)
        ids = [self._store(cx, i) for i in range(5)]
        cx.close()
        assert os.path.exists(str(tmp_path / "cortex.db.index.npz"))

        from cortex_tpu.vector.index import TpuFlatIndex
        calls = []
        orig = TpuFlatIndex.insert_batch
        monkeypatch.setattr(TpuFlatIndex, "insert_batch",
                            lambda self, *a, **k: (calls.append(1),
                                                   orig(self, *a, **k))[1])
        cx2 = self._open(tmp_path)
        assert calls == []                 # snapshot path, no rebuild
        assert len(cx2.index) == 5
        hits = cx2.search("snapshot boot fact", limit=5,
                          record_access=False)
        assert {n.id for _, n in hits} == set(ids)
        cx2.close()

    def test_mutation_after_snapshot_invalidates(self, tmp_path):
        cx = self._open(tmp_path)
        self._store(cx, 0)
        dim = cx.embedder.dimension
        cx.close()
        # mutate the STORE behind the snapshot's back (raw storage —
        # e.g. another process, a restore, a repair)
        import numpy as np
        from cortex_tpu.storage import SqliteStorage
        from cortex_tpu.types import Node, Source
        s = SqliteStorage(str(tmp_path / "cortex.db"))
        n = Node.new("fact", "Added behind the snapshot",
                     "Body long enough for the checks here.",
                     Source(agent="t"))
        n.embedding = list(np.full(dim, 0.1, np.float32))
        s.put_node(n)
        s.close()
        cx2 = self._open(tmp_path)
        # the raw put bumped index_seq -> the stale snapshot (1 node)
        # was NOT trusted and the rebuild indexed both nodes
        assert len(cx2.index) == 2
        assert n.id in cx2.index
        cx2.close()

    def test_delete_invalidates_snapshot(self, tmp_path):
        cx = self._open(tmp_path)
        ids = [self._store(cx, i) for i in range(3)]
        cx.close()
        from cortex_tpu.storage import SqliteStorage
        s = SqliteStorage(str(tmp_path / "cortex.db"))
        s.hard_delete_node(ids[0])
        s.close()
        cx2 = self._open(tmp_path)
        assert len(cx2.index) == 2          # rebuilt, not the stale 3
        assert ids[0] not in cx2.index
        cx2.close()

    def test_access_recording_does_not_invalidate(self, tmp_path):
        """record_access touches access fields only — the trigger must
        not fire, so the snapshot stays valid across read traffic."""
        cx = self._open(tmp_path)
        nid = self._store(cx, 0)
        seq0 = cx.storage.index_seq()
        assert cx.storage.record_access(nid)
        assert cx.storage.index_seq() == seq0
        cx.close()


class TestIncrementalCheckpoint:
    """Once a base snapshot exists, live checkpoints and close() write
    only the rows touched since (cumulative delta sidecar) instead of
    rewriting the whole corpus npz — at 1M x 768 the full rewrite is a
    3 GB / ~40 s disk write per checkpoint (measured as p95 == write
    duration in the mixed-workload bench). Boot replays base + delta;
    any mismatch in the (base_seq, index_seq) pairing means rebuild."""

    def _open(self, tmp_path):
        from cortex_tpu.api import Cortex
        return Cortex.open(str(tmp_path / "cortex.db"))

    def _store(self, cx, i):
        from cortex_tpu.types import Node, Source
        n = Node.new("fact", f"Incremental ckpt fact {i}",
                     f"Body long enough for the gate checks, entry {i}.",
                     Source(agent="t"))
        cx.store(n)
        return n.id

    def test_second_close_writes_delta_not_base(self, tmp_path):
        import os
        base = str(tmp_path / "cortex.db.index.npz")
        delta = base + ".delta.npz"
        cx = self._open(tmp_path)
        ids = [self._store(cx, i) for i in range(4)]
        cx.close()                              # first close: full base
        assert os.path.exists(base) and not os.path.exists(delta)
        base_mtime = os.path.getmtime(base)

        cx = self._open(tmp_path)
        more = [self._store(cx, 10 + i) for i in range(3)]
        removed = ids[0]
        assert cx.delete_node(removed, hard=True)
        cx.close()                              # second close: delta only
        assert os.path.exists(delta)
        assert os.path.getmtime(base) == base_mtime, \
            "base npz was rewritten for a small delta"

        # boot = base + delta, no rebuild (insert_batch on the INDEX
        # wrapper is the rebuild path; delta replay goes to the corpus)
        from cortex_tpu.vector.index import TpuFlatIndex
        import unittest.mock as mock
        with mock.patch.object(
                TpuFlatIndex, "insert_batch",
                side_effect=AssertionError("rebuild path taken")):
            cx2 = self._open(tmp_path)
        assert len(cx2.index) == 6
        assert removed not in cx2.index
        for nid in ids[1:] + more:
            assert nid in cx2.index
        hits = cx2.search("incremental ckpt fact", limit=6,
                          record_access=False)
        assert {n.id for _, n in hits} == set(ids[1:] + more)
        cx2.close()

    def test_delta_chain_links_across_checkpoints(self, tmp_path):
        """Each checkpoint appends a LINK holding only the rows touched
        since the previous one (bounded write cost under sustained
        writes — a cumulative delta rewritten per checkpoint is O(T^2)
        total bytes); boot replays base + every link in order."""
        import os
        base = str(tmp_path / "cortex.db.index.npz")
        cx = self._open(tmp_path)
        a = self._store(cx, 0)
        cx.save_index_snapshot()                # full base
        b = self._store(cx, 1)
        cx.save_index_snapshot()                # link 0: {b}
        c = self._store(cx, 2)
        cx.close()                              # link 1: {c}
        assert os.path.exists(base + ".delta.npz")
        assert os.path.exists(base + ".delta.1.npz")
        # link 1 holds ONLY c, not a re-copy of b
        from cortex_tpu.vector.index import TpuFlatIndex
        m1 = TpuFlatIndex.read_delta_meta(base + ".delta.1.npz")
        assert m1["ids"] == [c]
        cx2 = self._open(tmp_path)
        assert {a, b, c} <= {i for i in (a, b, c) if i in cx2.index}
        assert len(cx2.index) == 3
        # a post-boot checkpoint EXTENDS the chain (link 2), with a
        # working set that starts empty — not a re-copy of the chain
        d = self._store(cx2, 3)
        cx2.close()
        m2 = TpuFlatIndex.read_delta_meta(base + ".delta.2.npz")
        assert m2["ids"] == [d]
        cx3 = self._open(tmp_path)
        assert len(cx3.index) == 4 and d in cx3.index
        cx3.close()

    def test_chain_ceiling_triggers_base_rewrite(self, tmp_path,
                                                 monkeypatch):
        """When the chain's TOTAL rows outgrow the corpus fraction the
        base is rewritten and every link removed."""
        import os
        from cortex_tpu import api as api_mod
        base = str(tmp_path / "cortex.db.index.npz")
        cx = self._open(tmp_path)
        self._store(cx, 0)
        cx.save_index_snapshot()                # base {0}
        self._store(cx, 1)
        cx.save_index_snapshot()                # link 0
        monkeypatch.setattr(api_mod, "_DELTA_FULL_REWRITE_FLOOR", 1)
        base_mtime = os.path.getmtime(base)
        self._store(cx, 2)
        cx.save_index_snapshot()                # chain 1+1 > max(1, 3//4)
        assert os.path.getmtime(base) > base_mtime
        assert not os.path.exists(base + ".delta.npz")
        assert not os.path.exists(base + ".delta.1.npz")
        cx.close()
        cx2 = self._open(tmp_path)
        assert len(cx2.index) == 3
        cx2.close()

    def test_stale_higher_links_never_pair_after_restore(self, tmp_path):
        """A storage RESTORE to an older seq re-issues the discarded
        seq range, so a stale higher link left on disk can carry
        EXACTLY the (prev_seq, index_seq) pair the fresh timeline will
        produce — it must never pair with the fresh chain tail (it
        holds the other timeline's rows)."""
        import shutil
        db = str(tmp_path / "cortex.db")
        cx = self._open(tmp_path)
        a = self._store(cx, 0)
        cx.save_index_snapshot()                # base {a}
        b = self._store(cx, 1)
        cx.save_index_snapshot()                # link 0 {b}
        cx.storage.snapshot(db + ".bak")        # consistent backup HERE
        c = self._store(cx, 2)
        cx.save_index_snapshot()                # link 1 {c}
        cx.storage.close()
        shutil.copy(db + ".bak", db)            # RESTORE (link 1 stale)
        cx2 = self._open(tmp_path)
        # boot stops the chain walk at the storage seq: base + link 0
        # load, the stale link 1 is ignored (no rebuild)
        assert len(cx2.index) == 2 and a in cx2.index and b in cx2.index
        assert c not in cx2.index
        # the fresh timeline re-issues the same seq the stale link 1
        # claims; the new link must overwrite it
        x = self._store(cx2, 7)
        cx2.close()                             # fresh link 1 {x}
        cx3 = self._open(tmp_path)
        assert {a, b, x} == set(
            i for i in (a, b, c, x) if i in cx3.index), \
            "stale other-timeline link paired with the fresh chain"
        assert len(cx3.index) == 3
        cx3.close()

    def test_raw_mutation_invalidates_base_delta_pair(self, tmp_path):
        import numpy as np
        cx = self._open(tmp_path)
        self._store(cx, 0)
        cx.close()                              # base
        cx = self._open(tmp_path)
        self._store(cx, 1)
        dim = cx.embedder.dimension
        cx.close()                              # delta
        from cortex_tpu.storage import SqliteStorage
        from cortex_tpu.types import Node, Source
        s = SqliteStorage(str(tmp_path / "cortex.db"))
        n = Node.new("fact", "Behind the checkpoint's back",
                     "Body long enough for the gate checks here.",
                     Source(agent="t"))
        n.embedding = list(np.full(dim, 0.1, np.float32))
        s.put_node(n)
        s.close()
        cx2 = self._open(tmp_path)              # seq mismatch -> rebuild
        assert len(cx2.index) == 3
        assert n.id in cx2.index
        cx2.close()

    def test_rebuild_straddling_base_save_does_not_rearm_chain(
            self, tmp_path, monkeypatch):
        """The base-save write phase runs OUTSIDE the persist lock; a
        reindex/rebuild landing inside that window leaves an index
        that does not derive from the base just written. The save must
        not re-arm chain state over it — a later link would pair with
        the stale base and resurrect rows deleted in between."""
        import os
        from cortex_tpu.vector.index import TpuFlatIndex
        base = str(tmp_path / "cortex.db.index.npz")
        cx = self._open(tmp_path)
        self._store(cx, 0)
        orig_ws = TpuFlatIndex.write_snapshot
        fired = []

        def ws_then_rebuild(idx_self, p, st):
            orig_ws(idx_self, p, st)
            if fired:
                return
            fired.append(1)
            # a mutation + rebuild land mid-write-phase (a reindex's
            # shape: seq bumps, then the index is rebuilt from storage)
            self._store(cx, 1)
            with cx._persist_lock:
                cx.index = cx._make_index()
                cx._rebuild_index()

        monkeypatch.setattr(TpuFlatIndex, "write_snapshot",
                            ws_then_rebuild)
        cx.save_index_snapshot()              # full base + straddle
        monkeypatch.setattr(TpuFlatIndex, "write_snapshot", orig_ws)
        assert cx._index_base_synced is False
        assert cx._chain_bs is None
        # the next checkpoint must REWRITE the base, not link against
        # the stale one
        base_mtime = os.path.getmtime(base)
        self._store(cx, 2)
        cx.save_index_snapshot()
        assert os.path.getmtime(base) > base_mtime
        assert not os.path.exists(base + ".delta.npz")
        cx.close()
        cx2 = self._open(tmp_path)
        assert len(cx2.index) == 3
        cx2.close()

    def test_corrupt_link_falls_back_to_rebuild(self, tmp_path):
        """A torn/corrupt chain link must never crash boot or lose
        data — the chain walk rejects it and the index rebuilds from
        storage."""
        base = str(tmp_path / "cortex.db.index.npz")
        cx = self._open(tmp_path)
        a = self._store(cx, 0)
        cx.save_index_snapshot()                # base
        b = self._store(cx, 1)
        cx.close()                              # link 0 {b}
        with open(base + ".delta.npz", "r+b") as f:
            f.truncate(16)                      # torn write
        cx2 = self._open(tmp_path)
        assert len(cx2.index) == 2
        assert a in cx2.index and b in cx2.index
        cx2.close()

    def test_large_delta_triggers_full_rewrite(self, tmp_path, monkeypatch):
        """When the working set outgrows the corpus fraction, the base
        is rewritten and the stale delta removed. The 4096-row floor is
        scaled down so the test doesn't need thousands of stores."""
        import os
        from cortex_tpu import api as api_mod
        base = str(tmp_path / "cortex.db.index.npz")
        delta = base + ".delta.npz"
        cx = self._open(tmp_path)
        self._store(cx, 0)
        cx.save_index_snapshot()                # full base
        base_mtime = os.path.getmtime(base)
        for i in range(1, 4):
            self._store(cx, i)
        # shrink the floor: delta_size()=3 must exceed max(1, len//20)=1
        monkeypatch.setattr(api_mod, "_DELTA_FULL_REWRITE_FLOOR", 1)
        cx.save_index_snapshot()
        assert os.path.getmtime(base) > base_mtime, "expected full rewrite"
        assert not os.path.exists(delta)
        cx.close()
        cx2 = self._open(tmp_path)
        assert len(cx2.index) == 4
        cx2.close()


class TestLibraryWarmup:
    """Library-mode cold-start hardening (VERDICT r2 #5): Cortex.open
    gets the same optional warmup + compile-deadline + progress logging
    the server has."""

    def test_warmup_completes_and_reports_progress(self):
        cx = Cortex.in_memory()
        cx.store(Cortex.fact("a warm fact to give the index content"))
        lines = []
        ok = cx.warmup(deadline_s=120.0, progress=lines.append)
        assert ok is True
        assert any("scratch corpus built" in l for l in lines)
        assert any("device warmup done" in l for l in lines)
        # real-index buckets warmed because the index is non-empty
        assert any("serving bucket B=1" in l for l in lines)

    def test_warmup_deadline_fails_loudly_not_forever(self, monkeypatch,
                                                      caplog):
        """A wedged/slow compile must not hang open() silently: the
        deadline expires, a warning lands, and the engine still works
        (cold)."""
        import logging
        import time as _time

        def slow_body(self, progress):
            _time.sleep(30)

        monkeypatch.setattr(Cortex, "_warmup_body", slow_body)
        cx = Cortex.in_memory()
        t0 = _time.monotonic()
        with caplog.at_level(logging.WARNING, logger="cortex.api"):
            ok = cx.warmup(deadline_s=0.3)
        assert ok is False
        assert _time.monotonic() - t0 < 5
        assert any("deadline" in r.message for r in caplog.records)
        # serving continues cold
        cx.store(Cortex.fact("stored after the warmup deadline expired"))
        assert cx.search("warmup deadline", limit=1)

    def test_open_with_warmup_flag(self, tmp_path):
        cx = Cortex.open(str(tmp_path / "c.db"), warmup=True)
        try:
            cx.store(Cortex.fact("fact stored through a warmed engine"))
            assert cx.search("warmed engine", limit=1)
        finally:
            cx.close()

    def test_warmup_failure_degrades_to_cold(self, monkeypatch, caplog):
        import logging

        def broken_body(self, progress):
            raise RuntimeError("simulated compile failure")

        monkeypatch.setattr(Cortex, "_warmup_body", broken_body)
        cx = Cortex.in_memory()
        with caplog.at_level(logging.WARNING, logger="cortex.api"):
            ok = cx.warmup(deadline_s=10.0)
        assert ok is False
        assert any("continuing cold" in r.message for r in caplog.records)
