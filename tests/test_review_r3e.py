"""Regressions for the persistence-focused max review: half-failed
store+index pairs must not be certified by snapshots, partial snapshot
loads must rebuild from empty, SQL filter edge cases, the edge-upsert
re-route, and the memory-store copy boundary."""

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.storage import MemoryStorage, NodeFilter, SqliteStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def _node(i, tags=None):
    n = Node.new("fact", f"Persistence fact {i}",
                 f"Body long enough for the checks, entry {i}.",
                 Source(agent="t"))
    n.tags = tags or []
    return n


class TestIndexPairFailurePoisonsSnapshots:
    def test_failed_index_insert_disables_certification(self, tmp_path,
                                                        monkeypatch):
        """storage commit + index.insert raise: the bumped seq must
        never be certified — a checkpoint would make the node
        unsearchable across every future boot."""
        db = str(tmp_path / "c.db")
        cx = Cortex.open(db)
        cx.store(_node(0))
        cx.save_index_snapshot()            # healthy base

        def boom(*a, **k):
            raise RuntimeError("device transport failed (test)")
        monkeypatch.setattr(type(cx.index), "insert", boom)
        with pytest.raises(RuntimeError):
            cx.store(_node(1))
        monkeypatch.undo()
        assert cx._index_diverged
        cx.store(_node(2))                  # index healthy again, BUT
        cx.save_index_snapshot()            # ...must refuse to certify
        cx.close()

        cx2 = Cortex.open(db)               # stale marker -> rebuild
        # the half-failed node's embedding is in storage: the rebuild
        # recovers it
        assert len(cx2.index) == 3
        assert not cx2._index_diverged
        cx2.close()

    def test_partial_snapshot_load_rebuilds_from_empty(self, tmp_path,
                                                       monkeypatch):
        """Base loads, delta apply raises: the rebuild must not keep
        the stale base rows (a since-deleted node would be certified
        back to life by the next full-base checkpoint)."""
        db = str(tmp_path / "c.db")
        cx = Cortex.open(db)
        ids = [_node(i) for i in range(3)]
        for n in ids:
            cx.store(n)
        cx.save_index_snapshot()            # base with all 3
        cx.delete_node(ids[0].id, hard=True)
        cx.save_index_snapshot()            # publishes a delta pair
        cx.close()
        import os
        assert os.path.exists(db + ".index.npz.delta.npz")

        from cortex_tpu.vector.index import TpuFlatIndex
        orig_load = TpuFlatIndex.load

        def load_then_fail_delta(self, path):
            orig_load(self, path)           # base loads fine
        monkeypatch.setattr(TpuFlatIndex, "apply_delta",
                            lambda self, p: (_ for _ in ()).throw(
                                ValueError("corrupt delta (test)")))
        cx2 = Cortex.open(db)
        monkeypatch.undo()
        # full rebuild from storage: the hard-deleted node is GONE
        assert ids[0].id not in cx2.index
        assert len(cx2.index) == 2
        cx2.close()


class TestSqlFilterEdgeCases:
    def test_duplicate_tags_all_of(self, tmp_path):
        s = SqliteStorage(str(tmp_path / "t.db"))
        n = _node(0, tags=["a", "b"])
        s.put_node(n)
        got = s.list_nodes(NodeFilter(tags=["a", "a"]))
        assert [x.id for x in got] == [n.id]
        mem = MemoryStorage()
        mem.put_node(n)
        got_m = mem.list_nodes(NodeFilter(tags=["a", "a"]))
        assert [x.id for x in got_m] == [n.id]
        s.close()

    def test_empty_tags_any_matches_nothing(self, tmp_path):
        s = SqliteStorage(str(tmp_path / "t.db"))
        s.put_node(_node(0, tags=["a"]))
        assert s.list_nodes(NodeFilter(tags_any=[])) == []
        mem = MemoryStorage()
        mem.put_node(_node(1, tags=["a"]))
        assert mem.list_nodes(NodeFilter(tags_any=[])) == []
        s.close()


class TestEdgeUpsertReRoute:
    def test_same_id_reput_applies_endpoint_change(self, tmp_path):
        for store in (SqliteStorage(str(tmp_path / "e.db")),
                      MemoryStorage()):
            a, b, c = _node(0), _node(1), _node(2)
            for n in (a, b, c):
                store.put_node(n)
            e = Edge.new(a.id, b.id, "related_to", 0.5,
                         EdgeProvenance.manual("t"))
            store.put_edge(e)
            e.to_id = c.id                  # re-route
            store.put_edge(e)
            got = store.get_edge(e.id)
            assert got.to_id == c.id, type(store).__name__


class TestMemoryCopyBoundary:
    def test_caller_mutations_do_not_reach_stored_state(self):
        mem = MemoryStorage()
        n = _node(0)
        mem.put_node(n)
        n.title = "mutated after put"
        assert mem.get_node(n.id).title != "mutated after put"
        fetched = mem.get_node(n.id)
        fetched.deleted = True              # mutate a returned copy
        assert mem.get_node(n.id).deleted is False


class TestSqliteSynchronousKnob:
    def test_full_mode_parses_and_opens(self, tmp_path):
        from cortex_tpu.config import CortexConfig
        cfg = CortexConfig.from_dict(
            {"server": {"sqlite_synchronous": "full"}})
        assert cfg.server.sqlite_synchronous == "full"
        s = SqliteStorage(str(tmp_path / "f.db"), synchronous="full")
        assert s._db.execute("PRAGMA synchronous").fetchone()[0] == 2
        s.close()


class TestConfigDocDrift:
    def test_every_server_and_embedding_key_is_documented(self):
        """docs/reference/config.md claims an exhaustive key table; a
        dataclass field missing from it is a documented-knob gap (the
        r3 docs review found five such keys)."""
        import dataclasses
        from cortex_tpu.config import EmbeddingConfig, ServerConfig
        doc = open("docs/reference/config.md").read()
        missing = [
            f"[{blk}] {f.name}"
            for blk, cls in (("server", ServerConfig),
                             ("embedding", EmbeddingConfig))
            for f in dataclasses.fields(cls)
            if f"`{f.name}`" not in doc]
        assert not missing, missing
