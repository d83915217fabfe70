"""Storage-layer tests against both backends (parity: redb_storage.rs tests)."""

import json
import threading

import pytest

from cortex_tpu.errors import DuplicateEdge, InvalidEdge, SchemaVersionError
from cortex_tpu.storage import NodeFilter, SqliteStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def mknode(kind="fact", title="A test node title", agent="tester", **kw):
    n = Node.new(kind, title, "Body of the node", Source(agent=agent))
    for k, v in kw.items():
        setattr(n, k, v)
    return n


def link(a, b, relation="related_to", weight=0.5):
    return Edge.new(a.id, b.id, relation, weight, EdgeProvenance.manual("t"))


class TestNodeCrud:
    def test_put_get(self, storage):
        n = mknode()
        storage.put_node(n)
        got = storage.get_node(n.id)
        assert got is not None and got.title == n.title

    def test_get_missing(self, storage):
        assert storage.get_node("nope") is None

    def test_update(self, storage):
        n = mknode()
        storage.put_node(n)
        n.title = "Updated title"
        storage.put_node(n)
        assert storage.get_node(n.id).title == "Updated title"

    def test_soft_delete(self, storage):
        n = mknode()
        storage.put_node(n)
        assert storage.delete_node(n.id)
        got = storage.get_node(n.id)
        assert got.deleted
        assert not storage.delete_node(n.id)  # already deleted
        assert storage.count_nodes() == 0
        assert storage.count_nodes(NodeFilter(include_deleted=True)) == 1

    def test_hard_delete_cleans_edges(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        storage.put_edge(link(a, b))
        assert storage.hard_delete_node(a.id)
        assert storage.get_node(a.id) is None
        assert storage.edges_to(b.id) == []

    def test_embedding_persistence(self, storage):
        n = mknode()
        n.embedding = [0.5] * 384
        storage.put_node(n)
        got = storage.get_node(n.id)
        assert got.embedding == pytest.approx([0.5] * 384)


class TestFilters:
    def setup_nodes(self, storage):
        for i in range(5):
            storage.put_node(mknode(kind="fact", title=f"Fact number {i}"))
        for i in range(3):
            storage.put_node(mknode(kind="event", title=f"Event number {i}",
                                    agent="other"))
        n = mknode(kind="fact", title="Tagged node title")
        n.tags = ["special", "extra"]
        storage.put_node(n)

    def test_by_kind(self, storage):
        self.setup_nodes(storage)
        assert storage.count_nodes(NodeFilter(kinds=["fact"])) == 6
        assert storage.count_nodes(NodeFilter(kinds=["event"])) == 3
        assert storage.count_nodes(NodeFilter(kinds=["fact", "event"])) == 9

    def test_by_agent(self, storage):
        self.setup_nodes(storage)
        assert storage.count_nodes(NodeFilter(source_agent="other")) == 3

    def test_by_tags_all_required(self, storage):
        self.setup_nodes(storage)
        assert storage.count_nodes(NodeFilter(tags=["special"])) == 1
        assert storage.count_nodes(NodeFilter(tags=["special", "extra"])) == 1
        assert storage.count_nodes(NodeFilter(tags=["special", "missing"])) == 0

    def test_limit_offset(self, storage):
        self.setup_nodes(storage)
        page1 = storage.list_nodes(NodeFilter(limit=4))
        page2 = storage.list_nodes(NodeFilter(limit=4, offset=4))
        assert len(page1) == 4 and len(page2) == 4
        assert {n.id for n in page1}.isdisjoint({n.id for n in page2})

    def test_importance_range(self, storage):
        storage.put_node(mknode(title="Important node one", importance=0.9))
        storage.put_node(mknode(title="Unimportant node", importance=0.1))
        assert storage.count_nodes(NodeFilter(min_importance=0.5)) == 1

    def test_distinct_kinds(self, storage):
        self.setup_nodes(storage)
        assert storage.list_distinct_kinds() == ["event", "fact"]


class TestEdges:
    def test_put_edge_requires_endpoints(self, storage):
        a = mknode()
        storage.put_node(a)
        e = Edge.new(a.id, "ghost", "related_to", 0.5,
                     EdgeProvenance.manual("t"))
        with pytest.raises(InvalidEdge):
            storage.put_edge(e)

    def test_put_edge_rejects_deleted_endpoint(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        storage.delete_node(b.id)
        with pytest.raises(InvalidEdge):
            storage.put_edge(link(a, b))

    def test_duplicate_edge_rejected(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        storage.put_edge(link(a, b))
        with pytest.raises(DuplicateEdge):
            storage.put_edge(link(a, b))
        # different relation is fine
        storage.put_edge(link(a, b, relation="uses"))
        # reverse direction is fine
        storage.put_edge(link(b, a))

    def test_edges_between(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        storage.put_edge(link(a, b))
        storage.put_edge(link(b, a, relation="uses"))
        assert len(storage.edges_between(a.id, b.id)) == 2

    def test_atomic_weight_update(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        e = link(a, b)
        storage.put_edge(e)
        assert storage.update_edge_weight_atomic(e.id, 0.25)
        assert storage.get_edge(e.id).weight == pytest.approx(0.25)
        assert not storage.update_edge_weight_atomic("ghost", 0.1)

    def test_edge_update_same_id_not_duplicate(self, storage):
        a, b = mknode(), mknode(title="Second node title")
        storage.put_node(a)
        storage.put_node(b)
        e = link(a, b)
        storage.put_edge(e)
        e.weight = 0.9
        storage.put_edge(e)  # same id → update, not duplicate
        assert storage.get_edge(e.id).weight == pytest.approx(0.9)


class TestMetaAuditStats:
    def test_metadata_kv(self, storage):
        storage.put_metadata("cursor", "12345")
        assert storage.get_metadata("cursor") == "12345"
        storage.put_metadata("cursor", "6789")
        assert storage.get_metadata("cursor") == "6789"
        assert storage.get_metadata("missing") is None

    def test_audit_trail(self, storage):
        n = mknode()
        storage.put_node(n, actor="alice")
        storage.delete_node(n.id, actor="bob")
        entries = storage.query_audit(target_id=n.id)
        actions = [e.action for e in entries]
        assert "node_created" in actions and "node_deleted" in actions

    def test_stats(self, storage):
        storage.put_node(mknode(kind="fact"))
        storage.put_node(mknode(kind="event", title="Event node title"))
        s = storage.stats()
        assert s.node_count == 2
        assert s.nodes_by_kind == {"fact": 1, "event": 1}


class TestSqliteSpecific:
    def test_persistence_across_reopen(self, tmp_path):
        path = str(tmp_path / "p.db")
        s = SqliteStorage(path)
        n = mknode()
        n.embedding = [1.0, 2.0]
        s.put_node(n)
        s.close()
        s2 = SqliteStorage(path)
        got = s2.get_node(n.id)
        assert got.embedding == [1.0, 2.0]
        s2.close()

    def test_schema_version_mismatch(self, tmp_path):
        path = str(tmp_path / "v.db")
        s = SqliteStorage(path)
        s.put_metadata("schema_version", "99")
        s.close()
        with pytest.raises(SchemaVersionError):
            SqliteStorage(path)

    def test_snapshot(self, tmp_path):
        path = str(tmp_path / "s.db")
        s = SqliteStorage(path)
        s.put_node(mknode())
        dest = str(tmp_path / "snap.db")
        s.snapshot(dest)
        s.close()
        s2 = SqliteStorage(dest)
        assert s2.count_nodes() == 1
        s2.close()

    def test_golden_row_format(self, tmp_path):
        """Schema-regression guard (the reference's golden-bytes test,
        redb_storage.rs:1827-1885): a node written with pinned fields
        must land in the SQLite row EXACTLY like this. If this test
        breaks, you changed the on-disk format — bump SCHEMA_VERSION
        and write a migration."""
        import sqlite3
        from cortex_tpu.types import EdgeProvenance

        s = SqliteStorage(str(tmp_path / "golden.db"))
        n = Node(
            id="00000000-0000-7000-8000-000000000001", kind="fact",
            title="golden title", body="golden body",
            source=Source(agent="golden-agent", session="sess-1",
                          channel=None),
            importance=0.25, access_count=3, last_accessed_at=1000.5,
            created_at=1000.0, updated_at=1000.25, deleted=False)
        n.tags = ["a", "b"]
        n.metadata = {"k": 1}
        n.embedding = [0.5, 0.5]
        s.put_node(n)
        e = Edge(id="00000000-0000-7000-8000-00000000000e",
                 from_id=n.id, to_id=n.id + "x", relation="related_to",
                 weight=0.75,
                 provenance=EdgeProvenance.manual("golden-agent"),
                 created_at=2000.0, updated_at=2000.5)
        # bypass endpoint validation: write the edge row directly to pin
        # the wire format
        con = sqlite3.connect(str(tmp_path / "golden.db"))
        con.execute(
            "INSERT INTO edges(id, from_id, to_id, relation, weight, "
            "provenance, created_at, updated_at) VALUES (?,?,?,?,?,?,?,?)",
            (e.id, e.from_id, e.to_id, e.relation, e.weight,
             json.dumps(e.provenance.to_dict()), e.created_at,
             e.updated_at))
        con.commit()

        row = con.execute(
            "SELECT id, kind, title, body, metadata, tags, embedding_dim,"
            " source_agent, source_session, source_channel, importance,"
            " access_count, last_accessed_at, created_at, updated_at,"
            " deleted FROM nodes WHERE id=?", (n.id,)).fetchone()
        assert row == (
            "00000000-0000-7000-8000-000000000001", "fact",
            "golden title", "golden body", '{"k": 1}', '["a", "b"]', 2,
            "golden-agent", "sess-1", None, 0.25, 3, 1000.5, 1000.0,
            1000.25, 0)
        tags = con.execute(
            "SELECT tag FROM node_tags WHERE node_id=? ORDER BY tag",
            (n.id,)).fetchall()
        assert tags == [("a",), ("b",)]
        ver = con.execute(
            "SELECT value FROM meta WHERE key='schema_version'"
        ).fetchone()
        assert ver == ("2",)
        con.close()
        # and the store reads the golden row back intact
        n2 = s.get_node(n.id)
        assert n2.title == "golden title" and n2.embedding == [0.5, 0.5]
        assert n2.metadata == {"k": 1} and n2.tags == ["a", "b"]
        s.close()

    def test_concurrent_writes(self, tmp_path):
        s = SqliteStorage(str(tmp_path / "c.db"))
        errs = []

        def writer(i):
            try:
                for j in range(20):
                    s.put_node(mknode(title=f"Node from thread {i} item {j}"))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        assert s.count_nodes() == 80
        s.close()


class TestRecordAccess:
    """record_access must be an atomic conditional bump: it never
    resurrects a node deleted between the caller's read and the write
    (the r1 soak-flake root cause)."""

    def test_bumps_live_node(self, storage):
        n = mknode()
        storage.put_node(n)
        assert storage.record_access(n.id) is True
        fresh = storage.get_node(n.id)
        assert fresh.access_count == 1
        assert fresh.last_accessed_at is not None

    def test_reinforced_at_stamp(self, storage):
        n = mknode()
        storage.put_node(n)
        assert storage.record_access(n.id, now=123.0, reinforced_at=99.0)
        fresh = storage.get_node(n.id)
        assert fresh.metadata["_last_reinforced_at"] == 99.0
        assert fresh.last_accessed_at == 123.0
        assert fresh.updated_at == 123.0

    def test_never_resurrects_soft_deleted(self, storage):
        n = mknode()
        storage.put_node(n)
        storage.delete_node(n.id)
        assert storage.record_access(n.id) is False
        assert storage.get_node(n.id).deleted is True

    def test_never_resurrects_hard_deleted(self, storage):
        n = mknode()
        storage.put_node(n)
        storage.hard_delete_node(n.id)
        assert storage.record_access(n.id) is False
        assert storage.get_node(n.id) is None

    def test_missing_node(self, storage):
        assert storage.record_access("01912345-0000-7000-8000-0000000000aa") \
            is False


class TestKeysetPage:
    """list_nodes_since: the auto-linker's cursor page. Runs over both
    backends — SQLite's indexed override and the base-class default —
    so their semantics can't drift."""

    def test_page_order_limit_and_strict_boundary(self, storage):
        t0 = 1000.0
        same = [mknode(title=f"Same instant node {i}", created_at=t0)
                for i in range(3)]
        later = [mknode(title=f"Later node number {i}",
                        created_at=t0 + 1 + i) for i in range(4)]
        for n in same + later:
            storage.put_node(n)
        same_sorted = sorted(same, key=lambda n: n.id)

        # strict (created_at, id) > cursor: same-instant rows at or
        # before the cursor id are dropped, later ids at the same
        # instant come back first
        page = storage.list_nodes_since(t0, same_sorted[0].id, 10)
        assert [n.id for n in page] == (
            [n.id for n in same_sorted[1:]] + [n.id for n in later])

        # LIMIT honored, oldest-first
        page = storage.list_nodes_since(0.0, "", 2)
        assert [n.id for n in page] == [n.id for n in same_sorted[:2]]

        # paging through via the returned tail reaches everything once
        seen, cur = [], (0.0, "")
        while True:
            page = storage.list_nodes_since(cur[0], cur[1], 3)
            if not page:
                break
            seen.extend(n.id for n in page)
            cur = (page[-1].created_at, page[-1].id)
        assert seen == [n.id for n in same_sorted + later]

    def test_deleted_rows_are_excluded(self, storage):
        a = mknode(title="Will stay alive here", created_at=10.0)
        b = mknode(title="Will be soft deleted", created_at=20.0)
        storage.put_node(a)
        storage.put_node(b)
        storage.delete_node(b.id)
        page = storage.list_nodes_since(0.0, "", 10)
        assert [n.id for n in page] == [a.id]


class TestBatchWriteRead:
    def test_put_edges_batch_tolerant_skips_losers(self, storage):
        a, b, c = (mknode(title="Batch edge node aa"),
                   mknode(title="Batch edge node bb"),
                   mknode(title="Batch edge node cc"))
        for n in (a, b, c):
            storage.put_node(n)
        storage.put_edge(link(a, b))          # pre-existing -> duplicate
        ghost = mknode(title="Never stored node")
        batch = [link(a, b),                  # duplicate (from,to,relation)
                 link(b, c),                  # fine
                 link(a, ghost),              # invalid endpoint
                 link(c, a)]                  # fine
        created = storage.put_edges_batch(batch, tolerant=True)
        assert created == 2
        assert len(storage.edges_from(b.id)) == 1
        assert len(storage.edges_from(c.id)) == 1

    def test_put_edges_batch_strict_raises(self, storage):
        a, b = mknode(title="Strict batch aa"), mknode(title="Strict batch bb")
        storage.put_node(a)
        storage.put_node(b)
        storage.put_edge(link(a, b))
        import pytest as _pytest
        from cortex_tpu.errors import DuplicateEdge
        with _pytest.raises(DuplicateEdge):
            storage.put_edges_batch([link(a, b)])

    def test_get_nodes_batch(self, storage):
        ns = [mknode(title=f"Batch read node {i}") for i in range(7)]
        for n in ns:
            storage.put_node(n)
        got = storage.get_nodes([ns[0].id, ns[3].id, "missing-id", ns[6].id])
        assert set(got) == {ns[0].id, ns[3].id, ns[6].id}
        assert got[ns[3].id].title == ns[3].title


class TestRecordAccessBatch:
    def test_bumps_live_skips_deleted_and_missing(self, storage):
        a = mknode(title="Access batch live node")
        b = mknode(title="Access batch deleted node")
        storage.put_node(a)
        storage.put_node(b)
        storage.delete_node(b.id)
        got = storage.record_access_batch([a.id, b.id, "missing-id"])
        assert set(got) == {a.id}
        count, ts = got[a.id]
        assert count == 1 and ts > 0
        fresh = storage.get_node(a.id)
        assert fresh.access_count == 1
        assert storage.get_node(b.id).access_count == 0

    def test_does_not_touch_index_seq(self, storage):
        if storage.index_seq() is None:
            import pytest as _pytest
            _pytest.skip("backend has no index_seq")
        n = mknode(title="Access batch seq node")
        storage.put_node(n)
        seq0 = storage.index_seq()
        storage.record_access_batch([n.id])
        assert storage.index_seq() == seq0
