"""Bulk-load path tests (VERDICT r4 #3).

The r4 10M seed took 1,455 s at ~6.9k rows/s because every row paid
the full gate/embed/linker admission machinery plus per-row SQL.
These pin the fast path: executemany transactions, suspended
index_seq trigger (restored transactionally), additive semantics,
linker-cursor advance, CLI wiring.
"""

import json
import time

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.storage.sqlite_store import SqliteStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def _nodes(n, prefix="bulk"):
    out = []
    for i in range(n):
        node = Node.new("fact", f"{prefix} node {i} title",
                        f"{prefix} node {i} body text with enough words "
                        f"to stand alone {i}", Source(agent="loader"))
        node.tags = ["imported"] if i % 3 == 0 else []
        out.append(node)
    return out


class TestSqliteBulk:
    def test_insert_counts_and_additive(self):
        store = SqliteStorage()
        nodes = _nodes(50)
        assert store.bulk_put_nodes(nodes) == 50
        # re-import is additive: existing ids untouched, count 0
        nodes[0].title = "clobber attempt title"
        assert store.bulk_put_nodes(nodes) == 0
        got = store.get_node(nodes[0].id)
        assert got.title.startswith("bulk node 0")

    def test_index_seq_bumped_and_trigger_restored(self):
        store = SqliteStorage()
        base = store.index_seq()
        store.bulk_put_nodes(_nodes(20))
        assert store.index_seq() == base + 20
        # the per-row trigger must be back: a normal insert bumps by 1
        extra = _nodes(1, prefix="after")[0]
        store.put_node(extra)
        assert store.index_seq() == base + 21

    def test_trigger_restored_on_error(self):
        store = SqliteStorage()
        base = store.index_seq()
        rows = [("only", "five", "columns", "is", "wrong")]
        with pytest.raises(Exception):
            store.bulk_insert_node_rows(rows)
        store.put_node(_nodes(1)[0])
        assert store.index_seq() == base + 1

    def test_tags_and_audit_summary(self):
        store = SqliteStorage()
        nodes = _nodes(9)
        store.bulk_put_nodes(nodes)
        from cortex_tpu.storage.base import NodeFilter
        tagged = store.list_nodes(NodeFilter(tags=["imported"]))
        assert len(tagged) == 3
        audits = store.query_audit(action="bulk_import_nodes")
        assert len(audits) == 1 and audits[0].target_id == "count=9"

    def test_bulk_edges_no_validation(self):
        store = SqliteStorage()
        nodes = _nodes(10)
        store.bulk_put_nodes(nodes)
        edges = [Edge.new(nodes[i].id, nodes[(i + 1) % 10].id,
                          "related_to", 0.5,
                          EdgeProvenance.imported("test"))
                 for i in range(10)]
        assert store.bulk_put_edges(edges) == 10
        # duplicate ids ignored, not raised
        assert store.bulk_put_edges(edges) == 0
        assert store.stats().edge_count == 10


class TestCortexBulkImport:
    def test_end_to_end_searchable_and_cursor_advanced(self):
        cx = Cortex.in_memory()
        try:
            nodes = _nodes(40, prefix="corpus")
            edges = [Edge.new(nodes[0].id, nodes[1].id, "related_to",
                              0.9, EdgeProvenance.imported("t"))]
            res = cx.bulk_import(nodes, edges=edges)
            assert res["nodes"] == 40 and res["edges"] == 1
            assert len(cx.index) >= 40
            hits = cx.search("corpus node 7 title", limit=5)
            assert hits, "bulk-imported rows must be searchable"
            # linker cursor advanced past the import: a cycle scans 0
            from cortex_tpu.linker.auto_linker import CURSOR_KEY
            cur = cx.storage.get_metadata(CURSOR_KEY)
            assert cur is not None
            assert float(cur) >= max(n.created_at for n in nodes)
        finally:
            cx.close()

    def test_opt_in_linking_leaves_cursor(self):
        cx = Cortex.in_memory()
        try:
            cx.bulk_import(_nodes(5), advance_linker_cursor=False)
            from cortex_tpu.linker.auto_linker import CURSOR_KEY
            assert cx.storage.get_metadata(CURSOR_KEY) is None
        finally:
            cx.close()


class TestCliBulkImport:
    def test_cli_import_bulk_jsonl(self, tmp_path, capsys):
        f = tmp_path / "rows.jsonl"
        with open(f, "w") as fh:
            for i in range(25):
                fh.write(json.dumps({
                    "id": f"row-{i:04d}", "kind": "fact",
                    "title": f"cli bulk row {i} title",
                    "body": f"cli bulk row {i} body with plenty of "
                            f"distinct words {i}",
                }) + "\n")
        from cortex_tpu.cli.main import main
        data_dir = str(tmp_path / "data")
        rc = main(["--data-dir", data_dir, "import", str(f),
                   "--format", "jsonl", "--bulk"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "25" in out
        import os
        db = os.path.join(data_dir, "cortex.db")
        store = SqliteStorage(db)
        assert store.stats().node_count == 25
        store.close()


class TestReviewR5Fixes:
    def test_duplicate_ids_do_not_touch_index(self):
        """Review r5 #1: the additive contract applies to the index
        too — re-importing an existing id must not overwrite its
        vector/kind/agent with content storage never accepted."""
        cx = Cortex.in_memory()
        try:
            orig = Node.new("fact", "original title text",
                            "the original body content of this node",
                            Source(agent="first"))
            cx.store(orig)
            vec_before = np.array(
                cx.index._corpus._emb_h[
                    cx.index._corpus._row_of[orig.id]])
            clone = Node.new("decision", "imported clobber title",
                             "completely different imported body text",
                             Source(agent="second"))
            clone.id = orig.id
            res = cx.bulk_import([clone])
            assert res["nodes"] == 0
            vec_after = np.array(
                cx.index._corpus._emb_h[
                    cx.index._corpus._row_of[orig.id]])
            assert np.allclose(vec_before, vec_after), \
                "index vector overwritten by a skipped duplicate"
        finally:
            cx.close()

    def test_live_linker_cursor_advances(self):
        """Review r5 #2: the LIVE linker's in-memory cursor must move,
        not just the stored metadata — otherwise the next cycle
        re-links the imported backlog and clobbers the metadata."""
        cx = Cortex.in_memory()
        try:
            cx.bulk_import(_nodes(12, prefix="livecursor"))
            m = cx.run_linker_cycle()
            assert m.cycle_nodes_processed == 0, \
                "linker re-scanned bulk-imported rows"
        finally:
            cx.close()
