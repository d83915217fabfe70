"""Regressions for the sixth self-review pass: graph tombstone
semantics, native/Python parity, timeline recency, tokenizer special
tokens, viz escaping."""

import numpy as np
import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.graph import PathRequest, TraversalRequest
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def _chain(cx, n):
    """A -> B -> C ... chain of n fact nodes."""
    nodes = []
    for i in range(n):
        node = Node.new("fact", f"Chain node number {i} here",
                        f"Body for chain node number {i}, long enough.",
                        Source(agent="t"))
        cx.store(node)
        nodes.append(node)
    for a, b in zip(nodes, nodes[1:]):
        cx.create_edge(Edge.new(a.id, b.id, "related_to", 0.9,
                                EdgeProvenance.manual("t")))
    return nodes


class TestTombstoneTraversal:
    def test_deleted_node_not_traversed_through(self):
        """A -> B -> C with B soft-deleted: C must NOT appear (it was
        reachable only through a tombstone; the old code skipped B from
        the result but still expanded it)."""
        cx = Cortex.in_memory()
        a, b, c = _chain(cx, 3)
        cx.delete_node(b.id)
        for strategy in ("bfs", "dfs"):
            sub = cx.traverse(TraversalRequest(
                start=[a.id], max_depth=3, strategy=strategy))
            assert b.id not in sub.nodes
            assert c.id not in sub.nodes, f"{strategy} leaked through"
        cx.close()

    def test_kind_filter_still_passes_through(self):
        """Kind filtering shapes the RESULT, not the walk: A(fact) ->
        B(event) -> C(fact) with kind_filter=[fact] returns C."""
        cx = Cortex.in_memory()
        a, b, c = _chain(cx, 3)
        ev = cx.get_node(b.id)
        ev.kind = "event"
        cx.storage.put_node(ev)
        cx.graph.invalidate()
        sub = cx.traverse(TraversalRequest(
            start=[a.id], max_depth=3, kind_filter=["fact"]))
        assert c.id in sub.nodes and b.id not in sub.nodes
        cx.close()


class TestPathsParity:
    def test_self_path_requires_live_node(self):
        cx = Cortex.in_memory()
        (a,) = _chain(cx, 1)
        cx.delete_node(a.id)
        res = cx.find_paths(PathRequest(from_id=a.id, to_id=a.id))
        assert res.paths == []
        res2 = cx.find_paths(PathRequest(from_id="ghost", to_id="ghost"))
        assert res2.paths == []
        cx.close()

    def test_max_length_zero_means_zero(self):
        cx = Cortex.in_memory()
        a, b = _chain(cx, 2)
        res = cx.find_paths(PathRequest(from_id=a.id, to_id=b.id,
                                        max_length=0))
        assert res.paths == []
        cx.close()


class TestComponentsTombstones:
    def test_deleted_nodes_excluded_from_components(self):
        cx = Cortex.in_memory()
        a, b, c = _chain(cx, 3)
        cx.delete_node(b.id)
        cx.graph.invalidate()
        comps = cx.graph.components()
        flat = {nid for comp in comps for nid in comp}
        assert b.id not in flat
        assert a.id in flat and c.id in flat
        cx.close()


class TestTimelineRecency:
    def test_limit_keeps_newest(self):
        from cortex_tpu.graph.temporal import timeline
        cx = Cortex.in_memory()
        hub = Node.new("fact", "Timeline hub node here",
                       "Body long enough for the hub node checks.",
                       Source(agent="t"))
        cx.store(hub)
        import time as _t
        others = []
        for i in range(8):
            n = Node.new("fact", f"Spoke node number {i} ok",
                         f"Body long enough for spoke {i} checks.",
                         Source(agent="t"))
            cx.store(n)
            e = Edge.new(hub.id, n.id, "related_to", 0.5,
                         EdgeProvenance.manual("t"))
            e.created_at = _t.time() + i          # strictly increasing
            cx.create_edge(e)
            others.append(e)
        tl = timeline(cx.storage, hub.id, limit=3)
        assert len(tl) == 3
        # the newest three events, chronological
        assert [t.ts for t in tl] == sorted(t.ts for t in tl)
        assert tl[-1].ts == max(e.created_at for e in others)
        cx.close()


class TestTokenizerSpecialTokens:
    def test_quoted_special_token_survives(self):
        from cortex_tpu.models.tokenizer import WordPieceTokenizer
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                 "see", "above", "[", "]", "sep"]
        tok = WordPieceTokenizer(vocab)
        toks = tok.basic_tokenize("see [SEP] above")
        assert toks == ["see", "[SEP]", "above"]


class TestVizEscaping:
    def test_interpolated_fields_are_escaped(self):
        from cortex_tpu.server.viz import VIZ_HTML
        assert "esc(d.title)" in VIZ_HTML
        assert "esc((d.raw.data.body" in VIZ_HTML
        assert "${d.title}" not in VIZ_HTML
