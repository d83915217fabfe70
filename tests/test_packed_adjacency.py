"""Packed adjacency (graph/packed.py) and its mirror routing (r4).

At the reference's 100M-edge ceiling the object-graph AdjacencyCache
would hold ~200M python objects — the structure that CAPS the
reference, reproduced worse. Proximity routes through a numpy CSR
above an edge threshold instead. These tests pin exact parity between
the two worlds on randomized graphs: build contents, BFS depths, the
device neighbor table, per_anchor_depths end-to-end (packed vs object
route), the forced device-walk tier, and the rebuild debounce.
"""

import numpy as np
import pytest

from cortex_tpu.graph.cache import AdjacencyCache
from cortex_tpu.graph.csr import DeviceGraphMirror
from cortex_tpu.graph.packed import UNREACHED, PackedAdjacency
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def build_graph(n_nodes=60, n_edges=150, seed=0):
    st = MemoryStorage()
    rng = np.random.default_rng(seed)
    ids = []
    for i in range(n_nodes):
        node = Node.new("fact", f"packed test node {i}",
                        f"body {i}", Source(agent="t"))
        st.put_node(node)
        ids.append(node.id)
    made = set()
    for _ in range(n_edges):
        a, b = rng.integers(0, n_nodes, 2)
        if a == b or (a, b) in made:
            continue
        made.add((int(a), int(b)))
        st.put_edge(Edge.new(ids[a], ids[b], "related_to", 0.5,
                             EdgeProvenance.manual("t")))
    return st, ids


class TestBuild:
    def test_matches_object_cache(self):
        st, ids = build_graph()
        pk = PackedAdjacency.build(st)
        cache = AdjacencyCache(st)
        for nid in ids:
            want = {a.neighbor for a in cache.outgoing(nid)} \
                | {a.neighbor for a in cache.incoming(nid)}
            if nid not in pk.row_of:
                assert not want
                continue
            r = pk.row_of[nid]
            got = {pk.ids[j] for j in
                   pk.indices[pk.indptr[r]:pk.indptr[r + 1]]}
            assert got == want, nid

    def test_empty_store(self):
        st = MemoryStorage()
        pk = PackedAdjacency.build(st)
        assert pk.n == 0 and pk.edge_count == 0
        assert pk.multi_bfs([], 3) is not None

    def test_edge_endpoints_chunking(self, storage):
        rng = np.random.default_rng(3)
        ids = []
        for i in range(20):
            node = Node.new("fact", f"endpoint node number {i}",
                            f"endpoint body {i}", Source(agent="t"))
            storage.put_node(node)
            ids.append(node.id)
        want = set()
        for _ in range(40):
            a, b = rng.integers(0, 20, 2)
            if a == b:
                continue
            try:
                e = Edge.new(ids[a], ids[b], "related_to", 0.5,
                             EdgeProvenance.manual("t"))
                storage.put_edge(e)
                want.add((e.from_id, e.to_id))
            except Exception:  # noqa: BLE001 — duplicate edges
                pass
        got = set()
        for fs, ts in storage.edge_endpoints(chunk=7):
            assert len(fs) == len(ts) <= 7
            got |= set(zip(fs, ts))
        assert got == want


class TestBfsParity:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_multi_bfs_matches_host_bfs(self, seed):
        st, ids = build_graph(seed=seed)
        pk = PackedAdjacency.build(st)
        mirror = DeviceGraphMirror(AdjacencyCache(st))
        anchors = [ids[0], ids[7], ids[13]]
        for hops in (1, 2, 4):
            want = mirror._host_multi_bfs(anchors, hops, 10**9)
            rows = [pk.row_of[a] for a in anchors if a in pk.row_of]
            dist = pk.multi_bfs(rows, hops)
            got = {pk.ids[i]: int(d)
                   for i, d in enumerate(dist) if d != UNREACHED}
            # host BFS includes edge-less anchors at depth 0; packed
            # universe only spans edge endpoints
            want = {k: v for k, v in want.items()
                    if k in pk.row_of}
            assert got == want

    def test_budget_overflow_returns_none(self):
        st, ids = build_graph(n_nodes=40, n_edges=300, seed=5)
        pk = PackedAdjacency.build(st)
        assert pk.multi_bfs([pk.row_of[ids[0]]], 4, budget=3) is None

    def test_neighbor_table_matches_mirror(self):
        st, ids = build_graph(seed=9)
        pk = PackedAdjacency.build(st)
        mirror = DeviceGraphMirror(AdjacencyCache(st))
        mirror.ensure()
        nbrs, trunc = pk.neighbor_table(mirror._max_deg)
        assert trunc == mirror.truncated_nodes == 0
        mnbrs = np.asarray(mirror._nbrs)
        for nid, r in pk.row_of.items():
            got = {int(x) for x in nbrs[r] if x >= 0}
            mr = mirror._row_of[nid]
            want_ids = {mirror._id_of[int(x)]
                        for x in mnbrs[mr] if x >= 0}
            assert {pk.ids[x] for x in got} == want_ids


class TestMirrorRouting:
    def _forced_packed(self, st) -> DeviceGraphMirror:
        m = DeviceGraphMirror(AdjacencyCache(st))
        m.PACKED_EDGE_THRESHOLD = 0     # instance override
        return m

    def test_per_anchor_depths_parity(self):
        st, ids = build_graph(seed=11)
        obj = DeviceGraphMirror(AdjacencyCache(st))
        packed = self._forced_packed(st)
        anchors = [ids[2], ids[19]]
        want = obj.per_anchor_depths(anchors, 3)
        got = packed.per_anchor_depths(anchors, 3)
        want = {k: v for k, v in want.items()
                if k in packed._ensure_packed().row_of}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_device_walk_tier_parity(self):
        """Starved host budget forces the device frontier walk; with
        no hub truncation results must match the host tier exactly."""
        st, ids = build_graph(seed=13)
        packed = self._forced_packed(st)
        anchors = [ids[4], ids[30]]
        want = packed.per_anchor_depths(anchors, 3)
        forced = self._forced_packed(st)
        forced.HOST_FRONTIER_BUDGET = 0
        got = forced.per_anchor_depths(anchors, 3)
        assert forced.truncated_nodes == 0
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_in_graph_and_anchor_rows_packed(self):
        st, ids = build_graph(seed=15)
        packed = self._forced_packed(st)
        lonely = Node.new("fact", "edge-less loner node",
                          "no edges attach here", Source(agent="t"))
        st.put_node(lonely)
        linked = [i for i in ids
                  if i in packed._ensure_packed().row_of]
        assert packed._in_graph(linked[0])
        assert not packed._in_graph(lonely.id)
        assert packed.anchor_row_ids([lonely.id, linked[0]]) == \
            [linked[0]]

    def test_rebuild_debounce(self):
        import time as _t
        st, ids = build_graph(seed=17)
        packed = self._forced_packed(st)
        pk1 = packed._ensure_packed()
        # graph mutates; within REBUILD_MIN_S the stale snapshot serves
        st.put_edge(Edge.new(ids[0], ids[1], "supersedes", 0.9,
                            EdgeProvenance.manual("t")))
        packed._cache.invalidate()
        assert packed._ensure_packed() is pk1
        # past the debounce window the tripping call STILL serves the
        # stale snapshot (rebuilds are background); the swap lands
        # shortly after
        packed.REBUILD_MIN_S = 0.0
        assert packed._ensure_packed() is pk1
        deadline = _t.monotonic() + 10
        while packed._packed is pk1 and _t.monotonic() < deadline:
            _t.sleep(0.02)
        pk2 = packed._ensure_packed()
        assert pk2 is not pk1
        assert packed.packed_rebuilds == 2
        r = pk2.row_of[ids[0]]
        assert pk2.row_of[ids[1]] in set(
            pk2.indices[pk2.indptr[r]:pk2.indptr[r + 1]].tolist())

    def test_version_stable_no_rebuild(self):
        st, ids = build_graph(seed=19)
        packed = self._forced_packed(st)
        packed.REBUILD_MIN_S = 0.0
        pk1 = packed._ensure_packed()
        assert packed._ensure_packed() is pk1   # version unchanged
        assert packed.packed_rebuilds == 1


class TestReviewR4Fixes:
    """Regressions for the r4 review findings in the packed tier."""

    def _forced(self, st):
        m = DeviceGraphMirror(AdjacencyCache(st))
        m.PACKED_EDGE_THRESHOLD = 0
        return m

    def test_rebuild_never_blocks_readers(self, monkeypatch):
        """A debounced rebuild runs on the tripping thread only;
        concurrent readers serve the previous snapshot instead of
        queueing behind a minutes-long build."""
        import threading
        import time as _t
        st, ids = build_graph(seed=21)
        m = self._forced(st)
        pk1 = m._ensure_packed()
        m.REBUILD_MIN_S = 0.0
        m._cache.invalidate()

        real_build = PackedAdjacency.build
        entered = threading.Event()
        release = threading.Event()

        def slow_build(storage, chunk=1_000_000):
            entered.set()
            release.wait(timeout=10)
            return real_build(storage, chunk)

        monkeypatch.setattr(PackedAdjacency, "build",
                            staticmethod(slow_build))
        # the tripping reader returns the stale snapshot immediately
        # (the rebuild runs on a background thread)
        t0 = _t.monotonic()
        assert m._ensure_packed() is pk1
        assert _t.monotonic() - t0 < 1.0
        assert entered.wait(timeout=5)
        # readers during the build: still immediate stale snapshots
        t0 = _t.monotonic()
        assert m._ensure_packed() is pk1
        assert _t.monotonic() - t0 < 1.0
        release.set()
        deadline = _t.monotonic() + 10
        while m._packed is pk1 and _t.monotonic() < deadline:
            _t.sleep(0.02)
        assert m._packed is not pk1          # rebuild landed

    def test_device_table_keyed_to_snapshot(self):
        """The device neighbor table caches on the snapshot, so an
        old snapshot can never pair with a new snapshot's ids."""
        st, ids = build_graph(seed=23)
        m = self._forced(st)
        pk1 = m._ensure_packed()
        t1 = m._packed_device_nbrs(pk1)
        m.REBUILD_MIN_S = 0.0
        st.put_edge(Edge.new(ids[0], ids[2], "supersedes", 0.9,
                             EdgeProvenance.manual("t")))
        m._cache.invalidate()
        import time as _t
        m._ensure_packed()                 # trips the background swap
        deadline = _t.monotonic() + 10
        while m._packed is pk1 and _t.monotonic() < deadline:
            _t.sleep(0.02)
        pk2 = m._ensure_packed()
        assert pk2 is not pk1
        t2 = m._packed_device_nbrs(pk2)
        assert t2 is not t1
        assert m._packed_device_nbrs(pk1) is t1   # old pairing intact

    def test_out_cap_fill_falls_back_to_exact(self):
        """When the device compaction width fills, the tier falls
        back to the exact host BFS — reachable nodes must never
        silently score zero."""
        st, ids = build_graph(seed=25)
        m = self._forced(st)
        want = m.per_anchor_depths([ids[3]], 3)
        forced = self._forced(st)
        forced.HOST_FRONTIER_BUDGET = 0      # device tier for all
        forced.PACKED_OUT_CAP = 4            # width certainly fills
        got = forced.per_anchor_depths([ids[3]], 3)
        assert forced.packed_overflows >= 1
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    def test_build_failure_degrades_and_backs_off(self):
        """First-build failure: proximity degrades to empty (hybrid
        serves vector-only) and the build is not re-attempted inside
        the backoff window."""
        st, ids = build_graph(seed=27)
        m = self._forced(st)
        calls = {"n": 0}
        real = st.edge_endpoints

        def boom(chunk=1_000_000):
            calls["n"] += 1
            raise OSError("storage io error (test)")

        st.edge_endpoints = boom
        assert m.per_anchor_depths([ids[0]], 3) == {}
        assert m._in_graph(ids[0]) is False
        assert calls["n"] == 1
        # inside the backoff window: no second build attempt
        assert m.per_anchor_depths([ids[0]], 3) == {}
        assert calls["n"] == 1
        # after backoff, a healthy storage recovers
        m._build_backoff_until = 0.0
        st.edge_endpoints = real
        assert m.per_anchor_depths([ids[0]], 3)
