"""Graph engine tests (parity model: reference graph/tests.rs, 27 tests)."""

import numpy as np
import pytest

from cortex_tpu.graph import (BFS, BOTH, DFS, INCOMING, OUTGOING, WEIGHTED,
                              DeviceGraphMirror, GraphEngine, PathRequest,
                              TraversalBudget, TraversalRequest)
from cortex_tpu.graph.temporal import changed_since, neighborhood_at, timeline
from cortex_tpu.storage import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def mknode(title, kind="fact"):
    return Node.new(kind, title, f"Body of {title}", Source(agent="t"))


def build_chain(storage, n=5, relation="led_to", weight=0.8):
    """a0 -> a1 -> ... -> a(n-1)"""
    nodes = [mknode(f"Chain node {i}") for i in range(n)]
    for nd in nodes:
        storage.put_node(nd)
    edges = []
    for i in range(n - 1):
        e = Edge.new(nodes[i].id, nodes[i + 1].id, relation, weight,
                     EdgeProvenance.manual("t"))
        storage.put_edge(e)
        edges.append(e)
    return nodes, edges


@pytest.fixture
def engine():
    s = MemoryStorage()
    return GraphEngine(s), s


class TestBfs:
    def test_depth_limit(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 5)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=2))
        assert set(sub.nodes) == {n.id for n in nodes[:3]}
        assert sub.depths[nodes[2].id] == 2

    def test_include_start_false(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=1,
                                          include_start=False))
        assert nodes[0].id not in sub.nodes
        assert nodes[1].id in sub.nodes

    def test_direction_incoming(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        sub = g.traverse(TraversalRequest(start=[nodes[2].id], max_depth=2,
                                          direction=INCOMING))
        assert set(sub.nodes) == {n.id for n in nodes}

    def test_direction_outgoing_stops(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        sub = g.traverse(TraversalRequest(start=[nodes[2].id], max_depth=2,
                                          direction=OUTGOING))
        assert set(sub.nodes) == {nodes[2].id}

    def test_relation_filter(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3, relation="led_to")
        other = mknode("Other branch")
        s.put_node(other)
        s.put_edge(Edge.new(nodes[0].id, other.id, "uses", 0.9,
                            EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=3,
                                          relation_filter=["led_to"]))
        assert other.id not in sub.nodes
        assert nodes[2].id in sub.nodes

    def test_kind_filter_does_not_stop_traversal(self, engine):
        g, s = engine
        a, b, c = mknode("Node a"), mknode("Node b", kind="event"), mknode("Node c")
        for n in (a, b, c):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, b.id, "led_to", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, c.id, "led_to", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=3,
                                          kind_filter=["fact"]))
        assert b.id not in sub.nodes       # filtered from result
        assert c.id in sub.nodes           # but traversed through b

    def test_min_weight_prunes(self, engine):
        g, s = engine
        a, b, c = mknode("Node a"), mknode("Node b"), mknode("Node c")
        for n in (a, b, c):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.2, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, c.id, "uses", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=1,
                                          min_weight=0.5))
        assert c.id in sub.nodes and b.id not in sub.nodes

    def test_limit_truncates(self, engine):
        g, s = engine
        hub = mknode("Hub node")
        s.put_node(hub)
        for i in range(10):
            n = mknode(f"Spoke number {i}")
            s.put_node(n)
            s.put_edge(Edge.new(hub.id, n.id, "uses", 0.9,
                                EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[hub.id], max_depth=1, limit=5))
        assert len(sub.nodes) == 5
        assert sub.truncated

    def test_deleted_nodes_not_traversed(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        s.delete_node(nodes[1].id)
        g.invalidate()
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=3))
        assert nodes[1].id not in sub.nodes

    def test_edges_post_pass(self, engine):
        g, s = engine
        nodes, edges = build_chain(s, 3)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=1))
        assert {e.id for e in sub.edges} == {edges[0].id}

    def test_budget_visited_cap(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 10)
        g.budget = TraversalBudget(max_visited=3)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=None))
        assert sub.truncated

    def test_cycle_terminates(self, engine):
        g, s = engine
        a, b = mknode("Cycle a"), mknode("Cycle b")
        s.put_node(a)
        s.put_node(b)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, a.id, "uses", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=5))
        assert set(sub.nodes) == {a.id, b.id}


class TestDfsWeighted:
    def test_dfs_reaches_chain_end(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 5)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=4,
                                          strategy=DFS))
        assert nodes[4].id in sub.nodes

    def test_weighted_visits_all_reachable(self, engine):
        g, s = engine
        a, b, c = mknode("Wa"), mknode("Wb"), mknode("Wc")
        for n in (a, b, c):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.1, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, c.id, "uses", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=1,
                                          strategy=WEIGHTED))
        assert {b.id, c.id} <= set(sub.nodes)

    def test_weighted_limit_prefers_heavy(self, engine):
        g, s = engine
        a, b, c = mknode("Wa"), mknode("Wb"), mknode("Wc")
        for n in (a, b, c):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.1, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, c.id, "uses", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=2, limit=2,
                                          strategy=WEIGHTED))
        assert c.id in sub.nodes


class TestPaths:
    def test_bfs_shortest(self, engine):
        g, s = engine
        nodes, edges = build_chain(s, 4)
        res = g.find_paths(PathRequest(from_id=nodes[0].id, to_id=nodes[3].id))
        assert len(res.paths) == 1
        p = res.paths[0]
        assert p.nodes == [n.id for n in nodes]
        assert p.length == 3
        assert p.total_weight == pytest.approx(0.8 ** 3)

    def test_no_path(self, engine):
        g, s = engine
        a, b = mknode("Iso a"), mknode("Iso b")
        s.put_node(a)
        s.put_node(b)
        res = g.find_paths(PathRequest(from_id=a.id, to_id=b.id))
        assert res.paths == []

    def test_max_length(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 5)
        res = g.find_paths(PathRequest(from_id=nodes[0].id, to_id=nodes[4].id,
                                       max_length=3))
        assert res.paths == []

    def test_dijkstra_prefers_strong_path(self, engine):
        g, s = engine
        a, b, c, d = (mknode(x) for x in ("Pa", "Pb", "Pc", "Pd"))
        for n in (a, b, c, d):
            s.put_node(n)
        # weak direct path a->d (0.2); strong detour a->b->c->d (0.9^3)
        s.put_edge(Edge.new(a.id, d.id, "uses", 0.2, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, c.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(c.id, d.id, "uses", 0.9, EdgeProvenance.manual("t")))
        res = g.find_paths(PathRequest(from_id=a.id, to_id=d.id,
                                       min_weight=0.0))
        assert res.paths[0].nodes == [a.id, b.id, c.id, d.id]
        assert res.paths[0].total_weight == pytest.approx(0.9 ** 3)

    def test_yen_k_shortest(self, engine):
        g, s = engine
        a, b, c, d = (mknode(x) for x in ("Ya", "Yb", "Yc", "Yd"))
        for n in (a, b, c, d):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, d.id, "uses", 0.5, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, d.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(a.id, c.id, "uses", 0.8, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(c.id, d.id, "uses", 0.8, EdgeProvenance.manual("t")))
        res = g.find_paths(PathRequest(from_id=a.id, to_id=d.id, max_paths=3))
        assert len(res.paths) == 3
        assert res.paths[0].length == 1
        assert {p.length for p in res.paths[1:]} == {2}

    def test_same_node(self, engine):
        g, s = engine
        a = mknode("Self")
        s.put_node(a)
        res = g.find_paths(PathRequest(from_id=a.id, to_id=a.id))
        assert res.paths[0].nodes == [a.id]
        assert res.paths[0].length == 0


class TestAnalytics:
    def test_neighbors_both(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        assert g.neighbors(nodes[1].id) == sorted([nodes[0].id, nodes[2].id])

    def test_neighborhood_depths(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 4)
        nb = g.neighborhood(nodes[0].id, depth=2)
        depths = {n.node_id: n.depth for n in nb}
        assert depths[nodes[1].id] == 1 and depths[nodes[2].id] == 2

    def test_reachable(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        assert g.reachable(nodes[0].id, nodes[2].id)
        assert not g.reachable(nodes[2].id, nodes[0].id)

    def test_roots_and_leaves(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        assert g.roots() == [nodes[0].id]
        assert g.leaves() == [nodes[2].id]

    def test_most_connected(self, engine):
        g, s = engine
        hub = mknode("Hub")
        s.put_node(hub)
        spokes = [mknode(f"Spoke {i}") for i in range(4)]
        for sp in spokes:
            s.put_node(sp)
            s.put_edge(Edge.new(hub.id, sp.id, "uses", 0.9,
                                EdgeProvenance.manual("t")))
        top = g.most_connected(2)
        assert top[0] == (hub.id, 4)

    def test_find_cycles(self, engine):
        g, s = engine
        a, b, c = mknode("Ca"), mknode("Cb"), mknode("Cc")
        for n in (a, b, c):
            s.put_node(n)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, c.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(c.id, a.id, "uses", 0.9, EdgeProvenance.manual("t")))
        cycles = g.find_cycles()
        assert len(cycles) == 1
        assert set(cycles[0][:-1]) == {a.id, b.id, c.id}

    def test_no_cycles_in_dag(self, engine):
        g, s = engine
        build_chain(s, 4)
        assert g.find_cycles() == []

    def test_components(self, engine):
        g, s = engine
        n1, _ = build_chain(s, 3)
        n2, _ = build_chain(s, 2)
        iso = mknode("Isolated")
        s.put_node(iso)
        g.invalidate()
        comps = g.components()
        assert [len(c) for c in comps] == [3, 2, 1]


class TestSubgraphOps:
    def test_topo_sort(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 4)
        sub = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=4))
        assert sub.topo_sort() == [n.id for n in nodes]

    def test_topo_sort_cycle_none(self, engine):
        g, s = engine
        a, b = mknode("Ta"), mknode("Tb")
        s.put_node(a)
        s.put_node(b)
        s.put_edge(Edge.new(a.id, b.id, "uses", 0.9, EdgeProvenance.manual("t")))
        s.put_edge(Edge.new(b.id, a.id, "uses", 0.9, EdgeProvenance.manual("t")))
        sub = g.traverse(TraversalRequest(start=[a.id], max_depth=3))
        assert sub.topo_sort() is None

    def test_merge(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 4)
        s1 = g.traverse(TraversalRequest(start=[nodes[0].id], max_depth=1))
        s2 = g.traverse(TraversalRequest(start=[nodes[2].id], max_depth=1))
        m = s1.merge(s2)
        assert set(m.nodes) == {nodes[0].id, nodes[1].id, nodes[2].id,
                                nodes[3].id}


class TestDeviceMirror:
    def test_depths_match_bfs(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 5)
        mirror = DeviceGraphMirror(g.cache)
        depths = mirror.depths_from([nodes[0].id], max_hops=3)
        for i in range(4):
            assert depths[nodes[i].id] == i
        assert nodes[4].id not in depths

    def test_multi_anchor_min(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 5)
        depths = DeviceGraphMirror(g.cache).depths_from(
            [nodes[0].id, nodes[4].id], max_hops=2)
        assert depths[nodes[2].id] == 2
        assert depths[nodes[3].id] == 1    # nearer to the far anchor

    def test_proximity_scores(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 3)
        prox = DeviceGraphMirror(g.cache).proximity_scores([nodes[0].id], 2)
        assert prox[nodes[0].id] == pytest.approx(1.0)
        assert prox[nodes[1].id] == pytest.approx(0.5)
        assert prox[nodes[2].id] == pytest.approx(1 / 3)

    def test_batch_graph_scores_matches_scalar(self, engine):
        """The batched candidate-gather form must agree with
        proximity_scores per id, handle None slots and unknown ids as
        0, and respect max_hops."""
        g, s = engine
        nodes, _ = build_chain(s, 5)
        mirror = DeviceGraphMirror(g.cache)
        scalar = mirror.proximity_scores([nodes[0].id], 2)
        cands = [[nodes[0].id, nodes[2].id, None, "missing-id"],
                 [nodes[4].id, nodes[1].id, nodes[3].id, nodes[0].id]]
        got = mirror.batch_graph_scores([nodes[0].id], 2, cands)
        assert got.shape == (2, 4)
        assert got[0, 0] == pytest.approx(scalar[nodes[0].id])
        assert got[0, 1] == pytest.approx(scalar[nodes[2].id])
        assert got[0, 2] == 0.0 and got[0, 3] == 0.0
        assert got[1, 0] == 0.0            # depth 4 > max_hops
        assert got[1, 1] == pytest.approx(scalar[nodes[1].id])
        assert got[1, 2] == 0.0            # depth 3 > max_hops
        # no anchors -> all zeros
        assert (mirror.batch_graph_scores([], 2, cands) == 0).all()

    def test_device_fallback_matches_host_path(self, engine, monkeypatch):
        """Over the frontier budget the mirror falls back to the device
        relaxation; both forms must return identical depths."""
        g, s = engine
        nodes, _ = build_chain(s, 6)
        mirror = DeviceGraphMirror(g.cache)
        host = mirror.depths_from([nodes[0].id], 3)
        host_per = mirror.per_anchor_depths([nodes[0].id, nodes[5].id], 3)
        monkeypatch.setattr(DeviceGraphMirror, "HOST_FRONTIER_BUDGET", 0)
        dev = mirror.depths_from([nodes[0].id], 3)
        dev_per = mirror.per_anchor_depths([nodes[0].id, nodes[5].id], 3)
        assert dev == host
        assert set(dev_per) == set(host_per)
        for nid in host_per:
            assert host_per[nid].tolist() == dev_per[nid].tolist()
        cands = [[nodes[2].id, None], [nodes[4].id, nodes[0].id]]
        a = mirror.batch_graph_scores([nodes[0].id], 2, cands)
        monkeypatch.undo()
        b = mirror.batch_graph_scores([nodes[0].id], 2, cands)
        np.testing.assert_allclose(a, b)

    def test_device_frontier_overflow_falls_back_to_relaxation(
            self, engine, monkeypatch):
        """A frontier bigger than the device walk's cap must flag
        overflow and take the full min-plus relaxation — depths stay
        exact either way (r3 100M-edge tier)."""
        g, s = engine
        nodes, _ = build_chain(s, 8)
        mirror = DeviceGraphMirror(g.cache)
        # mid-chain anchor: each hop discovers 2 new nodes > cap of 1
        want = mirror.depths_from([nodes[3].id], 4)
        monkeypatch.setattr(DeviceGraphMirror, "HOST_FRONTIER_BUDGET", 0)
        monkeypatch.setattr(DeviceGraphMirror, "DEVICE_FRONTIER_CAP", 1)
        assert mirror.depths_from([nodes[3].id], 4) == want

    def test_version_rebuild(self, engine):
        g, s = engine
        nodes, _ = build_chain(s, 2)
        mirror = DeviceGraphMirror(g.cache)
        assert mirror.depths_from([nodes[0].id], 1)[nodes[1].id] == 1
        c = mknode("Added later")
        s.put_node(c)
        s.put_edge(Edge.new(nodes[1].id, c.id, "uses", 0.9,
                            EdgeProvenance.manual("t")))
        g.invalidate()
        assert mirror.depths_from([nodes[0].id], 2)[c.id] == 2


class TestTemporal:
    def test_changed_since(self, engine):
        g, s = engine
        import time
        old = mknode("Old node")
        old.updated_at = 100.0
        s.put_node(old)
        new = mknode("New node")
        s.put_node(new)
        got = changed_since(s, time.time() - 60)
        assert [n.id for n in got] == [new.id]

    def test_neighborhood_at_excludes_future(self, engine):
        g, s = engine
        nodes, edges = build_chain(s, 3)
        cut = edges[0].created_at       # before edge[1] exists? same-ish time
        # force distinct times
        e2 = s.get_edge(edges[1].id)
        e2.created_at = cut + 100
        s.delete_edge(edges[1].id)
        # re-add with future timestamp
        s.put_edge(e2)
        g.invalidate()
        sub = neighborhood_at(s, g.cache, nodes[0].id, cut + 1, depth=3)
        assert nodes[1].id in sub.nodes
        assert nodes[2].id not in sub.nodes

    def test_timeline(self, engine):
        g, s = engine
        nodes, edges = build_chain(s, 2)
        tl = timeline(s, nodes[0].id)
        events = [t.event for t in tl]
        assert "node_created" in events and "edge_created" in events
