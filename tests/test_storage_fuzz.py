"""Differential fuzz: MemoryStorage vs SqliteStorage.

The two backends implement the same Storage contract
(reference trait: crates/cortex-core/src/storage/traits.rs:7-87) with
completely different mechanics — dict mirrors + python filters vs SQL
secondary indexes + meta counters. A seeded random op stream drives
BOTH and cross-checks every read surface after each burst, so any
divergence in filter semantics, index maintenance, tombstone handling,
O(1) counter upkeep, or error classification shows up as a mismatch
instead of a production-only bug. Same spirit as the query-DSL
differential fuzz (tests/test_gate_query_policies.py)."""

import copy

import numpy as np
import pytest

from cortex_tpu.errors import CortexError
from cortex_tpu.storage import NodeFilter, SqliteStorage
from cortex_tpu.storage.memory_store import MemoryStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source

KINDS = ["fact", "event", "decision", "pattern"]
AGENTS = ["alice", "bob", "carol"]
TAGS = ["red", "green", "blue", "slow"]
RELATIONS = ["related_to", "led_to", "supersedes"]


def _mknode(rng, i):
    n = Node.new(
        rng.choice(KINDS),
        f"fuzz node {i} title with enough length",
        f"body of fuzz node {i}, long enough for validation",
        Source(agent=str(rng.choice(AGENTS))),
    )
    n.tags = list(rng.choice(TAGS, size=rng.integers(0, 3),
                             replace=False))
    n.importance = float(np.round(rng.random(), 3))
    return n


def _rand_filter(rng, now):
    f = NodeFilter()
    if rng.random() < 0.5:
        f.kinds = list(rng.choice(KINDS, size=rng.integers(1, 3),
                                  replace=False))
    if rng.random() < 0.3:
        f.tags = list(rng.choice(TAGS, size=rng.integers(1, 3),
                                 replace=False))
    if rng.random() < 0.3:
        f.tags_any = list(rng.choice(TAGS, size=rng.integers(1, 3),
                                     replace=False))
    if rng.random() < 0.3:
        f.source_agent = str(rng.choice(AGENTS))
    if rng.random() < 0.3:
        f.min_importance = float(rng.random() * 0.5)
    if rng.random() < 0.3:
        f.max_importance = float(0.5 + rng.random() * 0.5)
    if rng.random() < 0.2:
        f.include_deleted = True
    elif rng.random() < 0.2:
        f.deleted_only = True
    if rng.random() < 0.3:
        f.limit = int(rng.integers(1, 8))
        f.offset = int(rng.integers(0, 4))
    return f


def _ids(nodes):
    return sorted(n.id for n in nodes)


def _edge_ids(edges):
    return sorted(e.id for e in edges)


def _check_parity(mem, sql, rng, now, known_ids):
    # unfiltered list + distinct kinds + stats counters
    assert _ids(mem.list_nodes()) == _ids(sql.list_nodes())
    assert (sorted(mem.list_distinct_kinds())
            == sorted(sql.list_distinct_kinds()))
    ms, ss = mem.stats(), sql.stats()
    assert ms.node_count == ss.node_count
    assert ms.edge_count == ss.edge_count
    assert ms.deleted_node_count == ss.deleted_node_count
    assert ms.nodes_by_kind == ss.nodes_by_kind
    assert ms.edges_by_relation == ss.edges_by_relation
    # random filters: both id sets AND order-sensitive surfaces with
    # limit/offset must agree (keyset pagination contract)
    for _ in range(4):
        f = _rand_filter(rng, now)
        got_m, got_s = mem.list_nodes(f), sql.list_nodes(f)
        assert _ids(got_m) == _ids(got_s), vars(f)
        assert mem.count_nodes(f) == sql.count_nodes(f), vars(f)
    # edge surfaces for random nodes
    for _ in range(4):
        if not known_ids:
            break
        nid = rng.choice(known_ids)
        assert _edge_ids(mem.edges_from(nid)) == _edge_ids(
            sql.edges_from(nid))
        assert _edge_ids(mem.edges_to(nid)) == _edge_ids(
            sql.edges_to(nid))
    assert _edge_ids(mem.all_edges()) == _edge_ids(sql.all_edges())
    # node round-trip equality on a sample
    for _ in range(4):
        if not known_ids:
            break
        nid = rng.choice(known_ids)
        a, b = mem.get_node(nid), sql.get_node(nid)
        assert (a is None) == (b is None)
        if a is not None:
            assert a.kind == b.kind and a.title == b.title
            assert a.deleted == b.deleted
            assert a.access_count == b.access_count
            assert sorted(a.tags) == sorted(b.tags)
            assert abs(a.importance - b.importance) < 1e-9


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_differential_op_stream(tmp_path, seed):
    rng = np.random.default_rng(seed)
    mem = MemoryStorage()
    sql = SqliteStorage(str(tmp_path / f"fuzz{seed}.db"))
    now = 1_700_000_000.0
    known_ids, known_edges = [], []
    i = 0
    try:
        for step in range(300):
            op = rng.random()
            now += float(rng.random())
            if op < 0.30 or not known_ids:            # new node
                n = _mknode(rng, i)
                i += 1
                mem.put_node(copy.deepcopy(n))
                sql.put_node(copy.deepcopy(n))
                known_ids.append(n.id)
            elif op < 0.42:                           # update node
                nid = rng.choice(known_ids)
                cur = mem.get_node(nid)
                if cur is not None:
                    upd = copy.deepcopy(cur)
                    upd.importance = float(np.round(rng.random(), 3))
                    upd.tags = list(rng.choice(
                        TAGS, size=rng.integers(0, 3), replace=False))
                    upd.updated_at = now
                    mem.put_node(copy.deepcopy(upd))
                    sql.put_node(copy.deepcopy(upd))
            elif op < 0.52:                           # soft delete
                nid = rng.choice(known_ids)
                assert mem.delete_node(nid) == sql.delete_node(nid)
            elif op < 0.58:                           # hard delete
                nid = rng.choice(known_ids)
                assert (mem.hard_delete_node(nid)
                        == sql.hard_delete_node(nid))
            elif op < 0.62:                           # record access
                nid = rng.choice(known_ids)
                mem.record_access(nid, now=now)
                sql.record_access(nid, now=now)
            elif op < 0.80 and len(known_ids) >= 2:   # edge create
                a, b = rng.choice(known_ids, size=2, replace=False)
                e = Edge.new(a, b, rng.choice(RELATIONS),
                             float(np.round(0.1 + 0.9 * rng.random(), 3)),
                             EdgeProvenance.manual("fuzz"))
                err_m = err_s = None
                try:
                    mem.put_edge(copy.deepcopy(e))
                except CortexError as ex:
                    err_m = type(ex).__name__
                try:
                    sql.put_edge(copy.deepcopy(e))
                except CortexError as ex:
                    err_s = type(ex).__name__
                # both reject (same class) or both accept
                assert err_m == err_s, (err_m, err_s)
                if err_m is None:
                    known_edges.append(e.id)
            elif op < 0.88 and known_edges:           # edge delete
                eid = rng.choice(known_edges)
                assert mem.delete_edge(eid) == sql.delete_edge(eid)
            elif op < 0.94 and known_edges:           # atomic weight RMW
                eid = rng.choice(known_edges)
                w = float(np.round(rng.random(), 3))
                touch = bool(rng.random() < 0.5)
                assert (mem.update_edge_weight_atomic(eid, w,
                                                      touch=touch)
                        == sql.update_edge_weight_atomic(eid, w,
                                                         touch=touch))
            else:                                     # metadata KV
                k = f"k{int(rng.integers(0, 5))}"
                v = f"v{step}"
                mem.put_metadata(k, v)
                sql.put_metadata(k, v)
                assert mem.get_metadata(k) == sql.get_metadata(k)
            if step % 25 == 24:
                _check_parity(mem, sql, rng, now, known_ids)
        _check_parity(mem, sql, rng, now, known_ids)
    finally:
        sql.close()
