"""Regression tests for the batched decay persist (r5).

The r4 sweep computed on device at 20.9 B edges/s, then persisted via a
per-edge autocommit loop — measured 934 s for one sweep at 20.8M edges
(BASELINE r4 'Hybrid soak at 10M'). These tests pin the fix:

  - SqliteStorage.decay_scan: columnar JOIN scan matches the object
    path (weights, timestamps, max endpoint importance, manual flag)
  - SqliteStorage.apply_decay_results: ONE commit per call, bulk
    deletes audited, weight updates leave updated_at alone
  - DecayEngine.apply_decay end-to-end: same outcome as the semantic
    (object/per-edge) reference, with a bounded commit count
"""

import time

import numpy as np
import pytest

from cortex_tpu.linker.config import DecayConfig
from cortex_tpu.linker.decay import DecayEngine
from cortex_tpu.storage.memory_store import MemoryStorage
from cortex_tpu.storage.sqlite_store import SqliteStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


#: one shared reference instant so two stores built seconds apart get
#: bit-identical decay geometry (ages are relative to _BASE, and the
#: parity test sweeps with now=_BASE)
_BASE = time.time()


def _mk_store(cls, n_nodes=40, n_edges=120, *, days_old=30.0, seed=7):
    rng = np.random.default_rng(seed)
    store = cls()
    now = _BASE
    nodes = []
    for i in range(n_nodes):
        node = Node.new(kind="fact", title=f"n{i}", body=f"body {i}",
                           source=Source(agent="t"),
                           importance=float(rng.uniform(0, 1)))
        store.put_node(node)
        nodes.append(node)
    edges = []
    for i in range(n_edges):
        a, b = rng.choice(n_nodes, size=2, replace=False)
        prov = (EdgeProvenance.manual("t") if i % 7 == 0
                else EdgeProvenance.auto_similarity(0.9))
        e = Edge.new(from_id=nodes[a].id, to_id=nodes[b].id,
                        relation="relates_to",
                        weight=float(rng.uniform(0.02, 1.0)),
                        provenance=prov)
        age = float(rng.uniform(0, days_old))
        e.updated_at = now - age * 86400.0
        try:
            store.put_edge(e)
            edges.append(e)
        except Exception:
            pass
    return store, edges


@pytest.mark.parametrize("prefetch", [False, True, None])
def test_decay_scan_matches_object_path(prefetch):
    store, edges = _mk_store(SqliteStorage)
    chunks = list(store.decay_scan(chunk=50, prefetch=prefetch))
    assert len(chunks) >= 2  # pagination exercised
    ids = [i for c in chunks for i in c[0]]
    w = np.concatenate([c[1] for c in chunks])
    upd = np.concatenate([c[2] for c in chunks])
    imp = np.concatenate([c[3] for c in chunks])
    manual = np.concatenate([c[4] for c in chunks])
    by_id = {e.id: e for e in store.all_edges()}
    assert set(ids) == set(by_id)
    for k, eid in enumerate(ids):
        e = by_id[eid]
        assert w[k] == pytest.approx(e.weight, rel=1e-6)
        assert upd[k] == pytest.approx(e.updated_at, abs=1e-3)
        nf = store.get_node(e.from_id)
        nt = store.get_node(e.to_id)
        assert imp[k] == pytest.approx(
            max(nf.importance, nt.importance), rel=1e-6)
        assert bool(manual[k]) == e.provenance.is_manual


class _CommitCounter:
    """sqlite3.Connection attributes are read-only; count commits via a
    delegating proxy swapped into store._db."""

    def __init__(self, db):
        self._real = db
        self.commits = 0

    def commit(self):
        self.commits += 1
        return self._real.commit()

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_apply_decay_results_single_commit_and_audit():
    store, edges = _mk_store(SqliteStorage)
    live = store.all_edges()
    updates = [(e.id, 0.5) for e in live[:40]]
    deletes = [e.id for e in live[40:50]]
    before_upd = {e.id: e.updated_at for e in live[:40]}
    proxy = _CommitCounter(store._db)
    store._db = proxy
    try:
        updated, deleted = store.apply_decay_results(
            iter(updates), iter(deletes), actor="decay")
    finally:
        store._db = proxy._real
    assert proxy.commits == 1
    assert updated == 40
    assert deleted == 10
    for eid, _ in updates:
        e = store.get_edge(eid)
        assert e.weight == pytest.approx(0.5)
        # decay writes must not touch updated_at (decay clock runs on)
        assert e.updated_at == pytest.approx(before_upd[eid], abs=1e-3)
    for eid in deletes:
        assert store.get_edge(eid) is None
    audits = store.query_audit(action="edge_deleted", limit=100)
    assert {a.target_id for a in audits} >= set(deletes)
    # idempotent re-apply: already-deleted rows don't recount
    updated2, deleted2 = store.apply_decay_results([], deletes)
    assert deleted2 == 0


def _engine_outcome(store_cls):
    store, _ = _mk_store(store_cls, seed=11)
    cfg = DecayConfig(daily_decay_rate=0.05, delete_threshold=0.2,
                      prune_threshold=0.4, importance_shield=0.5)
    eng = DecayEngine(store, cfg)
    pruned, deleted = eng.apply_decay(_BASE)
    weights = sorted(round(e.weight, 5) for e in store.all_edges())
    return pruned, deleted, weights


def test_engine_sqlite_matches_memory_semantics():
    """The sqlite bulk path and the memory (default per-edge) path
    compute identical sweeps from identical seeds."""
    p1, d1, w1 = _engine_outcome(SqliteStorage)
    p2, d2, w2 = _engine_outcome(MemoryStorage)
    assert (p1, d1) == (p2, d2)
    assert w1 == w2
    assert d1 > 0 and p1 > 0  # the fixture actually exercises both


def test_engine_commit_count_bounded():
    """End-to-end sweep persist must be O(chunks) commits, not O(E)."""
    store, _ = _mk_store(SqliteStorage, n_nodes=60, n_edges=400, seed=3)
    eng = DecayEngine(store, DecayConfig(daily_decay_rate=0.05,
                                         delete_threshold=0.2))
    proxy = _CommitCounter(store._db)
    store._db = proxy
    try:
        eng.apply_decay()
    finally:
        store._db = proxy._real
    # one chunk here → one bulk-apply commit (plus nothing else)
    assert proxy.commits == 1


def test_idle_cycles_still_reach_decay():
    """r5 regression: idle cycles must advance the schedule clock.
    Before the fix, an empty scan returned without bumping
    cycle_count, so once the count parked on a non-multiple of
    decay_every_n_cycles an idle server never decayed old edges."""
    from cortex_tpu.linker.auto_linker import AutoLinker
    from cortex_tpu.linker.config import AutoLinkerConfig

    store, _ = _mk_store(SqliteStorage, n_nodes=6, n_edges=10, seed=5)
    cfg = AutoLinkerConfig()
    cfg.decay_every_n_cycles = 4
    cfg.decay.daily_decay_rate = 0.2
    cfg.decay.exempt_manual = False

    from cortex_tpu.vector import HashingEmbedder, TpuFlatIndex

    embedder = HashingEmbedder(dim=64)
    index = TpuFlatIndex(dim=64)
    linker = AutoLinker(store, index, embedder, cfg)
    # drain the initial backlog so subsequent cycles are idle
    for _ in range(30):
        linker.run_cycle()
        if linker.metrics.backlog_size == 0 and \
                linker.cycle_count % cfg.decay_every_n_cycles != 0:
            break
    w_before = {e.id: e.weight for e in store.all_edges()}
    # now ONLY idle cycles; decay must still become due and apply
    for _ in range(cfg.decay_every_n_cycles + 1):
        linker.run_cycle(now=time.time() + 30 * 86400)
    w_after = {e.id: e.weight for e in store.all_edges()}
    decayed = [eid for eid, w in w_after.items()
               if eid in w_before and w < w_before[eid] - 1e-6]
    deleted = set(w_before) - set(w_after)
    assert decayed or deleted, \
        "idle cycles never reached a decay-due cycle"


def test_reads_not_blocked_by_bulk_persist(tmp_path):
    """r5: point reads ride the dedicated read-only WAL connection, so
    a multi-second bulk write transaction (the decay persist at scale)
    must not stall them — the r4 soak measured in-window search p50s
    of 49-86 s queued behind exactly this."""
    import threading

    db = str(tmp_path / "ro.db")
    store = SqliteStorage(db)
    n = Node.new("fact", "read latency probe", "a probe body",
                 Source(agent="t"))
    store.put_node(n)
    nodes = [n]
    for i in range(400):
        m = Node.new("fact", f"filler {i}", f"filler body {i}",
                     Source(agent="t"))
        store.put_node(m)
        nodes.append(m)
    edges = []
    for i in range(4000):
        e = Edge.new(nodes[i % 400].id, nodes[(i * 7 + 1) % 400].id,
                     f"rel{i}" if False else "related_to", 0.5,
                     EdgeProvenance.imported("t"))
        e.id = f"e{i:08d}"
        edges.append((e.id, e.from_id, e.to_id, f"r{i}", 0.5,
                      '{"kind": "imported", "source": "t"}',
                      e.created_at, e.updated_at))
    store.bulk_insert_edge_rows(edges)

    started = threading.Event()
    release = threading.Event()

    real_executemany = store._db.executemany

    def slow_executemany(q, rows):
        cur = real_executemany(q, rows)
        if q.startswith("UPDATE edges"):
            started.set()
            release.wait(10.0)   # hold the write txn open ~seconds
        return cur

    class _Slow:
        def __init__(self, db):
            self._real = db

        def executemany(self, q, rows):
            return slow_executemany(q, rows)

        def __getattr__(self, name):
            return getattr(self._real, name)

    store._db = _Slow(store._db)
    t = threading.Thread(
        target=lambda: store.apply_decay_results(
            [(eid, 0.4) for eid, *_ in edges], []),
        daemon=True)
    t.start()
    assert started.wait(5.0), "bulk persist never started"
    t0 = time.perf_counter()
    got = store.get_node(n.id)
    dt = time.perf_counter() - t0
    release.set()
    t.join(10.0)
    assert got is not None and got.title == "read latency probe"
    assert dt < 1.0, f"read stalled {dt:.1f}s behind the write txn"
    store._db = store._db._real
    store.close()


def test_subprocess_decay_worker(tmp_path):
    """Maintenance isolation (r5): a full sweep runs in its own OS
    process against the same sqlite file and reports counts; the
    outcome matches the inline engine on an identical twin store."""
    db = str(tmp_path / "w.db")
    store, _ = _mk_store(lambda: SqliteStorage(db), seed=21)
    cfg = DecayConfig(daily_decay_rate=0.05, delete_threshold=0.2,
                      prune_threshold=0.4, importance_shield=0.5)
    eng = DecayEngine(store, cfg)
    pruned, deleted = eng.apply_decay_isolated(db, _BASE,
                                               timeout_s=180.0)
    w_sub = sorted(round(e.weight, 5) for e in store.all_edges())
    store.close()

    db2 = str(tmp_path / "i.db")
    store2, _ = _mk_store(lambda: SqliteStorage(db2), seed=21)
    eng2 = DecayEngine(store2, cfg)
    p2, d2 = eng2.apply_decay(_BASE)
    w_inl = sorted(round(e.weight, 5) for e in store2.all_edges())
    store2.close()
    assert (pruned, deleted) == (p2, d2)
    assert w_sub == w_inl


def test_linker_routes_decay_to_subprocess(tmp_path, monkeypatch):
    """File-backed stores route decay through the worker; a worker
    failure falls back inline (the cycle never silently skips)."""
    from cortex_tpu.linker.auto_linker import AutoLinker
    from cortex_tpu.linker.config import AutoLinkerConfig
    from cortex_tpu.vector import HashingEmbedder, TpuFlatIndex

    db = str(tmp_path / "route.db")
    store, _ = _mk_store(lambda: SqliteStorage(db), n_nodes=6,
                         n_edges=10, seed=5)
    cfg = AutoLinkerConfig()
    cfg.decay_every_n_cycles = 1
    cfg.decay.exempt_manual = False
    linker = AutoLinker(store, TpuFlatIndex(dim=64),
                        HashingEmbedder(dim=64), cfg)
    calls = {"isolated": 0, "inline": 0}
    real_inline = linker.decay_engine.apply_decay

    def fake_isolated(db_path, now=None, **kw):
        calls["isolated"] += 1
        assert db_path == db
        return (0, 0)

    monkeypatch.setattr(linker.decay_engine, "apply_decay_isolated",
                        fake_isolated)
    linker.run_cycle()
    assert calls["isolated"] == 1

    def broken_isolated(db_path, now=None, **kw):
        calls["isolated"] += 1
        raise RuntimeError("worker exploded")

    def counting_inline(now=None):
        calls["inline"] += 1
        return real_inline(now)

    monkeypatch.setattr(linker.decay_engine, "apply_decay_isolated",
                        broken_isolated)
    monkeypatch.setattr(linker.decay_engine, "apply_decay",
                        counting_inline)
    linker.run_cycle()
    assert calls["inline"] == 1, "no inline fallback on worker failure"
    store.close()
