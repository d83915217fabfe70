"""Model-based consistency fuzz: random store/update/delete/search
interleavings against a trivial oracle (a dict of live nodes). After
every batch of operations the engine must agree EXACTLY with the
oracle: same live set in storage, same membership in the vector index,
searches never return dead or unknown ids.

Complements the targeted soaks — this explores operation orders nobody
thought to write a test for.
"""

import random

import pytest

from cortex_tpu.api import Cortex
from cortex_tpu.types import Node, Source


def run_fuzz(seed: int, ops: int = 200) -> None:
    rng = random.Random(seed)
    cx = Cortex.in_memory()
    live = {}          # id -> title   (the oracle)
    counter = 0

    for step in range(ops):
        r = rng.random()
        if r < 0.45 or not live:
            counter += 1
            n = Node.new("fact",
                         f"Fuzz node {counter} flavor {counter % 7}",
                         f"Body long enough for checks, entry {counter}.",
                         Source(agent=f"a{counter % 3}"))
            cx.store(n)
            live[n.id] = n.title
        elif r < 0.60:
            nid = rng.choice(list(live))
            n = cx.get_node(nid)
            n.body = f"Updated body long enough, step {step}."
            cx.update_node(n)
        elif r < 0.80:
            nid = rng.choice(list(live))
            hard = rng.random() < 0.5
            assert cx.delete_node(nid, hard=hard)
            del live[nid]
        else:
            hits = cx.search(f"fuzz node flavor {step % 7}", limit=8,
                             record_access=False)
            for _, n in hits:
                assert n.id in live, "search returned a dead node"

        if step % 25 == 24:
            stored = {n.id for n in cx.list_nodes() if not n.deleted}
            assert stored == set(live)
            assert len(cx.index) == len(live)
            for nid in live:
                assert nid in cx.index
    # final exact agreement
    stored = {n.id for n in cx.list_nodes() if not n.deleted}
    assert stored == set(live)
    assert len(cx.index) == len(live)
    cx.close()


@pytest.mark.parametrize("seed", [7, 99, 2026])
def test_model_fuzz(seed):
    run_fuzz(seed)


def run_graph_fuzz(seed: int, ops: int = 150) -> None:
    """Random edge create/delete + node delete against an oracle
    adjacency; the engine's neighbors/reachable must agree exactly
    (exercises cache invalidation under churn)."""
    from cortex_tpu.graph import BOTH, GraphEngine, OUTGOING
    from cortex_tpu.storage import MemoryStorage
    from cortex_tpu.types import Edge, EdgeProvenance

    rng = random.Random(seed)
    s = MemoryStorage()
    g = GraphEngine(s)
    nodes = []
    for i in range(12):
        n = Node.new("fact", f"Graph fuzz node number {i}",
                     "Body long enough for validation checks.",
                     Source(agent="t"))
        s.put_node(n)
        nodes.append(n.id)
    out = {nid: set() for nid in nodes}      # oracle adjacency
    edges = {}                               # (from, to) -> edge_id

    def oracle_reachable(a, b, max_hops):
        seen, frontier = {a}, [a]
        for _ in range(max_hops):
            nxt = []
            for u in frontier:
                for v in out.get(u, ()):
                    if v not in seen:
                        seen.add(v)
                        nxt.append(v)
            frontier = nxt
        return b in seen

    for step in range(ops):
        r = rng.random()
        a, b = rng.sample(nodes, 2)
        if r < 0.55:
            if (a, b) not in edges:
                e = Edge.new(a, b, "related_to", 0.8,
                             EdgeProvenance.manual("t"))
                s.put_edge(e)
                g.invalidate()
                edges[(a, b)] = e.id
                out[a].add(b)
        elif r < 0.75 and edges:
            key = rng.choice(list(edges))
            s.delete_edge(edges.pop(key))
            g.invalidate()
            out[key[0]].discard(key[1])
        else:
            got = set(g.neighbors(a, OUTGOING))
            assert got == out[a], f"step {step}: {got} != {out[a]}"
            hops = rng.randint(1, 4)
            assert g.reachable(a, b, max_depth=hops) \
                == oracle_reachable(a, b, hops), (step, a, b, hops)

    for nid in nodes:
        assert set(g.neighbors(nid, OUTGOING)) == out[nid]


@pytest.mark.parametrize("seed", [11, 400, 9090])
def test_graph_fuzz(seed):
    run_graph_fuzz(seed)


def run_dsl_fuzz(seed: int, queries: int = 60) -> None:
    """Random compilable DSL queries vs a hand-written predicate over
    the same corpus — compile + storage filtering must agree exactly."""
    from cortex_tpu.query.dsl import parse_and_compile
    from cortex_tpu.storage import MemoryStorage

    rng = random.Random(seed)
    s = MemoryStorage()
    kinds = ["fact", "event", "decision", "pattern"]
    agents = ["kai", "mia", "rex"]
    tags = ["alpha", "beta", "gamma"]
    corpus = []
    for i in range(40):
        n = Node.new(rng.choice(kinds), f"Dsl fuzz node number {i}",
                     "Body long enough for validation checks.",
                     Source(agent=rng.choice(agents)),
                     round(rng.random(), 2))
        n.tags = rng.sample(tags, rng.randint(0, 2))
        s.put_node(n)
        corpus.append(n)

    for _ in range(queries):
        clauses, preds = [], []
        kind = rng.choice(kinds)
        clauses.append(f"kind:{kind}")
        preds.append(lambda n, k=kind: n.kind == k)
        if rng.random() < 0.5:
            ag = rng.choice(agents)
            clauses.append(f"agent:{ag}")
            preds.append(lambda n, a=ag: n.source.agent == a)
        if rng.random() < 0.5:
            thr = round(rng.random(), 2)
            clauses.append(f"importance>={thr}")
            preds.append(lambda n, t=thr: n.importance >= t)
        if rng.random() < 0.4:
            tg = rng.choice(tags)
            clauses.append(f"tags:{tg}")
            preds.append(lambda n, t=tg: t in n.tags)
        q = " AND ".join(clauses)
        got = {n.id for n in s.list_nodes(parse_and_compile(q))}
        want = {n.id for n in corpus if all(p(n) for p in preds)}
        assert got == want, (q, got ^ want)


@pytest.mark.parametrize("seed", [5, 77, 1234])
def test_dsl_fuzz(seed):
    run_dsl_fuzz(seed)


def run_decay_fuzz(seed: int) -> None:
    """Device decay_sweep vs the host implementation vs a scalar
    oracle on random inputs — all three must agree bitwise-closely."""
    import numpy as np
    import jax.numpy as jnp
    from cortex_tpu.ops.decay import decay_sweep, decay_sweep_host

    rng = np.random.default_rng(seed)
    n = 257                      # odd size: no tiling alignment luck
    w = rng.uniform(0, 1, n).astype(np.float32)
    days = rng.uniform(0, 400, n).astype(np.float32)
    imp = rng.uniform(0, 1, n).astype(np.float32)
    ex = rng.random(n) < 0.3
    rate, shield, delete_t, prune_t = 0.01, 0.8, 0.05, 0.1

    hw, hd, hp, hc = decay_sweep_host(w, days, imp, ex, rate, shield,
                                      delete_t, prune_t)
    dw, dd, dp, dc = decay_sweep(
        jnp.asarray(w), jnp.asarray(days), jnp.asarray(imp),
        jnp.asarray(ex), jnp.float32(rate), jnp.float32(shield),
        jnp.float32(delete_t), jnp.float32(prune_t))
    np.testing.assert_allclose(np.asarray(dw), hw, rtol=1e-5, atol=1e-6)
    assert (np.asarray(dd) == hd).all()
    assert (np.asarray(dp) == hp).all()
    assert (np.asarray(dc) == hc).all()

    # scalar oracle spot checks (decay.rs:21-101 semantics)
    for i in rng.integers(0, n, 24):
        if ex[i]:
            assert hw[i] == w[i] and not hd[i]
        else:
            eff = rate * (1.0 - imp[i] * shield)
            expect = w[i] * np.exp(-eff * days[i])
            assert abs(hw[i] - expect) < 1e-4
            assert bool(hd[i]) == (expect < delete_t)


@pytest.mark.parametrize("seed", [3, 42, 777])
def test_decay_fuzz(seed):
    run_decay_fuzz(seed)


def run_filter_fuzz(seed: int, queries: int = 30) -> None:
    """Random kind/agent/exclusion filter combos through the REAL
    device corpus vs a numpy oracle — the returned top-k must exactly
    match brute force over the allowed subset (no filter leakage, no
    silent truncation, including above the fixed-shape mask limits)."""
    import numpy as np
    from cortex_tpu.vector.index import TpuFlatIndex, VectorFilter

    rng = np.random.default_rng(seed)
    n, d, k = 300, 32, 5
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    kinds = [f"kind{i % 23}" for i in range(n)]     # >16 distinct kinds
    agents = [f"agent{i % 5}" for i in range(n)]
    ids = [f"n{i}" for i in range(n)]
    idx = TpuFlatIndex(dim=d)
    idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)

    for _ in range(queries):
        q = rng.normal(size=d).astype(np.float32)
        q /= np.linalg.norm(q)
        f_kinds = (list(rng.choice(sorted(set(kinds)),
                                   rng.integers(1, 20), replace=False))
                   if rng.random() < 0.7 else None)
        f_agent = (f"agent{rng.integers(0, 5)}"
                   if rng.random() < 0.4 else None)
        n_excl = int(rng.integers(0, 90))           # can exceed 64
        f_excl = list(rng.choice(ids, n_excl, replace=False))
        flt = VectorFilter(kinds=f_kinds, source_agent=f_agent,
                           exclude_ids=f_excl)
        hits = idx.search(q, k, flt)

        allowed = [i for i in range(n)
                   if (f_kinds is None or kinds[i] in f_kinds)
                   and (f_agent is None or agents[i] == f_agent)
                   and ids[i] not in set(f_excl)]
        scores = vecs[allowed] @ q if allowed else np.zeros(0)
        want = [ids[allowed[j]]
                for j in np.argsort(-scores)[:k]]
        got = [h[0] for h in hits if h[0] is not None]
        assert got == want, (f_kinds, f_agent, n_excl, got, want)


@pytest.mark.parametrize("seed", [13, 500])
def test_filter_fuzz(seed):
    run_filter_fuzz(seed)


def run_linker_fuzz(seed: int, n_nodes: int = 60) -> None:
    """Auto-linker cycles over random corpora must uphold the structural
    invariants whatever the content: no self-edges, no duplicate
    (from, to, relation) triples, per-node auto-edge cap respected,
    every auto edge carries a non-manual provenance and a weight in
    [0, 1], and a second cycle with no new nodes creates nothing."""
    from test_linker import build_linker

    rng = random.Random(seed)
    words = ["kubernetes", "postgres", "deploy", "cache", "alert",
             "pipeline", "rollback", "quota", "shard", "vector"]
    linker, s, idx, emb = build_linker()
    for i in range(n_nodes):
        title = " ".join(rng.sample(words, rng.randint(2, 4))).capitalize()
        n = Node.new(rng.choice(["fact", "event", "observation"]),
                     f"{title} number {i}",
                     " ".join(rng.sample(words, 5)) + " body text.",
                     Source(agent=f"a{rng.randint(0, 2)}",
                            session=f"s{rng.randint(0, 3)}"))
        n.tags = rng.sample(words, rng.randint(0, 3))
        s.put_node(n)

    # drain: the per-cycle edge cap (2000) can split the backlog
    # across cycles (auto_linker.rs:283-304 behavior)
    processed = 0
    # per-cycle cap check: the engine enforces the cap BETWEEN nodes,
    # so a cycle may overshoot by at most one node's worth of edges
    # (auto_linker.py checks len(proposed) >= cap before each node)
    slack = linker.config.max_edges_per_node
    for _ in range(20):
        m = linker.run_cycle()
        assert m.cycle_edges_created \
            <= linker.config.max_edges_per_cycle + slack
        processed += m.cycle_nodes_processed
        if m.cycle_nodes_processed == 0:
            break
    edges = s.all_edges()
    assert processed == n_nodes
    seen_triples = set()
    per_node_auto = {}
    for e in edges:
        assert e.from_id != e.to_id, "self-edge"
        t = (e.from_id, e.to_id, e.relation)
        assert t not in seen_triples, f"duplicate {t}"
        seen_triples.add(t)
        assert 0.0 <= e.weight <= 1.0
        assert not e.provenance.is_manual
        per_node_auto[e.from_id] = per_node_auto.get(e.from_id, 0) + 1
    cap = linker.config.max_edges_per_node
    assert all(c <= cap for c in per_node_auto.values()), \
        max(per_node_auto.values())

    m2 = linker.run_cycle()
    assert m2.cycle_nodes_processed == 0
    assert m2.cycle_edges_created == 0
    assert len(s.all_edges()) == len(edges)      # drained: stable


@pytest.mark.parametrize("seed", [6, 606])
def test_linker_fuzz(seed):
    run_linker_fuzz(seed)
