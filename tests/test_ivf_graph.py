"""kNN-graph refinement over the IVF layout (vector/knn_graph.py).

The graph attacks IVF's measured structural miss: true top-k rows in
clusters that rank low against the query are reached through a FOUND
neighbor's edge instead of a probe. These tests pin build correctness
(nlist=1 makes within-block kNN the exact global kNN), the refinement
contract (recall can only improve; scores stay fp32-exact; filters and
dedup hold on expanded candidates), mutation semantics, and snapshot
persistence.
"""

import numpy as np
import pytest

import cortex_tpu.vector.ivf as ivfmod
from cortex_tpu.vector.index import BruteForceIndex
from cortex_tpu.vector.ivf import TpuIvfIndex
from cortex_tpu.vector import VectorFilter

DIM = 32


def clustered(n=600, noise=0.5, seed=1, dim=DIM, nc=20):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(nc, dim)).astype(np.float32)
    asg = rng.integers(0, nc, n)
    vecs = (centers[asg]
            + noise * rng.normal(size=(n, dim)).astype(np.float32))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = [f"n{i:04d}" for i in range(n)]
    return ids, vecs, rng


def brute(ids, vecs, kinds=None, agents=None):
    bf = BruteForceIndex(DIM)
    for i in range(len(ids)):
        bf.insert(ids[i], vecs[i],
                  kind=kinds[i] if kinds else None,
                  source_agent=agents[i] if agents else None)
    return bf


def recall_at10(idx, bf, q):
    got = idx.search_batch(q, 10)
    want = bf.search_batch(q, 10)
    hit = tot = 0
    for g, w in zip(got, want):
        gs = {i for i, _ in g if i}
        ws = {i for i, _ in w if i}
        hit += len(gs & ws)
        tot += len(ws)
    return hit / max(1, tot)


class TestGraphBuild:
    def test_single_cluster_graph_is_exact_knn(self):
        """nlist=1: every row shares the one block, so the built graph
        must equal the true kNN graph (int8-noise ties aside)."""
        ids, vecs, _ = clustered(n=120, nc=1, noise=1.0)
        idx = TpuIvfIndex(DIM, nlist=1, nprobe=1, graph_degree=8)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)         # sync -> _build_ivf
        co = idx._corpus
        assert co._nbrs_h is not None
        rows = np.array([co._row_of[i] for i in ids])
        inv = np.full(co._cap, -1, np.int64)
        inv[rows] = np.arange(len(ids))
        s = vecs @ vecs.T
        np.fill_diagonal(s, -2)
        true8 = np.argsort(-s, axis=1)[:, :8]
        agree = 0
        for j in range(len(ids)):
            got = set(inv[co._nbrs_h[rows[j]][co._nbrs_h[rows[j]] >= 0]])
            agree += len(got & set(true8[j])) / 8
        # int8 quantization can swap near-ties at the boundary; the
        # graph must still be essentially the true kNN graph
        assert agree / len(ids) > 0.95

    def test_spilled_rows_merge_two_lists(self):
        ids, vecs, _ = clustered(n=400, nc=8, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=8, nprobe=8, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)         # sync -> _build_ivf
        co = idx._corpus
        rows = np.array([co._row_of[i] for i in ids])
        spilled = rows[co._cluster_of2[rows] >= 0]
        assert len(spilled)                   # spill engaged
        nb = co._nbrs_h[spilled]
        # no self-edges, no duplicate edges per row
        for r, lst in zip(spilled, nb):
            vals = lst[lst >= 0]
            assert r not in vals
            assert len(vals) == len(set(vals.tolist()))

    def test_degree_zero_disables(self):
        ids, vecs, _ = clustered(n=200)
        idx = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=0)
        idx.insert_batch(ids, vecs)
        assert idx._corpus._nbrs_h is None
        assert idx.search_batch(vecs[:2], 5)   # still serves


class TestRefinement:
    def test_recall_never_worse_and_scores_exact(self):
        ids, vecs, rng = clustered(n=1200, nc=30, noise=0.6)
        q = vecs[:48] + 0.3 * rng.normal(size=(48, DIM)).astype(
            np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        bf = brute(ids, vecs)
        base = TpuIvfIndex(DIM, nlist=32, nprobe=2, graph_degree=0)
        base.insert_batch(ids, vecs)
        ref = TpuIvfIndex(DIM, nlist=32, nprobe=2, graph_degree=32)
        ref.insert_batch(ids, vecs)
        r0 = recall_at10(base, bf, q)
        r1 = recall_at10(ref, bf, q)
        assert r1 >= r0                        # refinement only adds
        assert r1 > 0.85
        # every returned score is the true fp32 cosine of its id
        got = ref.search_batch(q, 10)
        byid = {ids[i]: vecs[i] for i in range(len(ids))}
        for b, row in enumerate(got):
            for nid, sc in row:
                if nid is None:
                    continue
                assert abs(float(q[b] @ byid[nid]) - sc) < 1e-4

    def test_no_duplicate_ids_in_results(self):
        ids, vecs, rng = clustered(n=800, nc=16, noise=0.7)
        idx = TpuIvfIndex(DIM, nlist=16, nprobe=3, graph_degree=32)
        idx.insert_batch(ids, vecs)
        q = rng.normal(size=(16, DIM)).astype(np.float32)
        for row in idx.search_batch(q, 20):
            hits = [i for i, _ in row if i is not None]
            assert len(hits) == len(set(hits))

    def test_filters_hold_on_expanded_candidates(self):
        ids, vecs, rng = clustered(n=600, nc=12, noise=0.6)
        kinds = ["fact" if i % 3 else "event" for i in range(len(ids))]
        agents = [f"a{i % 4}" for i in range(len(ids))]
        idx = TpuIvfIndex(DIM, nlist=12, nprobe=2, graph_degree=32)
        idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)
        bf = brute(ids, vecs, kinds, agents)
        q = rng.normal(size=(8, DIM)).astype(np.float32)
        for flt in (VectorFilter(kinds=["fact"]),
                    VectorFilter(source_agent="a1"),
                    VectorFilter(exclude_ids=ids[::5])):
            got = idx.search_batch(q, 10, flt)
            want = bf.search_batch(q, 10, flt)
            wanted_ids = {i for row in want for i, _ in row if i}
            for row in got:
                for nid, _ in row:
                    if nid is None:
                        continue
                    # any id the exact filtered brute force would never
                    # return under ANY ranking is a filter leak
                    j = ids.index(nid)
                    if flt.kinds:
                        assert kinds[j] in flt.kinds
                    if flt.source_agent:
                        assert agents[j] == flt.source_agent
                    if flt.exclude_ids:
                        assert nid not in flt.exclude_ids

    def test_removed_node_never_surfaces_via_expansion(self):
        ids, vecs, rng = clustered(n=300, nc=6, noise=0.5)
        idx = TpuIvfIndex(DIM, nlist=6, nprobe=1, graph_degree=16)
        idx.insert_batch(ids, vecs)
        victim = ids[10]
        idx.remove(victim)
        q = vecs[8:16]                       # near the victim
        for row in idx.search_batch(q, 20):
            assert victim not in [i for i, _ in row]

    def test_update_masks_out_edges(self):
        ids, vecs, rng = clustered(n=200, nc=4, noise=0.5)
        idx = TpuIvfIndex(DIM, nlist=4, nprobe=4, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)         # sync -> _build_ivf
        co = idx._corpus
        r = co._row_of[ids[5]]
        assert (co._nbrs_h[r] >= 0).any()
        nv = rng.normal(size=(DIM,)).astype(np.float32)
        idx.insert(ids[5], nv / np.linalg.norm(nv))
        assert (co._nbrs_h[r] == -1).all()   # out-edges dropped
        # searches still serve and never crash through the stale
        # in-edges that may point at the mutated row
        assert idx.search_batch(vecs[:4], 5)


class TestLifecycle:
    def test_compact_invalidates_graph(self):
        """compact() reassigns every row — a graph keyed/valued by
        pre-compact rows must be dropped, then rebuilt, and a
        post-rebuild snapshot must not index out of bounds (the
        review-found crash: pos[stale_nbr] with old row ids)."""
        ids, vecs, _ = clustered(n=500, nc=8, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)
        for nid in ids[:300]:
            idx.remove(nid)
        idx.rebuild()                      # compact + retrain
        idx.search_batch(vecs[:1], 3)      # rebuilds layout + graph
        st = idx._corpus.state()           # must not IndexError
        if "ivf_nbrs" in st:
            assert st["ivf_nbrs"].shape[0] == len(st["ids"])
        # served results stay exact
        bf = BruteForceIndex(DIM)
        for i in range(300, 500):
            bf.insert(ids[i], vecs[i])
        got = idx.search_batch(vecs[310:314], 5)
        want = bf.search_batch(vecs[310:314], 5)
        for g, w in zip(got, want):
            assert [i for i, _ in g][:3] == [i for i, _ in w][:3]

    def test_retrain_rebuilds_graph_not_boot_copy(self, tmp_path):
        """retrain() forces a fresh k-means; the snapshot-restored
        graph must not survive it (review finding: stale _boot_nbrs
        served instead of a fresh build)."""
        ids, vecs, rng = clustered(n=300, nc=6, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)
        p = str(tmp_path / "ivf.npz")
        idx.write_snapshot(p, idx._corpus.state())
        idx2 = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=16)
        idx2.load(p)
        # mutate a row so its boot out-edges are masked, then retrain:
        # the rebuilt graph must restore edges for the mutated row
        nv = rng.normal(size=(DIM,)).astype(np.float32)
        idx2.insert(ids[5], nv / np.linalg.norm(nv))
        idx2.retrain()
        co = idx2._corpus
        assert co._nbrs_h is not None
        assert (co._nbrs_h[co._row_of[ids[5]]] >= 0).any()

    def test_background_build_swaps_in(self, monkeypatch):
        """Layouts past WARM_MIN_SLOTS build the graph off the lock on
        a background thread; searches serve unrefined until the swap."""
        import time
        monkeypatch.setattr(ivfmod, "WARM_MIN_SLOTS", 1)
        ids, vecs, _ = clustered(n=300, nc=6, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)      # triggers build (async)
        co = idx._corpus
        deadline = time.monotonic() + 30
        while co._nbrs_h is None and time.monotonic() < deadline:
            time.sleep(0.05)
        assert co._nbrs_h is not None
        assert not co._graph_inflight
        # refinement now live; results stay exact and dedup'd
        for row in idx.search_batch(vecs[:4], 10):
            hits = [i for i, _ in row if i is not None]
            assert len(hits) == len(set(hits))

    def test_background_build_masks_rows_mutated_in_flight(
            self, monkeypatch):
        import threading
        import time
        monkeypatch.setattr(ivfmod, "WARM_MIN_SLOTS", 1)
        ids, vecs, rng = clustered(n=300, nc=6, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        co = idx._corpus
        # hold the build just before its swap so the mutation lands
        # while the build is in flight
        from cortex_tpu.vector import knn_graph as kg
        orig = kg.build_knn_graph
        gate = threading.Event()

        def slow_build(*a, **k):
            out = orig(*a, **k)
            gate.wait(10)
            return out

        monkeypatch.setattr(kg, "build_knn_graph", slow_build)
        idx.search_batch(vecs[:1], 3)      # spawn (blocked at gate)
        nv = rng.normal(size=(DIM,)).astype(np.float32)
        idx.insert(ids[7], nv / np.linalg.norm(nv))   # in-flight write
        gate.set()
        deadline = time.monotonic() + 30
        while co._nbrs_h is None and time.monotonic() < deadline:
            time.sleep(0.05)
        assert co._nbrs_h is not None
        assert (co._nbrs_h[co._row_of[ids[7]]] == -1).all()


class TestPersistence:
    def test_snapshot_roundtrip_restores_graph(self, tmp_path):
        ids, vecs, _ = clustered(n=400, nc=8, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)         # sync -> _build_ivf
        st = idx._corpus.state()
        assert "ivf_nbrs" in st
        p = str(tmp_path / "ivf.npz")
        idx.write_snapshot(p, st)
        idx2 = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=16)
        idx2.load(p)
        idx2.search_batch(vecs[:2], 5)        # forces _build_ivf
        co, co2 = idx._corpus, idx2._corpus
        for nid in ids[:50]:
            a = co._nbrs_h[co._row_of[nid]]
            b = co2._nbrs_h[co2._row_of[nid]]
            # remap row ids -> node ids for comparison
            aid = {co._id_of[r] for r in a[a >= 0]}
            bid = {co2._id_of[r] for r in b[b >= 0]}
            assert aid == bid

    def test_legacy_snapshot_without_graph_rebuilds(self, tmp_path):
        ids, vecs, _ = clustered(n=300, nc=6, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=0)
        idx.insert_batch(ids, vecs)
        p = str(tmp_path / "ivf.npz")
        idx.write_snapshot(p, idx._corpus.state())
        idx2 = TpuIvfIndex(DIM, nlist=6, nprobe=2, graph_degree=16)
        idx2.load(p)
        idx2.search_batch(vecs[:2], 5)
        assert idx2._corpus._nbrs_h is not None   # rebuilt from layout


class TestSharded:
    def test_sharded_ivf_graph_builds_and_is_exact_at_full_probe(self):
        """The mesh-sharded IVF builds its graph from host layout
        copies (chunk uploads — see _graph_build_arrays). At
        nprobe=nlist the candidate set is exact, so refined results
        must equal brute force. (Exact parity with the SINGLE-device
        index at low nprobe is not the contract: the sharded path
        probes a per-shard superset.)"""
        from cortex_tpu.parallel import ShardedIvfIndex, build_mesh
        ids, vecs, rng = clustered(n=400, nc=8, noise=0.6)
        mesh = build_mesh(8)
        sh = ShardedIvfIndex(DIM, mesh, nlist=8, nprobe=8,
                             graph_degree=16)
        sh.insert_batch(ids, vecs)
        sh.search_batch(vecs[:1], 3)          # sync -> _build_ivf
        assert sh._corpus._nbrs_h is not None
        bf = brute(ids, vecs)
        q = rng.normal(size=(4, DIM)).astype(np.float32)
        got = sh.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_sharded_low_probe_recall_not_worse_than_single(self):
        from cortex_tpu.parallel import ShardedIvfIndex, build_mesh
        ids, vecs, rng = clustered(n=400, nc=8, noise=0.6)
        q = rng.normal(size=(16, DIM)).astype(np.float32)
        bf = brute(ids, vecs)
        sh = ShardedIvfIndex(DIM, build_mesh(8), nlist=8, nprobe=2,
                             graph_degree=16)
        sh.insert_batch(ids, vecs)
        si = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=16)
        si.insert_batch(ids, vecs)
        assert (recall_at10(sh, bf, q)
                >= recall_at10(si, bf, q) - 1e-9)


class TestConfigWiring:
    def test_config_key_flows_to_index(self):
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        cfg = CortexConfig()
        cfg.embedding.index = "ivf"
        cfg.embedding.ivf_graph_degree = 8
        cx = Cortex.in_memory(cfg)
        try:
            assert cx.index._corpus._graph_degree == 8
        finally:
            cx.close()

    def test_validation(self):
        from cortex_tpu.config import ConfigError, CortexConfig
        cfg = CortexConfig()
        cfg.embedding.ivf_graph_degree = -1
        with pytest.raises(ConfigError, match="ivf_graph_degree"):
            cfg.validate()


class TestRefineFlag:
    def test_refine_false_skips_expansion(self, monkeypatch):
        """Bulk scan paths (auto-linker, dedup) pass refine=False so
        graph expansion never joins their host re-rank leg — the 300k
        IVF mixed soak measured it as a 2-4 s per-cycle tax."""
        ids, vecs, _ = clustered(n=400, nc=8, noise=0.6)
        idx = TpuIvfIndex(DIM, nlist=8, nprobe=2, graph_degree=16)
        idx.insert_batch(ids, vecs)
        idx.search_batch(vecs[:1], 3)          # sync -> graph build
        assert idx._corpus._nbrs_h is not None
        calls = []
        orig = idx._corpus._expand_candidates
        monkeypatch.setattr(
            idx._corpus, "_expand_candidates",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        idx.search_batch(vecs[:2], 5)
        assert calls                            # serving path refines
        calls.clear()
        idx.search_batch(vecs[:2], 5, refine=False)
        idx.search_stream(vecs[:4], 5, refine=False)
        assert not calls

    def test_linker_and_dedup_scans_pass_refine_false(self, monkeypatch):
        """The auto-linker's candidate scan and the dedup scan both run
        unrefined against a graph-enabled index."""
        from cortex_tpu.linker.auto_linker import AutoLinker
        from cortex_tpu.linker.dedup import DedupScanner
        from cortex_tpu.storage.memory_store import MemoryStorage
        from cortex_tpu.types import Node, Source
        from cortex_tpu.vector.config import SimilarityConfig
        from cortex_tpu.vector.embedding import HashingEmbedder

        store = MemoryStorage()
        emb = HashingEmbedder(dim=DIM)
        idx = TpuIvfIndex(DIM, nlist=2, nprobe=2, graph_degree=8)
        for i in range(40):
            n = Node.new("fact", f"fact number {i}",
                         f"body text for fact {i} " * 3,
                         Source(agent="tester"))
            n.embedding = emb.embed(n.title + " " + (n.body or ""))
            store.put_node(n)
            idx.insert(n.id, np.asarray(n.embedding, np.float32),
                       kind=n.kind)
        idx.search_batch(np.zeros((1, DIM), np.float32), 3)  # build
        calls = []
        orig = idx._corpus._expand_candidates
        monkeypatch.setattr(
            idx._corpus, "_expand_candidates",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
        linker = AutoLinker(store, idx, emb)
        linker.run_cycle()
        DedupScanner(store, idx, SimilarityConfig()).scan()
        assert not calls
