"""ShardedFlatIndex tests on the virtual 8-device CPU mesh: exact
parity with the single-device index, filters, removals, growth across
shard boundaries, snapshot roundtrip.
"""

import numpy as np
import pytest

from cortex_tpu.parallel import ShardedFlatIndex, build_mesh
from cortex_tpu.vector import TpuFlatIndex, VectorFilter
from cortex_tpu.vector.index import BruteForceIndex

DIM = 32


def seed(idx, n=300, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    ids = [f"n{i:04d}" for i in range(n)]
    kinds = ["fact" if i % 3 else "event" for i in range(n)]
    agents = [f"a{i % 5}" for i in range(n)]
    idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)
    return ids, vecs


@pytest.fixture
def mesh8():
    return build_mesh(8)


class TestShardedParity:
    def test_matches_single_device_exactly(self, mesh8):
        sharded = ShardedFlatIndex(DIM, mesh8)
        single = TpuFlatIndex(DIM)
        seed(sharded)
        seed(single)
        rng = np.random.default_rng(7)
        q = rng.normal(size=(6, DIM)).astype(np.float32)
        hs = sharded.search_batch(q, 10)
        h1 = single.search_batch(q, 10)
        for row_s, row_1 in zip(hs, h1):
            assert [i for i, _ in row_s] == [i for i, _ in row_1]
            np.testing.assert_allclose([s for _, s in row_s],
                                       [s for _, s in row_1], atol=1e-5)

    def test_quant_path_matches_bruteforce(self, mesh8):
        """The int8 serving scan sharded over the mesh: per-shard scan,
        ICI candidate merge, exact fp32 host re-rank — results must be
        identical to brute force (ids AND scores), with filters and
        cross-shard exclusions, on an anisotropic corpus (the geometry
        centering exists for)."""
        sharded = ShardedFlatIndex(DIM, mesh8, search_path="quant")
        bf = BruteForceIndex(DIM)
        rng = np.random.default_rng(41)
        n = 600
        common = rng.normal(size=(1, DIM)).astype(np.float32)
        common /= np.linalg.norm(common)
        vecs = common + rng.normal(size=(n, DIM)).astype(np.float32) * 0.05
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = [f"n{i:04d}" for i in range(n)]
        kinds = ["fact" if i % 3 else "event" for i in range(n)]
        agents = [f"a{i % 5}" for i in range(n)]
        sharded.insert_batch(ids[:500], vecs[:500], kinds=kinds[:500],
                             agents=agents[:500])
        for i in range(500):
            bf.insert(ids[i], vecs[i], kind=kinds[i],
                      source_agent=agents[i])
        q = common + rng.normal(size=(5, DIM)).astype(np.float32) * 0.05
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        sharded.search_batch(q, 10)        # full sync sets the mu
        # incremental tail: partial quant scatter against the stale mu
        sharded.insert_batch(ids[500:], vecs[500:], kinds=kinds[500:],
                             agents=agents[500:])
        for i in range(500, n):
            bf.insert(ids[i], vecs[i], kind=kinds[i],
                      source_agent=agents[i])
        for flt in (None,
                    VectorFilter(kinds=["fact"]),
                    VectorFilter(exclude_ids=[f"n{i:04d}"
                                              for i in range(0, n, 7)])):
            got = sharded.search_batch(q, 10, flt)
            want = bf.search_batch(q, 10, flt)
            for g, w in zip(got, want):
                assert [i for i, _ in g] == [i for i, _ in w]
                np.testing.assert_allclose([s for _, s in g],
                                           [s for _, s in w], atol=1e-5)

    def test_quant_hostbias_overflow_path(self, mesh8):
        """>64 exclusions on the quant path must fall back to the exact
        sharded host-bias scan — excluded ids never return."""
        sharded = ShardedFlatIndex(DIM, mesh8, search_path="quant")
        ids, vecs = seed(sharded, n=400)
        bf = BruteForceIndex(DIM)
        for i, v in zip(ids, vecs):
            bf.insert(i, v)
        excl = ids[::3]                     # 134 exclusions > MAX_EXCLUDE
        flt = VectorFilter(exclude_ids=excl)
        rng = np.random.default_rng(9)
        q = rng.normal(size=(4, DIM)).astype(np.float32)
        got = sharded.search_batch(q, 12, flt)
        want = bf.search_batch(q, 12, flt)
        excluded = set(excl)
        for g, w in zip(got, want):
            assert not (set(i for i, _ in g if i) & excluded)
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_matches_bruteforce_with_filters(self, mesh8):
        sharded = ShardedFlatIndex(DIM, mesh8)
        oracle = BruteForceIndex(DIM)
        ids, vecs = seed(sharded, seed=3)
        for i, nid in enumerate(ids):
            oracle.insert(nid, vecs[i],
                          kind="fact" if i % 3 else "event",
                          source_agent=f"a{i % 5}")
        rng = np.random.default_rng(9)
        q = rng.normal(size=(4, DIM)).astype(np.float32)
        flt = VectorFilter(kinds=["event"], source_agent="a0")
        hs = sharded.search_batch(q, 5, flt)
        ho = oracle.search_batch(q, 5, flt)
        for row_s, row_o in zip(hs, ho):
            got = [i for i, _ in row_s if i is not None]
            want = [i for i, _ in row_o][:len(got)]
            assert got == want

    def test_exclude_ids_cross_shard(self, mesh8):
        sharded = ShardedFlatIndex(DIM, mesh8)
        ids, vecs = seed(sharded)
        q = vecs[:3]
        hits = sharded.search_batch(
            q, 3, VectorFilter(exclude_ids=[ids[0], ids[1], ids[2]]))
        flat = [i for row in hits for i, _ in row]
        assert not ({ids[0], ids[1], ids[2]} & set(flat))

    def test_remove_and_growth(self, mesh8):
        sharded = ShardedFlatIndex(DIM, mesh8)
        ids, vecs = seed(sharded, n=100)
        assert sharded.remove(ids[5])
        hits = sharded.search_batch(vecs[5:6], 1)
        assert hits[0][0][0] != ids[5]
        # grow past the initial capacity (forces re-shard)
        rng = np.random.default_rng(11)
        more = rng.normal(size=(1200, DIM)).astype(np.float32)
        sharded.insert_batch([f"m{i}" for i in range(1200)], more)
        assert len(sharded) == 1299
        hit = sharded.search_batch(more[7:8], 1)[0][0]
        assert hit[0] == "m7"

    def test_snapshot_roundtrip(self, mesh8, tmp_path):
        sharded = ShardedFlatIndex(DIM, mesh8)
        ids, vecs = seed(sharded, n=50)
        p = str(tmp_path / "shard.npz")
        sharded.save(p)
        fresh = ShardedFlatIndex(DIM, mesh8)
        fresh.load(p)
        assert len(fresh) == 50
        hit = fresh.search_batch(vecs[9:10], 1)[0][0]
        assert hit[0] == ids[9]

    def test_sharded_kernel_actually_used(self, mesh8, monkeypatch):
        """Regression: search_batch must route through the shard_map
        kernel, not the inherited single-device dispatch."""
        import cortex_tpu.parallel.sharded_index as si
        calls = {"n": 0}
        real = si._sharded_filtered_topk

        def spy(*a, **k):
            calls["n"] += 1
            return real(*a, **k)
        monkeypatch.setattr(si, "_sharded_filtered_topk", spy)
        idx = ShardedFlatIndex(DIM, mesh8)
        ids, vecs = seed(idx, n=50)
        idx.search_batch(vecs[:2], 3)
        assert calls["n"] == 1

    def test_embedded_engine_on_sharded_index(self):
        """`[embedding] sharded = true` runs the FULL engine (store,
        search, hybrid, linker) over the mesh index."""
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.parallel.sharded_index import ShardedFlatIndex

        cfg = CortexConfig()
        cfg.embedding.model = "hash"
        cfg.embedding.sharded = True
        cx = Cortex.in_memory(cfg)
        assert isinstance(cx.index, ShardedFlatIndex)
        a = cx.store(Cortex.fact("Sharded engine stores this memory"))
        cx.store(Cortex.fact("Another memory lands on some shard"))
        hits = cx.search("sharded engine memory", limit=2)
        assert hits and hits[0][1].id == a
        res = cx.search_hybrid("memory", anchors=[a], limit=2)
        assert res
        m = cx.run_linker_cycle()
        assert m.cycle_nodes_processed == 2
        assert cx.reindex() == 2
        assert isinstance(cx.index, ShardedFlatIndex)   # survives reindex

    def test_single_device_mesh(self):
        idx = ShardedFlatIndex(DIM, build_mesh(1))
        ids, vecs = seed(idx, n=40)
        hit = idx.search_batch(vecs[3:4], 1)[0][0]
        assert hit[0] == ids[3]


class TestShardedComposedStack:
    """The FULL engine composed over the sharded index (config
    embedding.sharded on the virtual 8-device mesh): admission, gate
    conflict check, search, hybrid, and the snapshot round trip all go
    through ShardedFlatIndex."""

    def _cortex(self, tmp_path=None):
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.parallel import ShardedFlatIndex
        cfg = CortexConfig()
        cfg.embedding.sharded = True
        cx = (Cortex.open(str(tmp_path / "cortex.db"), cfg)
              if tmp_path is not None else Cortex.in_memory(cfg))
        assert isinstance(cx.index, ShardedFlatIndex)
        assert len(cx.index.mesh.devices.flatten()) == 8
        return cx

    def _node(self, i):
        from cortex_tpu.types import Node, Source
        return Node.new("fact", f"Sharded stack fact {i} topic {i % 3}",
                        f"Body long enough for the checks, entry {i}.",
                        Source(agent="t"))

    def test_store_search_hybrid_on_mesh(self):
        cx = self._cortex()
        ids = [cx.store(self._node(i)) for i in range(12)]
        hits = cx.search("sharded stack topic 1", limit=4,
                         record_access=False)
        assert len(hits) == 4
        assert all(n.id in ids for _, n in hits)
        res = cx.search_hybrid("sharded stack topic", anchors=[ids[0]],
                               limit=4)
        assert res and res[0].combined_score > 0
        # gate conflict check runs against the sharded index
        from cortex_tpu.errors import GateRejection as GateRejectionError
        import pytest as _pytest
        dup = self._node(0)
        with _pytest.raises(GateRejectionError):
            cx.store(dup, gate=True)
        cx.close()

    def test_snapshot_round_trip_sharded(self, tmp_path):
        cx = self._cortex(tmp_path)
        ids = [cx.store(self._node(i)) for i in range(6)]
        cx.close()                      # snapshot via inherited save()
        cx2 = self._cortex(tmp_path)
        assert len(cx2.index) == 6
        hits = cx2.search("sharded stack fact", limit=6,
                          record_access=False)
        assert {n.id for _, n in hits} == set(ids)
        cx2.close()
