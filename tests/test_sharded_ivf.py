"""ShardedIvfIndex on the 8-device virtual mesh (conftest forces CPU +
xla_force_host_platform_device_count=8).

Anchor invariant: per-shard probing with every cluster probed
(nprobe >= nlist) must reproduce the flat oracle exactly — sharding
may change throughput and candidate membership at partial probes,
never final scores (the exact fp32 re-rank is inherited)."""

import numpy as np
import pytest

from cortex_tpu.parallel import ShardedIvfIndex, build_mesh
from cortex_tpu.vector import BruteForceIndex, VectorFilter

DIM = 64


def clustered(n, dim=DIM, seed=0):
    rng = np.random.default_rng(seed)
    g = max(1, n // 8)
    centers = rng.standard_normal((g, dim)).astype(np.float32)
    return (np.repeat(centers, (n + g - 1) // g, axis=0)[:n]
            + 0.25 * rng.standard_normal((n, dim)).astype(np.float32))


@pytest.fixture(scope="module")
def mesh():
    return build_mesh(8)


def build_pair(mesh, vecs, *, nlist=0, nprobe=0, kinds=None, agents=None):
    ids = [f"n{i}" for i in range(len(vecs))]
    idx = ShardedIvfIndex(vecs.shape[1], mesh, nlist=nlist,
                          nprobe=nprobe)
    oracle = BruteForceIndex(vecs.shape[1])
    idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)
    for i, nid in enumerate(ids):
        oracle.insert(nid, vecs[i],
                      kind=kinds[i] if kinds else "",
                      source_agent=agents[i] if agents else "")
    return idx, oracle


class TestShardedIvf:
    def test_full_probe_matches_oracle(self, mesh):
        vecs = clustered(600)
        idx, oracle = build_pair(mesh, vecs, nlist=16, nprobe=16)
        q = clustered(8, seed=3)
        got = idx.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
            np.testing.assert_allclose([s for _, s in got[b]],
                                       [s for _, s in want[b]],
                                       atol=1e-5)

    def test_nlist_rounds_to_mesh_multiple(self, mesh):
        vecs = clustered(200)
        idx, _ = build_pair(mesh, vecs, nlist=3, nprobe=3)
        idx.search_batch(vecs[:1], 5)       # sync builds the layout
        c = idx._corpus._centroids_h.shape[0]
        assert c % 8 == 0 and c >= 8

    def test_partial_probe_high_recall(self, mesh):
        vecs = clustered(2000)
        idx, oracle = build_pair(mesh, vecs, nlist=32, nprobe=8)
        q = vecs[::83][:12] + 0.05 * np.random.default_rng(5) \
            .standard_normal((12, DIM)).astype(np.float32)
        got = idx.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        rec = np.mean([
            len({i for i, _ in got[b]} & {i for i, _ in want[b]}) / 10
            for b in range(len(q))])
        assert rec >= 0.9, f"recall {rec}"

    def test_filters_and_exclusions(self, mesh):
        vecs = clustered(400)
        kinds = [("fact" if i % 2 else "event") for i in range(400)]
        idx, oracle = build_pair(mesh, vecs, nlist=8, nprobe=8,
                                 kinds=kinds,
                                 agents=["a"] * 400)
        q = clustered(4, seed=9)
        flt = VectorFilter(kinds=["fact"], exclude_ids=["n1", "n3"])
        got = idx.search_batch(q, 10, flt)
        want = oracle.search_batch(q, 10, flt)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_oversized_exclusions_hostbias(self, mesh):
        vecs = clustered(300)
        idx, oracle = build_pair(mesh, vecs, nlist=8, nprobe=8)
        q = vecs[:2]
        flt = VectorFilter(exclude_ids=[f"n{i}" for i in range(80)])
        got = idx.search_batch(q, 10, flt)
        want = oracle.search_batch(q, 10, flt)
        for b in range(2):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_incremental_insert_and_remove(self, mesh):
        vecs = clustered(256)
        idx, _ = build_pair(mesh, vecs, nlist=8, nprobe=8)
        nv = clustered(1, seed=42) + 3.0
        idx.insert("fresh", nv[0])
        hits = idx.search_batch(nv, 3)[0]
        assert hits[0][0] == "fresh"
        idx.remove("fresh")
        hits = idx.search_batch(nv, 3)[0]
        assert all(i != "fresh" for i, _ in hits)

    def test_save_load_roundtrip(self, mesh, tmp_path):
        vecs = clustered(300)
        idx, _ = build_pair(mesh, vecs, nlist=8, nprobe=8)
        p = str(tmp_path / "sivf.npz")
        idx.save(p)
        fresh = ShardedIvfIndex(DIM, mesh, nlist=8, nprobe=8)
        fresh.load(p)
        assert len(fresh) == 300
        a = idx.search_batch(vecs[:2], 5)
        b = fresh.search_batch(vecs[:2], 5)
        for x, y in zip(a, b):
            assert [i for i, _ in x] == [i for i, _ in y]

    def test_per_shard_probe_is_superset_of_single_chip(self, mesh):
        """Per-shard full-nprobe probing: candidate recall must match
        or exceed the single-chip layout at the same nprobe for EVERY
        query (the probed-cluster set is a strict superset — the
        r3 review found the nprobe/n_dev split dropping queries to
        recall 0.0)."""
        from cortex_tpu.vector import TpuIvfIndex
        vecs = clustered(2000, seed=2)
        ids = [f"n{i}" for i in range(len(vecs))]
        single = TpuIvfIndex(DIM, nlist=32, nprobe=4)
        shard = ShardedIvfIndex(DIM, mesh, nlist=32, nprobe=4)
        single.insert_batch(ids, vecs)
        shard.insert_batch(ids, vecs)
        oracle = BruteForceIndex(DIM)
        for i, nid in enumerate(ids):
            oracle.insert(nid, vecs[i])
        q = vecs[::37][:24] + 0.05 * np.random.default_rng(3) \
            .standard_normal((24, DIM)).astype(np.float32)
        gs = single.search_batch(q, 10)
        gh = shard.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            truth = {i for i, _ in want[b]}
            r_single = len({i for i, _ in gs[b]} & truth) / 10
            r_shard = len({i for i, _ in gh[b]} & truth) / 10
            assert r_shard >= r_single - 1e-9, \
                f"query {b}: sharded {r_shard} < single {r_single}"

    def test_engine_selects_sharded_ivf(self):
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        cfg = CortexConfig()
        cfg.embedding.index = "ivf"
        cfg.embedding.sharded = True
        cfg.validate()                      # no longer rejected
        cx = Cortex.in_memory(cfg)
        assert isinstance(cx.index, ShardedIvfIndex)
        nid = cx.store(Cortex.decision(
            "Sharded IVF integration check",
            "The mesh-sharded clustered index serves this search."))
        hits = cx.search("mesh sharded clustered", limit=3)
        assert any(n.id == nid for _, n in hits)
        cx.close()
