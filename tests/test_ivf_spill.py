"""IVF spill packing (SOAR-style boundary-row duplication, r3).

The r3 10M measurement showed IVF recall FLAT in nprobe: misses are
true neighbors whose home cluster ranks low against the query. Spill
packing duplicates boundary rows (smallest first-vs-second centroid
margin) into their second-choice cluster's slack slots — zero extra
HBM — so those rows get a second chance to be probed. These tests pin:

  * no duplicate ids ever surface (device-side _dedup_rows);
  * full probing still reproduces the flat oracle exactly;
  * recall at small nprobe does not regress (and improves on
    boundary-heavy corpora);
  * mutation (delete/update) drops spill copies;
  * snapshots persist spill hints and boots restore them;
  * the sharded layout dedups across shards.

Reference contrast: HNSW (index.rs:104-163) has no analog — its graph
links serve the same "escape a bad partition" role natively.
"""

import numpy as np

from cortex_tpu.vector import BruteForceIndex, TpuIvfIndex, VectorFilter
from cortex_tpu.vector.ivf import IvfCorpus

DIM = 64


def clustered(n, dim=DIM, *, groups=None, seed=0):
    rng = np.random.default_rng(seed)
    g = groups or max(1, n // 8)
    centers = rng.standard_normal((g, dim)).astype(np.float32)
    v = (np.repeat(centers, (n + g - 1) // g, axis=0)[:n]
         + 0.25 * rng.standard_normal((n, dim)).astype(np.float32))
    return v


def build(vecs, *, nlist, nprobe, spill):
    ids = [f"n{i}" for i in range(len(vecs))]
    ivf = TpuIvfIndex(vecs.shape[1], nlist=nlist, nprobe=nprobe,
                      spill=spill)
    ivf.insert_batch(ids, vecs)
    return ivf


def oracle_for(vecs):
    oracle = BruteForceIndex(vecs.shape[1])
    for i in range(len(vecs)):
        oracle.insert(f"n{i}", vecs[i], kind="", source_agent="")
    return oracle


def recall(hits, truth):
    got = {i for i, _ in hits}
    want = {i for i, _ in truth}
    return len(got & want) / max(1, len(want))


class TestSpillBuild:
    def test_spill_slots_are_consistent(self):
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=4, spill=1.0)
        co = ivf._corpus
        co.sync()
        spilled = np.where(co._cluster_of2 >= 0)[0]
        assert len(spilled) > 0, "slack exists, spill must happen"
        slot_rows = np.asarray(co._ivf_dev[3])
        for r in spilled:
            c2, s2 = co._cluster_of2[r], co._slot_of2[r]
            assert c2 != co._cluster_of[r], "spill must differ from home"
            assert slot_rows[c2, s2] == r, "spill slot must hold the row"

    def test_spill_zero_disables(self):
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=4, spill=0.0)
        co = ivf._corpus
        co.sync()
        assert (co._cluster_of2 < 0).all()

    def test_reserve_slots_survive_for_inserts(self):
        # spill must not consume ALL slack: incremental inserts still
        # find room without forcing a rebuild
        vecs = clustered(512)
        ivf = build(vecs, nlist=8, nprobe=8, spill=1.0)
        co = ivf._corpus
        co.sync()
        assert co._free_slots() > 0
        nv = clustered(1, seed=42) + 3.0
        ivf.insert("fresh", nv[0])
        hits = ivf.search_batch(nv, 3)[0]
        assert hits[0][0] == "fresh"


class TestNoDuplicates:
    def test_full_probe_returns_unique_ids_and_matches_oracle(self):
        # nprobe = nlist probes BOTH copies of every spilled row — the
        # device dedup is what keeps the final list duplicate-free
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=16, spill=1.0)
        oracle = oracle_for(vecs)
        q = clustered(8, seed=3)
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            ids = [i for i, _ in got[b] if i is not None]
            assert len(ids) == len(set(ids)), f"duplicate ids: {ids}"
            assert ids == [i for i, _ in want[b]]

    def test_partial_probe_unique_ids(self):
        vecs = clustered(800)
        ivf = build(vecs, nlist=16, nprobe=6, spill=1.0)
        q = vecs[::53][:8]
        for hits in ivf.search_batch(q, 10):
            ids = [i for i, _ in hits if i is not None]
            assert len(ids) == len(set(ids))

    def test_filters_with_spill(self):
        vecs = clustered(400)
        kinds = [("fact" if i % 2 else "event") for i in range(400)]
        ids = [f"n{i}" for i in range(400)]
        ivf = TpuIvfIndex(DIM, nlist=8, nprobe=8, spill=1.0)
        ivf.insert_batch(ids, vecs, kinds=kinds)
        oracle = BruteForceIndex(DIM)
        for i in range(400):
            oracle.insert(ids[i], vecs[i], kind=kinds[i],
                          source_agent="")
        q = clustered(4, seed=9)
        flt = VectorFilter(kinds=["fact"])
        got = ivf.search_batch(q, 10, flt)
        want = oracle.search_batch(q, 10, flt)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]


class TestSpillRecall:
    def test_recall_no_worse_than_unspilled(self):
        vecs = clustered(2000, groups=100)
        q = vecs[::97][:16] + 0.05 * np.random.default_rng(7) \
            .standard_normal((16, DIM)).astype(np.float32)
        oracle = oracle_for(vecs)
        want = oracle.search_batch(q, 10)
        r = {}
        for spill in (0.0, 1.0):
            ivf = build(vecs, nlist=32, nprobe=3, spill=spill)
            got = ivf.search_batch(q, 10)
            r[spill] = np.mean([recall(got[b], want[b])
                                for b in range(len(q))])
        assert r[1.0] >= r[0.0], f"spill regressed recall: {r}"


class TestSpillMutation:
    def test_delete_removes_both_copies(self):
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=16, spill=1.0)
        co = ivf._corpus
        co.sync()
        spilled = np.where(co._cluster_of2 >= 0)[0]
        assert len(spilled)
        victim_row = int(spilled[0])
        victim = co._id_of[victim_row]
        ivf.remove(victim)
        q = vecs[victim_row:victim_row + 1]
        hits = ivf.search_batch(q, 10)[0]
        assert victim not in {i for i, _ in hits}
        assert co._cluster_of2[victim_row] == -1

    def test_update_drops_stale_spill_copy(self):
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=16, spill=1.0)
        co = ivf._corpus
        co.sync()
        spilled = np.where(co._cluster_of2 >= 0)[0]
        victim_row = int(spilled[0])
        victim = co._id_of[victim_row]
        old_c2, old_s2 = (int(co._cluster_of2[victim_row]),
                          int(co._slot_of2[victim_row]))
        nv = -vecs[victim_row]                # flip direction
        ivf.insert(victim, nv)                # update in place
        co.sync()
        assert co._cluster_of2[victim_row] == -1
        slot_rows = np.asarray(co._ivf_dev[3])
        assert slot_rows[old_c2, old_s2] != victim_row \
            or co._cluster_of[victim_row] == old_c2
        # the updated vector must be found at its new position
        hits = ivf.search_batch(nv[None, :], 3)[0]
        assert hits[0][0] == victim


class TestSpillSnapshot:
    def test_roundtrip_restores_spill(self, tmp_path):
        vecs = clustered(600)
        ivf = build(vecs, nlist=16, nprobe=4, spill=1.0)
        co = ivf._corpus
        co.sync()
        n_spill = int((co._cluster_of2 >= 0).sum())
        assert n_spill > 0
        path = str(tmp_path / "ivf.npz")
        ivf.save(path)
        fresh = TpuIvfIndex(DIM, nlist=16, nprobe=4, spill=1.0)
        fresh.load(path)
        fresh._corpus.sync()
        restored = int((fresh._corpus._cluster_of2 >= 0).sum())
        assert restored > 0, "boot must restore spill hints"
        # parity: restored index answers like the original
        q = clustered(8, seed=3)
        got = fresh.search_batch(q, 10)
        want = ivf.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_legacy_snapshot_without_spill_key_loads(self, tmp_path):
        # simulate an r3-era snapshot: drop the ivf_cluster2 key
        vecs = clustered(300)
        ivf = build(vecs, nlist=8, nprobe=8, spill=1.0)
        ivf._corpus.sync()                    # train before saving
        path = str(tmp_path / "ivf.npz")
        ivf.save(path)
        z = dict(np.load(path, allow_pickle=False))
        z.pop("ivf_cluster2")
        np.savez(path, **z)
        fresh = TpuIvfIndex(DIM, nlist=8, nprobe=8, spill=1.0)
        fresh.load(path)
        q = clustered(4, seed=3)
        hits = fresh.search_batch(q, 5)
        assert all(len([i for i, _ in h if i is not None]) == 5
                   for h in hits)


class TestShardedSpill:
    def test_sharded_dedup_and_oracle_parity(self):
        from cortex_tpu.parallel.sharded_ivf import ShardedIvfIndex
        vecs = clustered(600)
        ids = [f"n{i}" for i in range(600)]
        ivf = ShardedIvfIndex(DIM, nlist=16, nprobe=16, spill=1.0)
        ivf.insert_batch(ids, vecs)
        oracle = oracle_for(vecs)
        q = clustered(8, seed=3)
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            got_ids = [i for i, _ in got[b] if i is not None]
            assert len(got_ids) == len(set(got_ids))
            assert got_ids == [i for i, _ in want[b]]
