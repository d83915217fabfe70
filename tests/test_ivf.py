"""TpuIvfIndex / IvfCorpus — the sublinear (clustered) index.

Correctness frame: IVF's only approximation is candidate MEMBERSHIP
(a true top-k row whose cluster was not probed). Final scores are
fp32-exact (inherited host re-rank), and probing ALL clusters
(nprobe = nlist) must reproduce the flat-scan oracle exactly — that
invariant anchors most tests here."""

import os

import numpy as np
import pytest

from cortex_tpu.vector import BruteForceIndex, TpuIvfIndex, VectorFilter
from cortex_tpu.vector.ivf import IvfCorpus

DIM = 64


def clustered(n, dim=DIM, *, groups=None, seed=0):
    """Clustered corpus (~8 members per center) — the similarity
    structure IVF exploits; iid gaussian has none."""
    rng = np.random.default_rng(seed)
    g = groups or max(1, n // 8)
    centers = rng.standard_normal((g, dim)).astype(np.float32)
    v = (np.repeat(centers, (n + g - 1) // g, axis=0)[:n]
         + 0.25 * rng.standard_normal((n, dim)).astype(np.float32))
    return v


def build_pair(vecs, *, nlist=0, nprobe=0, kinds=None, agents=None):
    ids = [f"n{i}" for i in range(len(vecs))]
    ivf = TpuIvfIndex(vecs.shape[1], nlist=nlist, nprobe=nprobe)
    oracle = BruteForceIndex(vecs.shape[1])
    ivf.insert_batch(ids, vecs, kinds=kinds, agents=agents)
    for i, nid in enumerate(ids):
        oracle.insert(nid, vecs[i],
                      kind=kinds[i] if kinds else "",
                      source_agent=agents[i] if agents else "")
    return ivf, oracle


def recall(hits, truth):
    got = {i for i, _ in hits}
    want = {i for i, _ in truth}
    return len(got & want) / max(1, len(want))


class TestExactWhenFullyProbed:
    def test_nprobe_equals_nlist_matches_oracle(self):
        vecs = clustered(600)
        ivf, oracle = build_pair(vecs, nlist=16, nprobe=16)
        q = clustered(8, seed=3)
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
            np.testing.assert_allclose([s for _, s in got[b]],
                                       [s for _, s in want[b]],
                                       atol=1e-5)

    def test_scores_are_exact_cosines_even_partially_probed(self):
        vecs = clustered(600)
        ivf, oracle = build_pair(vecs, nlist=16, nprobe=4)
        q = clustered(4, seed=5)
        want = {i: s for hits in oracle.search_batch(q, 600)
                for i, s in hits}
        for b, hits in enumerate(ivf.search_batch(q, 10)):
            for nid, s in hits:
                ref = oracle.search_batch(q[b:b + 1], 600)[0]
                ref_s = dict(ref)[nid]
                assert abs(s - ref_s) < 1e-5


class TestRecall:
    def test_clustered_corpus_high_recall_at_default_probe(self):
        vecs = clustered(2000, groups=100)
        ivf, oracle = build_pair(vecs, nlist=32, nprobe=8)
        q = vecs[::97][:16] + 0.05 * np.random.default_rng(7) \
            .standard_normal((16, DIM)).astype(np.float32)
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        r = np.mean([recall(got[b], want[b]) for b in range(len(q))])
        assert r >= 0.9, f"recall {r}"


class TestFilters:
    def test_kind_and_agent_filters(self):
        vecs = clustered(400)
        kinds = [("fact" if i % 2 else "event") for i in range(400)]
        agents = [f"a{i % 3}" for i in range(400)]
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8,
                                 kinds=kinds, agents=agents)
        q = clustered(4, seed=9)
        flt = VectorFilter(kinds=["fact"], source_agent="a1")
        got = ivf.search_batch(q, 10, flt)
        want = oracle.search_batch(q, 10, flt)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_exclusion(self):
        vecs = clustered(300)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        q = vecs[:2]
        flt = VectorFilter(exclude_ids=["n0", "n1", "n5"])
        got = ivf.search_batch(q, 10, flt)
        for hits in got:
            assert not {"n0", "n1", "n5"} & {i for i, _ in hits}

    def test_oversized_filter_lists_use_exact_host_bias(self):
        vecs = clustered(300)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        q = vecs[:2]
        # > MAX_EXCLUDE (64) exclusions forces the host-bias kernel
        excl = [f"n{i}" for i in range(80)]
        flt = VectorFilter(exclude_ids=excl)
        got = ivf.search_batch(q, 10, flt)
        want = oracle.search_batch(q, 10, flt)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]


class TestMutation:
    def test_incremental_insert_is_searchable(self):
        vecs = clustered(256)
        ivf, _ = build_pair(vecs, nlist=8, nprobe=8)
        nv = clustered(1, seed=42) + 3.0       # distinctive direction
        ivf.insert("fresh", nv[0])
        hits = ivf.search_batch(nv, 3)[0]
        assert hits[0][0] == "fresh"

    def test_remove_then_reinsert_slot_reuse(self):
        """A slot vacated and re-taken in the SAME dirty batch must
        end up holding the new row (scatter dedupe, last-wins)."""
        vecs = clustered(128)
        ivf, _ = build_pair(vecs, nlist=2, nprobe=2)
        ivf.remove("n7")
        nv = vecs[7] + 0.01
        ivf.insert("taken", nv)                # same region -> same slot
        hits = ivf.search_batch(nv[None, :], 5)[0]
        got = [i for i, _ in hits]
        assert "taken" in got and "n7" not in got

    def test_update_in_place(self):
        vecs = clustered(128)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        moved = -vecs[3]
        ivf.insert("n3", moved)                # overwrite
        hits = ivf.search_batch(moved[None, :], 1)[0]
        assert hits[0][0] == "n3"

    def test_bulk_churn_triggers_rebuild_and_stays_consistent(self):
        vecs = clustered(512)
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        v2 = clustered(512, seed=11)
        ids = [f"n{i}" for i in range(512)]
        ivf.insert_batch(ids, v2)              # all dirty -> rebuild
        for i, nid in enumerate(ids):
            oracle.insert(nid, v2[i])
        q = v2[:4]
        got = ivf.search_batch(q, 5)
        want = oracle.search_batch(q, 5)
        for b in range(4):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_growth_retrains(self):
        vecs = clustered(100)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf.search_batch(vecs[:1], 1)          # sync builds the layout
        assert ivf._corpus._trained_live == 100
        more = clustered(400, seed=21)
        ids = [f"m{i}" for i in range(400)]
        ivf.insert_batch(ids, more)
        ivf.search_batch(more[:1], 5)          # sync happens on search
        assert ivf._corpus._trained_live == 500


class TestLifecycle:
    def test_compact_rebuilds(self):
        vecs = clustered(200)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        for i in range(0, 200, 2):
            ivf.remove(f"n{i}")
        ivf.rebuild()
        hits = ivf.search_batch(vecs[1][None, :], 3)[0]
        assert hits[0][0] == "n1"
        assert len(ivf) == 100

    def test_save_load_roundtrip(self, tmp_path):
        vecs = clustered(300)
        ivf, _ = build_pair(vecs, nlist=8, nprobe=8)
        p = str(tmp_path / "ivf.npz")
        ivf.save(p)
        fresh = TpuIvfIndex(DIM, nlist=8, nprobe=8)
        fresh.load(p)
        assert len(fresh) == 300
        q = vecs[:2]
        a = ivf.search_batch(q, 5)
        b = fresh.search_batch(q, 5)
        for x, y in zip(a, b):
            assert [i for i, _ in x] == [i for i, _ in y]

    def test_retrain_api(self):
        vecs = clustered(200)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        ivf.retrain()
        hits = ivf.search_batch(vecs[:1], 3)[0]
        assert hits[0][0] == "n0"

    def test_search_stream_matches_batch(self):
        """topk_stream (inherited single-drain bulk path, used by the
        auto-linker) must agree with search_batch on the IVF layout."""
        vecs = clustered(400)
        ivf, _ = build_pair(vecs, nlist=8, nprobe=8)
        q = clustered(20, seed=13)
        a = ivf.search_stream(q, 5, batch=8)
        b = ivf.search_batch(q, 5)
        for x, y in zip(a, b):
            assert [i for i, _ in x] == [i for i, _ in y]

    def test_empty_and_tiny(self):
        ivf = TpuIvfIndex(DIM)
        assert ivf.search_batch(np.zeros((1, DIM), np.float32), 5) == [[]]
        ivf.insert("only", np.ones(DIM, np.float32))
        hits = ivf.search_batch(np.ones((1, DIM), np.float32), 5)[0]
        assert hits[0][0] == "only"


class TestEngineIntegration:
    def test_cortex_with_ivf_index(self):
        from cortex_tpu.api import Cortex
        from cortex_tpu.config import CortexConfig
        cfg = CortexConfig()
        cfg.embedding.index = "ivf"
        cfg.embedding.ivf_nlist = 4
        cfg.embedding.ivf_nprobe = 4
        cx = Cortex.in_memory(cfg)
        assert isinstance(cx.index, TpuIvfIndex)
        nid = cx.store(Cortex.decision(
            "IVF integration fact",
            "The clustered index serves this search."))
        hits = cx.search("clustered index serves", limit=3)
        assert any(n.id == nid for _, n in hits)
        cx.close()

    def test_config_validation(self):
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.errors import ConfigError
        cfg = CortexConfig()
        cfg.embedding.index = "hnsw"
        with pytest.raises(ConfigError):
            cfg.validate()

    # ivf+sharded was rejected for one commit; it is now a supported
    # combination — see tests/test_sharded_ivf.py


class TestQueryChunking:
    """The in-kernel probed-block gather materializes [B, p, L, d]
    before scoring — at 10M rows x default nprobe that is ~1.3 GB PER
    QUERY, so batch dispatches are lax.map-chunked to stay under
    GATHER_BUDGET_BYTES (the r3 OOM). A tiny budget must force the
    chunked trace and reproduce the fused form bit-for-bit."""

    def _clear(self):
        from cortex_tpu.vector import ivf as ivf_mod
        ivf_mod._ivf_search.clear_cache()
        ivf_mod._ivf_search_hostbias.clear_cache()

    def test_chunked_matches_fused(self, monkeypatch):
        from cortex_tpu.vector import ivf as ivf_mod
        vecs = clustered(500, dim=48)         # shape unique to this test
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        q = clustered(7, dim=48, seed=5)
        want = ivf.search_batch(q, 10)        # fused trace
        excl = [f"n{i}" for i in range(80)]   # > MAX_EXCLUDE: hostbias
        flt = VectorFilter(exclude_ids=excl)
        want_hb = ivf.search_batch(q, 10, flt)
        monkeypatch.setattr(ivf_mod, "GATHER_BUDGET_BYTES", 1)
        self._clear()                         # budget is read at trace
        try:
            got = ivf.search_batch(q, 10)
            got_hb = ivf.search_batch(q, 10, flt)
            for b in range(len(q)):
                assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
                np.testing.assert_allclose(
                    [s for _, s in got[b]], [s for _, s in want[b]],
                    atol=1e-6)
                assert ([i for i, _ in got_hb[b]]
                        == [i for i, _ in want_hb[b]])
        finally:
            monkeypatch.undo()
            self._clear()                     # drop the budget-1 traces


class TestShapeStableRebuilds:
    def test_shape_bucket_is_idempotent_and_coarse(self):
        for v in [1, 8, 17, 100, 548, 568, 712, 744, 1020, 3162, 8192]:
            b = IvfCorpus._shape_bucket(v)
            assert b >= v
            assert IvfCorpus._shape_bucket(b) == b      # stable rung
            assert b <= v + max(8, v // 8)              # bounded pad
        # the soak's observed pair: both sizes land on the same rungs
        assert (IvfCorpus._shape_bucket(548)
                == IvfCorpus._shape_bucket(568) == 576)
        assert (IvfCorpus._shape_bucket(712)
                == IvfCorpus._shape_bucket(744) == 768)

    def test_rebuild_after_modest_growth_keeps_layout_shape(self):
        """A placement-full rebuild at a ~10%-grown corpus must land
        on the SAME [C, L, d] shape — the shape is a static parameter
        of every compiled search program, and a mid-serving shape
        change recompiles the whole family (measured: ~80 s p95 stall
        through a tunneled device)."""
        vecs = clustered(300, dim=48)
        ivf, _ = build_pair(vecs, nlist=0, nprobe=8)
        ivf._corpus.sync()
        shape0 = tuple(ivf._corpus._ivf_dev[1].shape)
        extra = clustered(30, dim=48, seed=4) + 1.0     # +10%
        ivf.insert_batch([f"x{i}" for i in range(30)], extra)
        ivf.retrain()                                   # full rebuild
        assert tuple(ivf._corpus._ivf_dev[1].shape) == shape0


class TestSlotGrowth:
    def test_placement_full_grows_slots_instead_of_rebuilding(self):
        """Exhausting every slot must pad the slot axis IN HBM
        (assignments kept, no retrain/re-upload) and keep results
        exact — the old full-rebuild fallback re-uploaded the whole
        layout (~20-30 s through a tunneled device, measured as the
        residual p99 event in the IVF mixed-workload soak)."""
        vecs = clustered(200, dim=48)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()                    # trained at 200 rows
        co = ivf._corpus
        l0, trained0 = co._slot_cap, co._trained_live
        rng = np.random.default_rng(9)
        extra = rng.standard_normal((100, 48)).astype(np.float32)
        ids = [f"g{i}" for i in range(100)]   # overfills the reserve
        ivf.insert_batch(ids, extra)
        for i, nid in enumerate(ids):
            oracle.insert(nid, extra[i], kind="", source_agent="")
        q = np.concatenate([extra[:4], clustered(4, dim=48, seed=2)])
        got = ivf.search_batch(q, 10)         # sync -> growth path
        want = oracle.search_batch(q, 10)
        assert co._trained_live == trained0   # NO rebuild happened
        assert co._slot_cap > l0              # the slot axis grew
        assert co._slot_cap == co._ivf_dev[1].shape[1]
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_pad_meta_axis_matches_build_meta(self):
        """Grown meta slots must carry the exact empty-slot encoding
        _build_meta writes (the Pallas kernel reads these planes)."""
        import jax.numpy as jnp

        from cortex_tpu.vector.ivf import _pad_meta_axis
        co = IvfCorpus(16)
        c, l, pad = 3, 8, 8
        rng = np.random.default_rng(0)
        rinv = rng.random((c, l)).astype(np.float32)
        rows = rng.integers(-1, 50, (c, l)).astype(np.int32)
        kinds = rng.integers(0, 4, (c, l)).astype(np.int32)
        agents = rng.integers(0, 4, (c, l)).astype(np.int32)
        grown = np.asarray(_pad_meta_axis(
            jnp.asarray(co._build_meta(rinv, rows, kinds, agents)),
            pad=pad))
        from cortex_tpu.vector.shard import PAD_CODE
        want = co._build_meta(
            np.concatenate([rinv, np.zeros((c, pad), np.float32)], 1),
            np.concatenate([rows, np.full((c, pad), -1, np.int32)], 1),
            np.concatenate([kinds,
                            np.full((c, pad), PAD_CODE, np.int32)], 1),
            np.concatenate([agents,
                            np.full((c, pad), PAD_CODE, np.int32)], 1))
        np.testing.assert_array_equal(grown, want)

    def test_warm_next_slot_programs_counts(self, monkeypatch):
        from cortex_tpu.vector import ivf as ivf_mod
        monkeypatch.setattr(ivf_mod, "WARM_MIN_SLOTS", 1)
        vecs = clustered(200, dim=48)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        ivf.search_batch(clustered(2, dim=48, seed=1), 5)  # log entry
        n = ivf._corpus.warm_next_slot_programs()
        assert n >= 2                         # search recipe + pads


class TestScatterWarmAndChunking:
    def test_warm_scatter_buckets_is_shape_only(self, monkeypatch):
        from cortex_tpu.vector import ivf as ivf_mod
        monkeypatch.setattr(ivf_mod, "WARM_MIN_SLOTS", 1)
        vecs = clustered(200, dim=48)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        co = ivf._corpus
        before = co._ivf_dev
        spill_before = (co._cluster_of2 >= 0).sum()
        assert co.warm_scatter_buckets()
        assert co._ivf_dev is before          # no state mutated
        assert (co._cluster_of2 >= 0).sum() == spill_before
        assert co._scatter_warmed == tuple(before[1].shape)
        # untrained corpus: warm declines
        assert not IvfCorpus(8).warm_scatter_buckets()

    def test_warm_declines_below_slot_threshold(self):
        vecs = clustered(200, dim=48)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()                    # tiny layout
        assert not ivf._corpus.warm_scatter_buckets()
        assert ivf._corpus.warm_next_slot_programs() == 0

    def test_large_dirty_waves_chunk_and_stay_exact(self, monkeypatch):
        """A dirty wave larger than MAX_SCATTER_ROWS splits into
        bounded scatters; results must still track the oracle."""
        from cortex_tpu.vector import ivf as ivf_mod
        monkeypatch.setattr(ivf_mod, "MAX_SCATTER_ROWS", 16)
        vecs = clustered(400, dim=48)
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        ivf._corpus.sync()                    # trained
        rng = np.random.default_rng(5)
        upd = rng.standard_normal((60, 48)).astype(np.float32)
        ids = [f"n{i}" for i in range(60)]    # 60 dirty > 16 bound
        ivf.insert_batch(ids, upd)
        for i, nid in enumerate(ids):
            oracle.insert(nid, upd[i], kind="", source_agent="")
        q = np.concatenate([upd[:4], clustered(4, dim=48, seed=6)])
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]


class TestSnapshotBoot:
    """Snapshots persist the trained clustering (centroids + per-id
    cluster) so a restored index boots WITHOUT re-running k-means +
    the full assignment pass (~90 s at 10M rows). Legacy snapshots
    without the extra keys still load and retrain."""

    def _no_kmeans(self, monkeypatch):
        from cortex_tpu.vector import ivf as ivf_mod

        def boom(*a, **k):
            raise AssertionError("k-means ran on a restored boot")
        monkeypatch.setattr(ivf_mod, "_kmeans_device", boom)

    def test_restore_skips_kmeans_and_matches(self, tmp_path,
                                              monkeypatch):
        vecs = clustered(400, dim=48)
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        ivf._corpus.sync()                    # train now
        path = str(tmp_path / "idx.npz")
        ivf.save(path)
        cent_saved = ivf._corpus._centroids_h.copy()

        fresh = TpuIvfIndex(48, nlist=8, nprobe=8)
        fresh.load(path)
        self._no_kmeans(monkeypatch)          # must not retrain
        q = clustered(5, dim=48, seed=3)
        got = fresh.search_batch(q, 10)       # triggers the boot build
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
        np.testing.assert_allclose(fresh._corpus._centroids_h,
                                   cent_saved)

    def test_delta_rows_assigned_without_retrain(self, tmp_path,
                                                 monkeypatch):
        vecs = clustered(320, dim=48)
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        ivf._corpus.sync()
        path = str(tmp_path / "idx.npz")
        ivf.save(path)

        fresh = TpuIvfIndex(48, nlist=8, nprobe=8)
        fresh.load(path)
        self._no_kmeans(monkeypatch)
        extra = clustered(6, dim=48, seed=9) + 2.0
        for i, v in enumerate(extra):         # post-load rows: no hint
            fresh.insert(f"x{i}", v)
            oracle.insert(f"x{i}", v, kind="", source_agent="")
        got = fresh.search_batch(extra[:2], 8)
        want = oracle.search_batch(extra[:2], 8)
        for b in range(2):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_legacy_snapshot_retrains(self, tmp_path):
        from cortex_tpu.vector.index import TpuFlatIndex
        vecs = clustered(200, dim=48)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        path = str(tmp_path / "legacy.npz")
        # write WITHOUT the ivf keys (the pre-boot-hint format)
        TpuFlatIndex.write_snapshot(ivf, path, ivf._corpus.state())
        fresh = TpuIvfIndex(48, nlist=4, nprobe=4)
        fresh.load(path)                      # no keys -> retrain path
        q = clustered(3, dim=48, seed=2)
        got = fresh.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_retrain_discards_boot_hints(self, tmp_path):
        vecs = clustered(200, dim=48)
        ivf, _ = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        path = str(tmp_path / "idx.npz")
        ivf.save(path)
        fresh = TpuIvfIndex(48, nlist=4, nprobe=4)
        fresh.load(path)
        fresh.retrain()                       # explicit: real k-means
        assert fresh._corpus._boot_cent is None
        assert fresh._corpus._centroids_h is not None

    def test_boot_hint_rows_past_cap_are_masked(self, tmp_path,
                                                monkeypatch):
        """Rows inserted after load can GROW the corpus past the boot
        array's cap (e.g. a boot-time delta replay) — they must be
        assigned fresh, not indexed out of bounds."""
        vecs = clustered(96, dim=48)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        path = str(tmp_path / "idx.npz")
        ivf.save(path)

        fresh = TpuIvfIndex(48, nlist=4, nprobe=4)
        fresh.load(path)
        self._no_kmeans(monkeypatch)
        # overflow the restored cap so new rows land past len(boot)
        cap0 = fresh._corpus._cap
        extra = clustered(cap0, dim=48, seed=7) + 1.5
        for i, v in enumerate(extra):
            fresh.insert(f"g{i}", v)
            oracle.insert(f"g{i}", v, kind="", source_agent="")
        assert fresh._corpus._cap > cap0
        got = fresh.search_batch(extra[:2], 8)    # boot build w/ growth
        want = oracle.search_batch(extra[:2], 8)
        for b in range(2):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]

    def test_delta_mutated_rows_recluster(self, tmp_path, monkeypatch):
        """A boot delta that UPDATES a row's vector — or REUSES a freed
        row for a brand-new node — must drop that row's snapshot hint:
        packing it into the OLD vector's cluster would make it
        unfindable at normal nprobe (recall loss concentrated on
        exactly the freshest writes, and a stable-size corpus never
        drift-retrains it away)."""
        import json as _json
        vecs = clustered(320, dim=48)
        ivf, _ = build_pair(vecs, nlist=8, nprobe=8)
        ivf._corpus.sync()
        base = str(tmp_path / "base.npz")
        ivf.save(base)

        # nprobe=1: a mis-clustered row is only found if its hint was
        # dropped and it re-assigned against its NEW vector
        fresh = TpuIvfIndex(48, nlist=8, nprobe=1)
        fresh.load(base)
        self._no_kmeans(monkeypatch)
        # delta 1: n0 moves to its antipode (update); n1 is removed
        new0 = -vecs[0]
        d1 = str(tmp_path / "d1.npz")
        np.savez(d1, vectors=new0[None],
                 meta=_json.dumps({"dim": 48, "ids": ["n0"],
                                   "kinds": [""], "agents": [""],
                                   "removed": ["n1"]}))
        fresh.apply_delta(d1)
        # delta 2: a new node reuses n1's freed row, far from n1's
        # old cluster
        new_z = -vecs[1]
        d2 = str(tmp_path / "d2.npz")
        np.savez(d2, vectors=new_z[None],
                 meta=_json.dumps({"dim": 48, "ids": ["z0"],
                                   "kinds": [""], "agents": [""],
                                   "removed": []}))
        row_n1 = None
        with fresh._corpus._lock:
            # capture where z0 will land (top of the free list = n1's
            # just-freed row) to assert the reuse actually happened
            row_n1 = fresh._corpus._free[-1]
        fresh.apply_delta(d2)
        assert fresh._corpus._row_of["z0"] == row_n1
        got0 = fresh.search_batch(new0[None], 1)  # boot build here
        assert got0[0][0][0] == "n0"
        got_z = fresh.search_batch(new_z[None], 5)
        ids_z = [i for i, _ in got_z[0]]
        assert ids_z[0] == "z0"
        assert "n1" not in ids_z                  # removed stays gone

    def test_snapshot_base_stale_forces_one_base_rewrite(self):
        """An on-disk base written BEFORE training carries no
        clustering; once trained, the index reports the base stale so
        the checkpoint layer rewrites it (then deltas resume)."""
        vecs = clustered(120, dim=48)
        ivf = TpuIvfIndex(48, nlist=4, nprobe=4)
        st = ivf._corpus.state()              # untrained capture
        assert "ivf_centroids" not in st
        assert not ivf.snapshot_base_stale()  # untrained: nothing lost
        ivf.insert_batch([f"n{i}" for i in range(len(vecs))], vecs)
        ivf._corpus.sync()                    # trains
        # the only base ever written predates training
        assert ivf.snapshot_base_stale()

    def test_base_rewrite_clears_stale_and_boots_fast(self, tmp_path,
                                                      monkeypatch):
        vecs = clustered(160, dim=48)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf._corpus.sync()
        path = str(tmp_path / "idx.npz")
        ivf.save(path)                        # trained base with keys
        assert not ivf.snapshot_base_stale()
        fresh = TpuIvfIndex(48, nlist=4, nprobe=4)
        fresh.load(path)
        assert not fresh.snapshot_base_stale()
        self._no_kmeans(monkeypatch)
        got = fresh.search_batch(clustered(2, dim=48, seed=5), 6)
        want = oracle.search_batch(clustered(2, dim=48, seed=5), 6)
        assert [i for i, _ in got[0]] == [i for i, _ in want[0]]


class TestBenchScriptRunnable:
    """The scale bench calls the engine's jitted search functions
    directly (it builds its own layout to reach 10M rows without the
    index bookkeeping), so an engine signature change can strand it
    without any suite failure — exactly what happened when the
    spill-dedup static was added (`dedup` became required and the
    bench's r3 10M/1M runs predated it). A tiny end-to-end CPU run
    keeps the script honest."""

    def test_ivf_scale_bench_tiny_cpu(self):
        import json as _json
        import subprocess
        import sys
        out = subprocess.run(
            [sys.executable, "benches/ivf_scale_bench.py",
             "--rows", "2000", "--cpu"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(
                __file__))))
        assert out.returncode == 0, out.stdout + out.stderr
        lines = [_json.loads(ln) for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        metrics = {m["metric"] for m in lines}
        assert any("batch 64" in m for m in metrics), metrics
        rec = [m for m in lines
               if m["metric"].startswith("ivf candidate recall")]
        assert rec and all(r["value"] > 0.5
                           for r in rec
                           if "in-distribution" in r["metric"]), rec

    def test_ivf_scale_bench_graph_hops_cpu(self):
        """--graph-degree + --hops: refined recall is reported per hop
        and never decreases across hops (refinement is set-additive)."""
        import json as _json
        import subprocess
        import sys
        out = subprocess.run(
            [sys.executable, "benches/ivf_scale_bench.py",
             "--rows", "2000", "--cpu", "--graph-degree", "8",
             "--hops", "2"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(
                __file__))))
        assert out.returncode == 0, out.stdout + out.stderr
        lines = [_json.loads(ln) for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        ref = [m for m in lines
               if m["metric"].startswith("ivf refined recall")]
        assert any("hop 2" in m["metric"] for m in ref), ref
        for fam in ("in-distribution", "iid-gaussian"):
            for e in (16, 32, 64):
                seq = [m["value"] for m in ref
                       if f"({fam}, frontier {e}," in m["metric"]]
                assert seq == sorted(seq), (fam, e, seq)
