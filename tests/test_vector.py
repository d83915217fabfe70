"""Vector layer: index parity vs brute force, filters, persistence, decay."""

import numpy as np
import pytest

from cortex_tpu.errors import ConfigError, IndexError_
from cortex_tpu.types import Node, Source
from cortex_tpu.vector import (BruteForceIndex, HashingEmbedder,
                               ScoreDecayConfig, SimilarityConfig,
                               TpuFlatIndex, VectorFilter,
                               apply_score_decay, apply_score_decay_batch,
                               embedding_input)

DIM = 32


def rand_vecs(n, seed=0):
    return np.random.default_rng(seed).normal(size=(n, DIM)).astype(np.float32)


@pytest.fixture
def filled():
    """TpuFlatIndex + BruteForceIndex with identical contents."""
    tpu = TpuFlatIndex(DIM)
    bf = BruteForceIndex(DIM)
    vecs = rand_vecs(100)
    kinds = ["fact" if i % 2 == 0 else "event" for i in range(100)]
    agents = ["alice" if i % 3 == 0 else "bob" for i in range(100)]
    for i in range(100):
        for idx in (tpu, bf):
            idx.insert(f"n{i}", vecs[i], kind=kinds[i], source_agent=agents[i])
    return tpu, bf, vecs


class TestIndexParity:
    def test_topk_matches_bruteforce(self, filled):
        tpu, bf, vecs = filled
        q = rand_vecs(3, seed=9)
        for b in range(3):
            t = tpu.search(q[b], 10)
            r = bf.search(q[b], 10)
            assert [i for i, _ in t] == [i for i, _ in r]
            np.testing.assert_allclose([s for _, s in t], [s for _, s in r],
                                       atol=1e-5)

    def test_kind_filter(self, filled):
        tpu, bf, _ = filled
        q = rand_vecs(1, seed=10)[0]
        flt = VectorFilter(kinds=["fact"])
        hits = tpu.search(q, 20, flt)
        assert hits and all(int(i[1:]) % 2 == 0 for i, _ in hits)
        assert [i for i, _ in hits] == [i for i, _ in bf.search(q, 20, flt)]

    def test_agent_filter(self, filled):
        tpu, _, _ = filled
        q = rand_vecs(1, seed=11)[0]
        hits = tpu.search(q, 50, VectorFilter(source_agent="alice"))
        assert hits and all(int(i[1:]) % 3 == 0 for i, _ in hits)

    def test_exclude_ids(self, filled):
        tpu, _, vecs = filled
        hits = tpu.search(vecs[5], 5, VectorFilter(exclude_ids=["n5"]))
        assert "n5" not in [i for i, _ in hits]

    def test_self_top1(self, filled):
        tpu, _, vecs = filled
        hits = tpu.search(vecs[7], 1)
        assert hits[0][0] == "n7"
        assert hits[0][1] == pytest.approx(1.0, abs=1e-5)

    def test_remove(self, filled):
        tpu, _, vecs = filled
        assert tpu.remove("n7")
        assert not tpu.remove("n7")
        assert "n7" not in tpu
        hits = tpu.search(vecs[7], 3)
        assert "n7" not in [i for i, _ in hits]
        assert len(tpu) == 99

    def test_update_in_place(self, filled):
        tpu, _, vecs = filled
        tpu.insert("n3", vecs[50], kind="fact", source_agent="alice")
        assert len(tpu) == 100
        hits = tpu.search(vecs[50], 2)
        assert "n3" in [i for i, _ in hits]

    def test_search_threshold(self, filled):
        tpu, _, vecs = filled
        hits = tpu.search_threshold(vecs[0], 0.99)
        assert [i for i, _ in hits] == ["n0"]
        all_hits = tpu.search_threshold(vecs[0], -1.0)
        assert len(all_hits) == 100

    def test_growth_beyond_min_cap(self):
        tpu = TpuFlatIndex(8)
        vecs = np.random.default_rng(1).normal(size=(3000, 8)).astype(np.float32)
        tpu.insert_batch([f"x{i}" for i in range(3000)], vecs)
        assert len(tpu) == 3000
        hits = tpu.search(vecs[2500], 1)
        assert hits[0][0] == "x2500"

    def test_dim_mismatch(self):
        tpu = TpuFlatIndex(8)
        with pytest.raises(IndexError_):
            tpu.insert("a", np.zeros(9, np.float32))

    def test_empty_search(self):
        tpu = TpuFlatIndex(8)
        assert tpu.search(np.ones(8, np.float32), 5) == []

    def test_rebuild_compacts(self, filled):
        tpu, _, vecs = filled
        for i in range(0, 50):
            tpu.remove(f"n{i}")
        tpu.rebuild()
        assert len(tpu) == 50
        hits = tpu.search(vecs[75], 1)
        assert hits[0][0] == "n75"

    def test_search_stream_matches_search_batch(self, filled):
        """Single-drain stream == per-batch results, chunk-boundary
        and tail-padding cases included (batch=16 over 37 queries)."""
        tpu, _, _ = filled
        q = rand_vecs(37, seed=21)
        want = tpu.search_batch(q, 10)
        got = tpu.search_stream(q, 10, batch=16)
        assert len(got) == 37
        for w, g in zip(want, got):
            assert [i for i, _ in w] == [i for i, _ in g]
            np.testing.assert_allclose([s for _, s in w],
                                       [s for _, s in g], atol=1e-5)

    def test_search_stream_filters(self, filled):
        tpu, bf, _ = filled
        q = rand_vecs(5, seed=22)
        flt = VectorFilter(kinds=["fact"], exclude_ids=["n0", "n2"])
        got = tpu.search_stream(q, 8, flt, batch=4)
        for b in range(5):
            want = bf.search(q[b], 8, flt)
            assert [i for i, _ in got[b]] == [i for i, _ in want]

    def test_search_stream_empty_and_single(self):
        tpu = TpuFlatIndex(8)
        assert tpu.search_stream(np.zeros((0, 8), np.float32), 5) == []
        got = tpu.search_stream(np.ones((3, 8), np.float32), 5)
        assert got == [[], [], []]
        tpu.insert("only", np.ones(8, np.float32))
        got = tpu.search_stream(np.ones((2, 8), np.float32), 5)
        assert [i for i, _ in got[0]] == ["only"]
        assert [i for i, _ in got[1]] == ["only"]

    def test_save_load(self, filled, tmp_path):
        tpu, _, vecs = filled
        p = str(tmp_path / "idx.npz")
        tpu.save(p)
        tpu2 = TpuFlatIndex(DIM)
        tpu2.load(p)
        assert len(tpu2) == 100
        assert tpu2.search(vecs[12], 1)[0][0] == "n12"
        # metadata survives: filters still work
        hits = tpu2.search(vecs[12], 20, VectorFilter(kinds=["fact"]))
        assert all(int(i[1:]) % 2 == 0 for i, _ in hits)


class TestBf16Storage:
    def test_bf16_index_retrieval_parity(self):
        """bf16 device storage must keep retrieval quality: every
        vector remains its own nearest neighbor and top-5 overlaps the
        fp32 index heavily."""
        from cortex_tpu.vector.index import TpuFlatIndex
        rng = np.random.default_rng(21)
        vecs = rng.normal(size=(500, 64)).astype(np.float32)
        ids = [f"v{i}" for i in range(500)]
        f32 = TpuFlatIndex(64)
        bf16 = TpuFlatIndex(64, storage_dtype="bfloat16")
        f32.insert_batch(ids, vecs)
        bf16.insert_batch(ids, vecs)
        q = vecs[:16]
        h32 = f32.search_batch(q, 5)
        h16 = bf16.search_batch(q, 5)
        for r in range(16):
            assert h16[r][0][0] == ids[r]          # self-retrieval
            overlap = len({i for i, _ in h32[r]} &
                          {i for i, _ in h16[r]})
            assert overlap >= 4

    def test_config_plumbs_device_dtype(self, tmp_path):
        from cortex_tpu.config import CortexConfig
        import jax.numpy as jnp
        p = tmp_path / "c.toml"
        p.write_text('[embedding]\nmodel = "hash"\n'
                     'device_dtype = "bfloat16"\n')
        cfg = CortexConfig.load(str(p))
        from cortex_tpu.api import Cortex
        cx = Cortex.in_memory(cfg)
        assert cx.index._corpus._storage_dtype == jnp.bfloat16


class TestEmbedding:
    def test_deterministic(self):
        e = HashingEmbedder(64)
        a = e.embed("the quick brown fox")
        b = e.embed("the quick brown fox")
        np.testing.assert_array_equal(a, b)
        assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)

    def test_similar_text_scores_higher(self):
        e = HashingEmbedder(384)
        a = e.embed("rust memory engine for ai agents")
        b = e.embed("memory engine for ai agents in rust")
        c = e.embed("weather forecast tomorrow sunny intervals")
        assert float(a @ b) > float(a @ c)

    def test_batch_matches_single(self):
        e = HashingEmbedder(64)
        texts = ["one two", "three four five"]
        batch = e.embed_batch(texts)
        for i, t in enumerate(texts):
            np.testing.assert_array_equal(batch[i], e.embed(t))

    def test_embedding_input_format(self):
        n = Node.new("fact", "Title here", "Body text", Source(agent="a"))
        n.tags = ["x", "y"]
        assert embedding_input(n) == "Fact: Title here\nBody text\ntags: x, y"

    def test_empty_text(self):
        e = HashingEmbedder(16)
        v = e.embed("")
        assert np.linalg.norm(v) == pytest.approx(1.0)


class TestSimilarityConfig:
    def test_defaults_valid(self):
        SimilarityConfig().validate()

    def test_link_ge_dedup_rejected(self):
        with pytest.raises(ConfigError):
            SimilarityConfig(auto_link_threshold=0.95).validate()

    def test_contradiction_ge_dedup_rejected(self):
        with pytest.raises(ConfigError):
            SimilarityConfig(contradiction_threshold=0.93).validate()


class TestScoreDecay:
    def mknode(self, kind="fact", idle_days=0.0, access=0, now=1_000_000.0):
        n = Node.new(kind, "Title for decay", "Body", Source(agent="a"))
        n.last_accessed_at = now - idle_days * 86400
        n.access_count = access
        return n

    def test_disabled_passthrough(self):
        cfg = ScoreDecayConfig(enabled=False)
        n = self.mknode(idle_days=100)
        assert apply_score_decay(n, 0.8, cfg, now=1_000_000.0) == pytest.approx(0.8)

    def test_zero_bias_passthrough(self):
        cfg = ScoreDecayConfig()
        n = self.mknode(idle_days=100)
        assert apply_score_decay(n, 0.8, cfg, 0.0, now=1_000_000.0) == \
            pytest.approx(0.8)

    def test_fresh_node_unchanged(self):
        cfg = ScoreDecayConfig()
        n = self.mknode(idle_days=0, access=0)
        got = apply_score_decay(n, 0.8, cfg, now=1_000_000.0)
        assert got == pytest.approx(0.8, abs=1e-5)

    def test_stale_event_decays_more_than_decision(self):
        cfg = ScoreDecayConfig()
        now = 1_000_000.0
        ev = self.mknode(kind="event", idle_days=30, now=now)
        de = self.mknode(kind="decision", idle_days=30, now=now)
        assert apply_score_decay(ev, 0.8, cfg, now=now) < \
            apply_score_decay(de, 0.8, cfg, now=now)

    def test_echo_boost_caps(self):
        cfg = ScoreDecayConfig()
        now = 1_000_000.0
        hot = self.mknode(access=1000, idle_days=0, now=now)
        # echo capped at 2.0: final = .8*.85 + .8*1*2*.15
        expect = 0.8 * 0.85 + 0.8 * 2.0 * 0.15
        assert apply_score_decay(hot, 0.8, cfg, now=now) == \
            pytest.approx(expect, abs=1e-5)

    def test_min_factor_floor(self):
        cfg = ScoreDecayConfig()
        now = 1_000_000_000.0
        ancient = self.mknode(kind="event", idle_days=10000, now=now)
        expect = 0.8 * 0.85 + 0.8 * cfg.min_factor * 0.15
        assert apply_score_decay(ancient, 0.8, cfg, now=now) == \
            pytest.approx(expect, abs=1e-5)

    def test_batch_matches_scalar(self):
        cfg = ScoreDecayConfig()
        now = 1_000_000.0
        nodes = [self.mknode(kind=k, idle_days=d, access=a, now=now)
                 for k, d, a in [("event", 5, 2), ("fact", 50, 0),
                                 ("decision", 1, 9)]]
        raw = np.array([0.9, 0.7, 0.5], np.float32)
        batch = apply_score_decay_batch(cfg, raw, nodes, now=now)
        for i, n in enumerate(nodes):
            assert batch[i] == pytest.approx(
                apply_score_decay(n, float(raw[i]), cfg, now=now), abs=1e-5)


class TestQuantSearchPath:
    """search_path="quant": int8 device scan + exact fp32 host re-rank.
    Must agree with brute force exactly (the re-rank IS exact; only
    candidate membership is approximate, and at these sizes the
    candidate set always contains the true top-k)."""

    def _pair(self, n=600, seed=3):
        tpu = TpuFlatIndex(DIM, search_path="quant")
        bf = BruteForceIndex(DIM)
        vecs = rand_vecs(n, seed)
        kinds = ["fact" if i % 2 == 0 else "event" for i in range(n)]
        agents = ["alice" if i % 3 == 0 else "bob" for i in range(n)]
        tpu.insert_batch([f"n{i}" for i in range(n)], vecs,
                         kinds=kinds, agents=agents)
        for i in range(n):
            bf.insert(f"n{i}", vecs[i], kind=kinds[i], source_agent=agents[i])
        return tpu, bf, vecs

    def test_matches_bruteforce(self):
        tpu, bf, vecs = self._pair()
        q = rand_vecs(5, seed=9)
        got = tpu.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], atol=1e-5)

    def test_filters_respected(self):
        tpu, bf, vecs = self._pair()
        q = rand_vecs(3, seed=11)
        flt = VectorFilter(kinds=["fact"], exclude_ids=["n0", "n2"])
        got = tpu.search_batch(q, 8, flt)
        want = bf.search_batch(q, 8, flt)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_search_stream_quant_matches_bruteforce(self):
        """Single-drain stream through the quant path (int8 candidates
        + exact re-rank applied to the CONCATENATED result) stays
        exact, tail padding included."""
        tpu, bf, vecs = self._pair()
        q = rand_vecs(21, seed=13)
        got = tpu.search_stream(q, 10, batch=8)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], atol=1e-5)

    def test_anisotropic_corpus_matches_bruteforce(self):
        """Real-encoder geometry: all vectors share a dominant common
        component, cosine gaps live in a small residual. The centered
        int8 shadow must keep the serving path exact here (uncentered
        quantization loses ~20% recall on this geometry — see
        benches/semantic_recall_study.py). Also covers incremental
        insert -> partial quant sync against a stale centering shift."""
        rng = np.random.default_rng(17)
        n = 800
        common = rng.normal(size=(1, DIM)).astype(np.float32)
        common /= np.linalg.norm(common)
        vecs = common + rng.normal(size=(n, DIM)).astype(np.float32) * 0.02
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tpu = TpuFlatIndex(DIM, search_path="quant")
        bf = BruteForceIndex(DIM)
        tpu.insert_batch([f"n{i}" for i in range(n - 50)], vecs[:n - 50])
        for i in range(n - 50):
            bf.insert(f"n{i}", vecs[i])
        q = common + rng.normal(size=(6, DIM)).astype(np.float32) * 0.02
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        tpu.search_batch(q, 10)          # forces full sync (sets mu)
        # incremental tail quantizes against the stale mu — still exact
        tpu.insert_batch([f"n{i}" for i in range(n - 50, n)],
                         vecs[n - 50:])
        for i in range(n - 50, n):
            bf.insert(f"n{i}", vecs[i])
        got = tpu.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], atol=1e-5)

    def test_bf16_storage_anisotropic_centered(self):
        """bf16 device storage is centered (rounding error scales with
        the residual, not the shared component) and returned scores are
        compensated back to absolute cosines. On this anisotropic
        corpus an uncentered bf16 store loses ~25% recall."""
        rng = np.random.default_rng(23)
        n = 512
        common = rng.normal(size=(1, DIM)).astype(np.float32)
        common /= np.linalg.norm(common)
        vecs = common + rng.normal(size=(n, DIM)).astype(np.float32) * 0.02
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        tpu = TpuFlatIndex(DIM, search_path="approx",
                           storage_dtype="bfloat16")
        bf = BruteForceIndex(DIM)
        tpu.insert_batch([f"n{i}" for i in range(n)], vecs)
        for i in range(n):
            bf.insert(f"n{i}", vecs[i])
        q = common + rng.normal(size=(4, DIM)).astype(np.float32) * 0.02
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        got = tpu.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            grank = [i for i, _ in g]
            wrank = [i for i, _ in w]
            # rank agreement within residual-rounding noise: require the
            # same top-10 SET and a close-to-exact ordering up front
            assert set(grank) == set(wrank)
            assert grank[0] == wrank[0]
            # compensated scores are absolute cosines (all ~0.99 here,
            # NOT the small centered residual scores)
            for (_, gs), (_, ws) in zip(g, w):
                assert gs == pytest.approx(ws, abs=5e-3)
                assert gs > 0.9

    def test_scores_are_exact_fp32(self):
        """The re-ranked scores must be fp32-exact cosines, not the
        int8-noisy scan scores."""
        tpu, bf, vecs = self._pair(n=50)
        hits = tpu.search(vecs[7], 1)
        assert hits[0][0] == "n7"
        assert abs(hits[0][1] - 1.0) < 1e-5

    def test_quant_only_residency_matches_bruteforce(self, monkeypatch):
        """When the full-precision corpus exceeds the HBM budget the
        engine keeps only the int8 shadow + masks on device and re-ranks
        on the host mirror (the 10M-row residency mode). Results must
        stay exact; the path choice must be forced to quant."""
        monkeypatch.setenv("CORTEX_HBM_BUDGET_GB", "0.00001")
        tpu, bf, vecs = self._pair(n=400)
        q = rand_vecs(4, seed=21)
        got = tpu.search_batch(q, 10)
        corpus = tpu._corpus
        assert corpus._emb_resident is False
        assert corpus._dev[0] is None           # no full-precision copy
        assert corpus._dev_q is not None        # int8 shadow present
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]
            np.testing.assert_allclose([s for _, s in g],
                                       [s for _, s in w], atol=1e-5)
        # incremental writes keep working without the emb array
        extra = rand_vecs(20, seed=33)
        tpu.insert_batch([f"x{i}" for i in range(20)], extra)
        for i in range(20):
            bf.insert(f"x{i}", extra[i])
        got = tpu.search_batch(q, 10)
        want = bf.search_batch(q, 10)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_remove_then_search(self):
        tpu, bf, vecs = self._pair(n=64)
        tpu.remove("n5")
        bf.remove("n5")
        got = tpu.search(vecs[5], 3)
        assert all(i != "n5" for i, _ in got)

    def test_invalid_search_path_rejected(self):
        with pytest.raises(IndexError_):
            TpuFlatIndex(DIM, search_path="warp")


class TestFilterOverflow:
    """Filter lists beyond the fixed-shape device encoding (16 kinds /
    64 exclusions) must fall back to an exact host-computed bias, never
    silently truncate (r1 VERDICT #8 / ADVICE #4)."""

    def _big(self, n=300, n_kinds=40, search_path="auto"):
        tpu = TpuFlatIndex(DIM, search_path=search_path)
        bf = BruteForceIndex(DIM)
        vecs = rand_vecs(n, seed=21)
        kinds = [f"kind-{i % n_kinds}" for i in range(n)]
        agents = ["alice"] * n
        tpu.insert_batch([f"n{i}" for i in range(n)], vecs,
                         kinds=kinds, agents=agents)
        for i in range(n):
            bf.insert(f"n{i}", vecs[i], kind=kinds[i], source_agent=agents[i])
        return tpu, bf, vecs

    @pytest.mark.parametrize("n_excl", [1, 64, 65, 150, 299])
    def test_excluded_id_never_returns(self, n_excl):
        tpu, bf, vecs = self._big()
        excl = [f"n{i}" for i in range(n_excl)]
        flt = VectorFilter(exclude_ids=excl)
        q = rand_vecs(4, seed=33)
        for hits in tpu.search_batch(q, 20, flt):
            assert not (set(i for i, _ in hits) & set(excl))
        # and exact parity with brute force
        want = bf.search_batch(q, 20, flt)
        got = tpu.search_batch(q, 20, flt)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_many_kind_filters_exact(self):
        tpu, bf, vecs = self._big()
        kinds = [f"kind-{i}" for i in range(30)]     # > MAX_FILTER_KINDS
        flt = VectorFilter(kinds=kinds)
        q = rand_vecs(3, seed=34)
        got = tpu.search_batch(q, 15, flt)
        want = bf.search_batch(q, 15, flt)
        for g, w in zip(got, want):
            assert [i for i, _ in g] == [i for i, _ in w]

    @pytest.mark.parametrize("n_excl", [65, 200])
    def test_overflow_on_quant_path(self, n_excl):
        tpu, bf, vecs = self._big(search_path="quant")
        excl = [f"n{i}" for i in range(n_excl)]
        flt = VectorFilter(exclude_ids=excl)
        q = rand_vecs(3, seed=35)
        got = tpu.search_batch(q, 10, flt)
        want = bf.search_batch(q, 10, flt)
        for g, w in zip(got, want):
            assert not (set(i for i, _ in g) & set(excl))
            assert [i for i, _ in g] == [i for i, _ in w]

    def test_overflow_on_sharded_index(self):
        from cortex_tpu.parallel import ShardedFlatIndex, build_mesh
        import jax
        mesh = build_mesh(min(8, len(jax.devices())))
        tpu = ShardedFlatIndex(DIM, mesh)
        bf = BruteForceIndex(DIM)
        vecs = rand_vecs(200, seed=40)
        for i in range(200):
            tpu.insert(f"n{i}", vecs[i], kind="fact", source_agent="a")
            bf.insert(f"n{i}", vecs[i], kind="fact", source_agent="a")
        excl = [f"n{i}" for i in range(100)]          # > MAX_EXCLUDE
        flt = VectorFilter(exclude_ids=excl)
        q = rand_vecs(2, seed=41)
        got = tpu.search_batch(q, 10, flt)
        want = bf.search_batch(q, 10, flt)
        for g, w in zip(got, want):
            assert not (set(i for i, _ in g) & set(excl))
            assert [i for i, _ in g] == [i for i, _ in w]
