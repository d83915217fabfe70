"""Recall-target nprobe tuning ([embedding] ivf_target_recall).

The auto nprobe default (nlist/8) guesses at a geometry-dependent
quantity: real-text corpora measured nprobe-LIMITED (+9 pts from C/8
to C/2 at 200k) while blocky synthetic ones measured FLAT (BASELINE.md
"IVF on real-text geometry"). The tuner replaces the guess with a
measurement at (re)train time: sampled corpus rows as self-queries,
probe-hit curve against the layout's own int8-exact truth, smallest
ladder nprobe meeting the target. These tests pin: the tuned value
adapts to geometry in the right DIRECTION on both extremes, real
search recall tracks the target, explicit ivf_nprobe wins, the tuned
value survives snapshots without a re-tune, and retrain re-measures.
"""

import numpy as np

from cortex_tpu.vector import BruteForceIndex, TpuIvfIndex
from cortex_tpu.vector.ivf import IvfCorpus

DIM = 32


def smooth(n=800, seed=2, dim=DIM):
    """Overlapping-cluster corpus: neighbors straddle cluster
    boundaries, so probe-hit keeps rising with nprobe (the real-text
    shape)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(6, dim)).astype(np.float32)
    asg = rng.integers(0, 6, n)
    v = (centers[asg]
         + 1.5 * rng.normal(size=(n, dim)).astype(np.float32))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def blocky(n=800, seed=3, dim=DIM):
    """Tight isolated clusters: a query's true top-10 is its own
    block, found in the first probe (the synthetic-bench shape)."""
    rng = np.random.default_rng(seed)
    g = n // 8
    centers = rng.normal(size=(g, dim)).astype(np.float32)
    v = (np.repeat(centers, 8, axis=0)[:n]
         + 0.02 * rng.normal(size=(n, dim)).astype(np.float32))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def build(vecs, **kw):
    ids = [f"n{i:04d}" for i in range(len(vecs))]
    idx = TpuIvfIndex(vecs.shape[1], **kw)
    idx.insert_batch(ids, vecs)
    idx._corpus.sync()                        # train the layout now
    bf = BruteForceIndex(vecs.shape[1])
    for i, nid in enumerate(ids):
        bf.insert(nid, vecs[i])
    return idx, bf


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


class TestTunerDirection:
    def test_smooth_geometry_tunes_above_auto(self):
        idx, bf = build(smooth(), nlist=64, target_recall=0.95,
                        graph_degree=0)
        co = idx._corpus
        c = co._centroids_h.shape[0]
        assert co._nprobe_tuned > 0
        auto = max(8, c // 8)
        # neighbors straddle clusters: meeting 0.95 needs more probes
        # than the auto guess
        assert co._nprobe_tuned > auto
        # and real search recall tracks the target (sampling slack)
        q = smooth(32, seed=9)
        assert recall_at10(idx, bf, q) >= 0.85

    def test_blocky_geometry_tunes_at_or_below_auto(self):
        idx, _ = build(blocky(), nlist=64, target_recall=0.95,
                       graph_degree=0)
        co = idx._corpus
        c = co._centroids_h.shape[0]
        assert co._nprobe_tuned > 0
        # a block's top-10 is its own cluster (+spill): the first
        # ladder rung already meets the target
        assert co._nprobe_tuned <= max(8, c // 8)

    def test_target_met_on_tuner_sample(self):
        """The tuner's own guarantee: sampled probe-hit at the chosen
        nprobe >= target (re-derive the sample measurement)."""
        vecs = smooth()
        idx, bf = build(vecs, nlist=64, target_recall=0.9,
                        graph_degree=0)
        co = idx._corpus
        # in-distribution self-queries (the tuner's population):
        # candidate recall at the tuned setting should be close to
        # the target — full-corpus check, not just the sample
        q = vecs[::37][:24]
        assert recall_at10(idx, bf, q) >= 0.8


class TestTunerPrecedence:
    def test_explicit_nprobe_wins(self):
        idx, _ = build(smooth(), nlist=64, nprobe=5,
                       target_recall=0.99, graph_degree=0)
        co = idx._corpus
        assert co._nprobe_tuned == 0
        assert co._nprobe(co._centroids_h.shape[0]) == 5

    def test_target_zero_disables(self):
        idx, _ = build(smooth(), nlist=64, graph_degree=0)
        co = idx._corpus
        c = co._centroids_h.shape[0]
        assert co._nprobe_tuned == 0
        assert co._nprobe(c) == max(8, c // 8)

    def test_tiny_corpus_skips(self):
        idx, _ = build(smooth(24), nlist=4, target_recall=0.9,
                       graph_degree=0)
        assert idx._corpus._nprobe_tuned == 0

    def test_ladder_membership(self):
        idx, _ = build(smooth(), nlist=64, target_recall=0.97,
                       graph_degree=0)
        co = idx._corpus
        c = co._centroids_h.shape[0]
        ladder = {max(8, c >> i) for i in range(6, 0, -1)} \
            | {(3 * c) // 4, c}
        assert co._nprobe_tuned in ladder

    def test_curve_recorded_monotone(self):
        """The tuner keeps the full probe-hit curve for diagnostics
        (semantic_recall_study reports it): ladder-ascending,
        recall-monotone, consistent with the chosen rung."""
        idx, _ = build(smooth(), nlist=64, target_recall=0.9,
                       graph_degree=0)
        co = idx._corpus
        assert co._tune_curve, "tuned build must record its curve"
        ps = [p for p, _ in co._tune_curve]
        rs = [r for _, r in co._tune_curve]
        assert ps == sorted(ps)
        assert all(b >= a - 1e-9 for a, b in zip(rs, rs[1:]))
        assert all(0.0 <= r <= 1.0 for r in rs)
        # the pick is the first rung meeting the target (or full probe)
        met = [p for p, r in co._tune_curve if r >= 0.9]
        want = met[0] if met else co._centroids_h.shape[0]
        assert co._nprobe_tuned == want

    def test_index_info_reports_tuned_state(self):
        """index_info (the GET /stats operational block) exposes the
        clustering and tuned-nprobe state an operator needs."""
        idx, _ = build(smooth(), nlist=64, target_recall=0.9,
                       graph_degree=0)
        co = idx._corpus
        info = idx.index_info()
        assert info["kind"] == "ivf" and info["trained"]
        assert info["nlist"] == co._centroids_h.shape[0]
        assert info["nprobe_tuned"] == co._nprobe_tuned > 0
        assert info["nprobe"] == co._nprobe_tuned
        assert info["target_recall"] == 0.9
        assert info["tune_curve"] and all(
            len(pair) == 2 for pair in info["tune_curve"])
        assert info["size"] == len(idx)


class TestTunerPersistence:
    def test_snapshot_restores_without_retune(self, tmp_path,
                                              monkeypatch):
        vecs = smooth()
        idx, _ = build(vecs, nlist=64, target_recall=0.95,
                       graph_degree=0)
        tuned = idx._corpus._nprobe_tuned
        assert tuned > 0
        path = str(tmp_path / "ivf.npz")
        idx.save(path)

        idx2 = TpuIvfIndex(DIM, nlist=64, target_recall=0.95,
                           graph_degree=0)
        # a restore must consume the persisted value, not re-measure
        monkeypatch.setattr(
            IvfCorpus, "_tune_nprobe",
            lambda self, *a, **k: (_ for _ in ()).throw(
                AssertionError("tuner ran on a snapshot boot")))
        idx2.load(path)
        idx2._corpus.sync()
        assert idx2._corpus._nprobe_tuned == tuned

    def test_snapshot_restores_curve_with_value(self, tmp_path):
        """ADVICE r3 #3: the probe-hit curve persists with the tuned
        value, so /stats after a restore shows the measurement the
        pick came from (PARITY.md's stated contract)."""
        idx, _ = build(smooth(), nlist=64, target_recall=0.95,
                       graph_degree=0)
        curve = list(idx._corpus._tune_curve)
        assert curve
        path = str(tmp_path / "ivf.npz")
        idx.save(path)
        idx2 = TpuIvfIndex(DIM, nlist=64, target_recall=0.95,
                           graph_degree=0)
        idx2.load(path)
        idx2._corpus.sync()
        assert idx2._corpus._tune_curve == curve
        info = idx2.index_info()
        assert info["tune_curve"] == [[p, round(r, 4)]
                                      for p, r in curve]

    def test_trivial_layout_clears_stale_curve(self):
        """ADVICE r3 #2: when tuning resets (trivial layout after a
        shrink-retrain), the previous layout's curve must not linger
        as if it described the current state."""
        idx, _ = build(smooth(), nlist=64, target_recall=0.9,
                       graph_degree=0)
        co = idx._corpus
        assert co._nprobe_tuned > 0 and co._tune_curve
        # shrink below the tuner's minimum layout and retrain
        for i in range(30, 800):
            idx.remove(f"n{i:04d}")
        idx.retrain()
        assert co._nprobe_tuned == 0
        assert co._tune_curve == []

    def test_retrain_remeasures(self):
        vecs = smooth()
        idx, _ = build(vecs, nlist=64, target_recall=0.95,
                       graph_degree=0)
        first = idx._corpus._nprobe_tuned
        assert first > 0
        # swap the corpus contents to the blocky extreme and retrain:
        # the tuned value must follow the new geometry downward
        ids = [f"b{i:04d}" for i in range(800)]
        idx.insert_batch(ids, blocky())
        for i in range(len(vecs)):
            idx.remove(f"n{i:04d}")
        idx.retrain()
        co = idx._corpus
        c = co._centroids_h.shape[0]
        assert co._nprobe_tuned > 0
        assert co._nprobe_tuned <= max(8, c // 8) < first


class TestShardedTuner:
    def test_sharded_ivf_tunes(self):
        from cortex_tpu.parallel import build_mesh
        from cortex_tpu.parallel.sharded_ivf import ShardedIvfIndex
        vecs = smooth()
        ids = [f"n{i:04d}" for i in range(len(vecs))]
        idx = ShardedIvfIndex(DIM, build_mesh(), nlist=64,
                              target_recall=0.95, graph_degree=0)
        idx.insert_batch(ids, vecs)
        idx._corpus.sync()
        co = idx._corpus
        assert co._nprobe_tuned > 0
        bf = BruteForceIndex(DIM)
        for i, nid in enumerate(ids):
            bf.insert(nid, vecs[i])
        q = smooth(16, seed=11)
        assert recall_at10(idx, bf, q) >= 0.85


class TestConfig:
    def test_validation_bounds(self):
        import pytest
        from cortex_tpu.config import CortexConfig
        from cortex_tpu.errors import ConfigError
        cfg = CortexConfig.from_dict(
            {"embedding": {"index": "ivf", "ivf_target_recall": 1.5}})
        with pytest.raises(ConfigError):
            cfg.validate()
        ok = CortexConfig.from_dict(
            {"embedding": {"index": "ivf", "ivf_target_recall": 0.9}})
        ok.validate()
        assert ok.embedding.ivf_target_recall == 0.9


class TestInfoSnapshot:
    def test_index_info_lock_free_during_retrains(self):
        """GET /stats must never block behind (or tear against) a
        retrain: index_info reads an atomically-published dict
        (ADVICE r3 #1 + the r4 review's lock-queueing finding). Hammer
        it from a thread while the corpus flips between trained and
        emptied states; every read must be internally consistent and
        fast."""
        import threading
        import time as _t
        idx, _ = build(smooth(), nlist=64, target_recall=0.9,
                       graph_degree=0)
        stop = _t.monotonic() + 3.0
        errs = []

        def reader():
            while _t.monotonic() < stop:
                info = idx.index_info()
                try:
                    assert info["kind"] == "ivf"
                    if info["trained"]:
                        assert info["nlist"] >= 1
                        assert 1 <= info["nprobe"] <= info["nlist"]
                        curve = info["tune_curve"]
                        if info["nprobe_tuned"] == 0:
                            assert curve == []
                    else:
                        assert "nlist" not in info
                except AssertionError as e:
                    errs.append(repr(e))
                    return

        t = threading.Thread(target=reader)
        t.start()
        ids2 = [f"x{i:04d}" for i in range(800)]
        flip = 0
        while _t.monotonic() < stop:
            if flip % 2 == 0:
                idx.insert_batch(ids2, blocky())
                for i in range(800):
                    idx.remove(f"n{i:04d}" if flip == 0
                               else f"x{i:04d}")
            else:
                idx.insert_batch([f"n{i:04d}" for i in range(800)],
                                 smooth())
            idx.retrain()
            flip += 1
        t.join()
        assert errs == []
        # reads stay fast even mid-retrain: the snapshot is a dict
        t0 = _t.monotonic()
        idx.index_info()
        assert _t.monotonic() - t0 < 0.1


# ------------------------------------------------------- delivered recall


class TestDeliveredRecallGate:
    """VERDICT r4 #4: the tuner must price END-TO-END recall, not just
    probe-hit (which only upper-bounds candidate membership — hash-text
    measured 0.973 delivered at probe-hit 1.0)."""

    def test_delivered_measured_and_published(self):
        idx, bf = build(smooth(), target_recall=0.9)
        info = idx.index_info()
        assert info["nprobe_tuned"] > 0
        assert info["delivered_recall"] is not None
        assert 0.0 <= info["delivered_recall"] <= 1.0
        assert info["cand_boost"] >= 1
        # on this smooth corpus delivery should be close to the
        # probe-hit reading (no tie-dense pathology)
        assert info["delivered_recall"] >= 0.7

    def test_escalates_cand_when_under_delivering(self, monkeypatch):
        """Simulated candidate-bound residual: delivered recall rises
        with the width, so the tuner escalates until the target."""
        co = IvfCorpus.__new__(IvfCorpus)  # drive the loop in isolation
        calls = []

        def fake_measure(q, qrows, truth, valid):
            calls.append(co._cand_boost)
            return {1: 0.95, 2: 0.985, 4: 0.995}[co._cand_boost]

        co._cand_boost = 1
        co._target_recall = 0.99
        co._delivered_recall = None
        co._measure_delivered = fake_measure
        # replicate the tuner's escalation tail
        delivered = co._measure_delivered(None, None, None, None)
        while (delivered is not None
               and delivered < co._target_recall - 1e-9
               and co._cand_boost < 4):
            co._cand_boost *= 2
            re_meas = co._measure_delivered(None, None, None, None)
            if re_meas is None or re_meas <= delivered + 1e-9:
                co._cand_boost //= 2
                break
            delivered = re_meas
        co._delivered_recall = delivered
        assert co._cand_boost == 4
        assert co._delivered_recall == 0.995
        assert calls == [1, 2, 4]

    def test_reverts_when_widening_does_not_help(self):
        """A residual that wider candidates don't move is not
        candidate-bound: the escalation refunds the QPS cost."""
        co = IvfCorpus.__new__(IvfCorpus)
        co._cand_boost = 1
        co._target_recall = 0.99
        co._delivered_recall = None
        co._measure_delivered = lambda *a: 0.973   # flat in width
        delivered = co._measure_delivered()
        while (delivered is not None
               and delivered < co._target_recall - 1e-9
               and co._cand_boost < 4):
            co._cand_boost *= 2
            re_meas = co._measure_delivered()
            if re_meas is None or re_meas <= delivered + 1e-9:
                co._cand_boost //= 2
                break
            delivered = re_meas
        assert co._cand_boost == 1

    def test_boost_survives_snapshot(self, tmp_path):
        idx, bf = build(smooth(), target_recall=0.9)
        co = idx._corpus
        co._cand_boost = 2                    # pretend escalation fired
        co._delivered_recall = 0.991
        path = str(tmp_path / "ivf.npz")
        idx.save(path)
        idx2 = TpuIvfIndex(DIM, target_recall=0.9)
        idx2.load(path)
        idx2._corpus.sync()
        info = idx2.index_info()
        assert idx2._corpus._cand_boost == 2
        assert info["delivered_recall"] == 0.991
        assert info["nprobe_tuned"] == idx.index_info()["nprobe_tuned"]
