"""Differential tests for the Mosaic IVF gather-score kernel.

The kernel (ops/ivf_gather.py) runs in Pallas INTERPRET mode here
(tests run on CPU), pinned bit-for-bit against the XLA reference
formulation (vector/ivf._ivf_candidates + _ivf_bias) that small/CPU
deployments still serve from. The on-hardware validation of the same
contract ran live at 10M-scale shapes (BASELINE.md 10M IVF row).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu.ops import ivf_gather
from cortex_tpu.vector import ivf as ivf_mod
from cortex_tpu.vector.ivf import (_ivf_bias, _ivf_candidates,
                                   _ivf_search, _ivf_search_hostbias,
                                   _ivf_search_pallas,
                                   _ivf_search_pallas_hostbias)
from cortex_tpu.vector.shard import NO_FILTER, PAD_CODE


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ivf_gather, "INTERPRET", True)
    yield
    # interpret-mode traces are cached under the same static keys the
    # compiled path would use — drop them so non-test code never hits
    # an interpreted trace
    ivf_gather.probed_scores.clear_cache()
    _ivf_search_pallas.clear_cache()
    _ivf_search_pallas_hostbias.clear_cache()


def _layout(seed=0, c=16, l=24, d=64):
    rng = np.random.default_rng(seed)
    emb = rng.integers(-127, 128, (c, l, d)).astype(np.int8)
    sr = rng.permutation(c * l).astype(np.float32).reshape(c, l)
    sr[rng.random((c, l)) < 0.2] = -1            # empty slots
    emb[sr < 0] = 0
    kc = rng.integers(0, 5, (c, l)).astype(np.float32)
    ac = rng.integers(0, 3, (c, l)).astype(np.float32)
    kc[sr < 0] = PAD_CODE
    ac[sr < 0] = PAD_CODE
    ri = (rng.random((c, l)) * 0.01 + 0.001).astype(np.float32)
    meta = np.zeros((c, 8, l), np.float32)
    meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3] = sr, kc, ac, ri
    return emb, sr, kc, ac, ri, meta


def _filters(kind=False, agent=False, excl=False):
    ak = np.full(16, PAD_CODE, np.int32)
    if kind:
        ak[0], ak[1] = 1, 3
    else:
        ak[0] = NO_FILTER
    aa = np.array([1 if agent else NO_FILTER], np.int32)
    ex = np.full(64, NO_FILTER, np.int32)
    if excl:
        ex[:3] = [5, 9, 100]
    return ak, aa, ex


class TestProbedScores:
    @pytest.mark.parametrize("case", ["none", "kind", "agent", "excl",
                                      "all"])
    def test_matches_xla_reference(self, case):
        emb, sr, kc, ac, ri, meta = _layout()
        rng = np.random.default_rng(1)
        b, p = 5, 6                              # p pads 6 -> 8
        probe = rng.integers(0, emb.shape[0], (b, p)).astype(np.int32)
        q = rng.standard_normal((b, emb.shape[2])).astype(np.float32)
        qs = 127.0 / np.maximum(np.abs(q).max(axis=1), 1e-12)
        qi8 = np.clip(np.round(q * qs[:, None]), -127, 127
                      ).astype(np.int8)
        ak, aa, ex = _filters(kind=case in ("kind", "all"),
                              agent=case in ("agent", "all"),
                              excl=case in ("excl", "all"))
        filtered = case != "none"

        s, sr2 = _ivf_candidates(jnp.asarray(emb), jnp.asarray(ri),
                                 jnp.asarray(sr.astype(np.int32)),
                                 jnp.asarray(probe), jnp.asarray(q))
        kc2 = jnp.asarray(kc.astype(np.int32))[jnp.asarray(probe)
                                               ].reshape(b, -1)
        ac2 = jnp.asarray(ac.astype(np.int32))[jnp.asarray(probe)
                                               ].reshape(b, -1)
        want = np.asarray(s + _ivf_bias(sr2, kc2, ac2, jnp.asarray(ak),
                                        jnp.asarray(aa[0]),
                                        jnp.asarray(ex)))
        want_rows = np.asarray(sr2)

        got, rows = ivf_gather.probed_scores(
            jnp.asarray(emb), jnp.asarray(meta), jnp.asarray(probe),
            jnp.asarray(qi8), jnp.asarray(ak), jnp.asarray(aa),
            jnp.asarray(ex), filtered=filtered)
        got = np.asarray(got)[:, :want.shape[1]]
        rows = np.asarray(rows)[:, :want.shape[1]]

        mask = want > -1e29
        assert (mask == (got > -1e29)).all()
        got = np.where(mask, got / qs[:, None], got)  # query descale
        np.testing.assert_allclose(got[mask], want[mask],
                                   rtol=1e-6, atol=1e-6)
        assert (np.where(mask, rows, 0)
                == np.where(mask, want_rows, 0)).all()

    def test_pad_columns_masked(self):
        emb, sr, kc, ac, ri, meta = _layout()
        probe = np.zeros((2, 3), np.int32)       # pads 3 -> 8
        qi8 = np.ones((2, emb.shape[2]), np.int8)
        ak, aa, ex = _filters()
        s, rows = ivf_gather.probed_scores(
            jnp.asarray(emb), jnp.asarray(meta), jnp.asarray(probe),
            jnp.asarray(qi8), jnp.asarray(ak), jnp.asarray(aa),
            jnp.asarray(ex), filtered=False)
        l = emb.shape[1]
        assert (np.asarray(s)[:, 3 * l:] <= -1e29).all()
        assert (np.asarray(rows)[:, 3 * l:] == 0).all()


class TestSearchPallas:
    """The full fused search functions: the Pallas formulations must
    return the same candidates as the XLA ones at every filter shape,
    including under forced query chunking."""

    def _args(self, seed=2, c=12, l=16, d=48, b=5, p=5):
        rng = np.random.default_rng(seed)
        emb, sr, kc, ac, ri, meta = _layout(seed=seed, c=c, l=l, d=d)
        cent = rng.standard_normal((c, d)).astype(np.float32)
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return (jnp.asarray(cent), jnp.asarray(emb),
                jnp.asarray(ri), jnp.asarray(sr.astype(np.int32)),
                jnp.asarray(kc.astype(np.int32)),
                jnp.asarray(ac.astype(np.int32)),
                jnp.asarray(meta), jnp.asarray(q), p)

    @pytest.mark.parametrize("case", ["none", "all"])
    def test_matches_xla_search(self, case):
        (cent, emb, ri, sr, kc, ac, meta, q, p) = self._args()
        ak, aa, ex = _filters(kind=case == "all", agent=case == "all",
                              excl=case == "all")
        want_v, want_r = _ivf_search(cent, emb, ri, sr, kc, ac,
                                     jnp.asarray(ak),
                                     jnp.asarray(aa[0]),
                                     jnp.asarray(ex), q, p=p, cand=10,
                                     dedup=True)
        got_v, got_r = _ivf_search_pallas(cent, emb, meta, ak, aa, ex,
                                          q, p=p, cand=10,
                                          filtered=case != "none",
                                          dedup=True)
        self._assert_same(want_v, want_r, got_v, got_r)

    def test_hostbias_matches(self):
        (cent, emb, ri, sr, kc, ac, meta, q, p) = self._args()
        cap = int(np.asarray(sr).max()) + 1
        rng = np.random.default_rng(3)
        bias = np.where(rng.random(cap) < 0.3, ivf_mod.NEG_INF,
                        0.0).astype(np.float32)
        want_v, want_r = _ivf_search_hostbias(cent, emb, ri, sr,
                                              jnp.asarray(bias), q,
                                              p=p, cand=10, dedup=True)
        got_v, got_r = _ivf_search_pallas_hostbias(cent, emb, meta,
                                                   jnp.asarray(bias),
                                                   q, p=p, cand=10,
                                                   dedup=True)
        self._assert_same(want_v, want_r, got_v, got_r)

    def test_chunked_matches(self, monkeypatch):
        (cent, emb, ri, sr, kc, ac, meta, q, p) = self._args()
        ak, aa, ex = _filters()
        want = _ivf_search_pallas(cent, emb, meta, ak, aa, ex, q,
                                  p=p, cand=10, filtered=False,
                                  dedup=True)
        monkeypatch.setattr(ivf_mod, "GATHER_BUDGET_BYTES", 1)
        _ivf_search_pallas.clear_cache()
        try:
            got = _ivf_search_pallas(cent, emb, meta, ak, aa, ex, q,
                                     p=p, cand=10, filtered=False,
                                     dedup=True)
            self._assert_same(want[0], want[1], got[0], got[1])
        finally:
            _ivf_search_pallas.clear_cache()

    @staticmethod
    def _assert_same(want_v, want_r, got_v, got_r):
        want_v, want_r = np.asarray(want_v), np.asarray(want_r)
        got_v, got_r = np.asarray(got_v), np.asarray(got_r)
        mask = want_v > -1e29
        assert (mask == (got_v > -1e29)).all()
        np.testing.assert_allclose(got_v[mask], want_v[mask],
                                   rtol=1e-5, atol=1e-6)
        assert (np.where(mask, got_r, 0)
                == np.where(mask, want_r, 0)).all()


class TestEnginePallas:
    """Full TpuIvfIndex searches through the (interpreted) Pallas path:
    fully-probed results must reproduce the flat oracle exactly, and
    filters/exclusions/deletes must behave identically to the XLA
    path — the engine-level guarantee the kernel slots into."""

    def _force_pallas(self, monkeypatch):
        from cortex_tpu.vector.ivf import IvfCorpus
        monkeypatch.setattr(IvfCorpus, "_use_pallas",
                            lambda self, cap: True)

    def test_fully_probed_matches_oracle(self, monkeypatch):
        self._force_pallas(monkeypatch)
        from test_ivf import build_pair, clustered
        vecs = clustered(300, dim=32)
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8)
        ivf._corpus.sync()                            # build is lazy
        assert ivf._corpus._ivf_dev[-1] is not None   # meta built
        q = clustered(4, dim=32, seed=7)
        got = ivf.search_batch(q, 10)
        want = oracle.search_batch(q, 10)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
            np.testing.assert_allclose([s for _, s in got[b]],
                                       [s for _, s in want[b]],
                                       atol=1e-5)

    def test_filters_and_overflow_bias(self, monkeypatch):
        self._force_pallas(monkeypatch)
        from cortex_tpu.vector import VectorFilter
        from test_ivf import build_pair, clustered
        vecs = clustered(240, dim=32)
        kinds = [("fact" if i % 3 else "event") for i in range(240)]
        ivf, oracle = build_pair(vecs, nlist=8, nprobe=8, kinds=kinds)
        q = clustered(3, dim=32, seed=9)
        flt = VectorFilter(kinds=["fact"])
        got = ivf.search_batch(q, 8, flt)
        want = oracle.search_batch(q, 8, flt)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
        # > MAX_EXCLUDE exclusions route through the hostbias kernel
        excl = [f"n{i}" for i in range(80)]
        flt2 = VectorFilter(exclude_ids=excl)
        got2 = ivf.search_batch(q, 8, flt2)
        want2 = oracle.search_batch(q, 8, flt2)
        for b in range(len(q)):
            assert [i for i, _ in got2[b]] == [i for i, _ in want2[b]]

    def test_incremental_updates_hit_meta(self, monkeypatch):
        """Insert-after-build goes through _apply_dirty: the meta
        scatter must keep the kernel's view consistent."""
        self._force_pallas(monkeypatch)
        from test_ivf import build_pair, clustered
        vecs = clustered(200, dim=32)
        ivf, oracle = build_pair(vecs, nlist=4, nprobe=4)
        ivf.search_batch(clustered(1, dim=32, seed=1), 5)  # build now
        extra = clustered(5, dim=32, seed=11) + 3.0   # distinctive
        for i, v in enumerate(extra):
            ivf.insert(f"x{i}", v)
            oracle.insert(f"x{i}", v, kind="", source_agent="")
        ivf.remove("n0")
        oracle.remove("n0")
        q = extra[:2]
        got = ivf.search_batch(q, 6)
        want = oracle.search_batch(q, 6)
        for b in range(len(q)):
            assert [i for i, _ in got[b]] == [i for i, _ in want[b]]
