"""Device similarity kernels vs numpy ground truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from cortex_tpu.ops.similarity import (cosine_topk, cosine_topk_quant,
                                       cosine_topk_xla, normalize_rows,
                                       quantize_rows)


def np_topk(corpus, queries, k, bias=None):
    c = corpus / np.maximum(np.linalg.norm(corpus, axis=1, keepdims=True), 1e-12)
    q = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    s = q @ c.T
    if bias is not None:
        s = s + bias
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(s, idx, axis=1)
    return vals, idx


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(300, 64)).astype(np.float32)
    queries = rng.normal(size=(5, 64)).astype(np.float32)
    return corpus, queries


def _norm(x):
    return normalize_rows(jnp.asarray(x))


class TestXlaTopK:
    def test_matches_numpy(self, data):
        corpus, queries = data
        ref_v, ref_i = np_topk(corpus, queries, 10)
        v, i = cosine_topk_xla(_norm(corpus), _norm(queries), 10)
        np.testing.assert_allclose(np.asarray(v), ref_v, atol=1e-5)
        # indices may differ on exact ties; check score-equivalence
        assert np.allclose(np.sort(v, axis=1), np.sort(ref_v, axis=1), atol=1e-5)

    def test_bias_masking(self, data):
        corpus, queries = data
        bias = np.zeros((1, 300), np.float32)
        bias[:, :150] = -1e30           # mask out first half
        v, i = cosine_topk_xla(_norm(corpus), _norm(queries), 10,
                               jnp.asarray(bias))
        assert np.all(np.asarray(i) >= 150)

    def test_self_similarity_is_one(self):
        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(20, 16)).astype(np.float32)
        v, i = cosine_topk_xla(_norm(corpus), _norm(corpus), 1)
        np.testing.assert_allclose(np.asarray(v)[:, 0], 1.0, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(20))


class TestQuantTopK:
    """int8 candidate scan (pure XLA ops — runs on CPU) vs exact oracle.
    Candidates carry quantization noise in ORDER; membership of the true
    top-k in the candidate set is the contract (DeviceCorpus re-ranks
    exactly against the fp32 host mirror)."""

    @pytest.mark.parametrize("n,d,b,k", [
        (300, 64, 5, 10),
        (1024, 128, 3, 7),
        (130, 33, 1, 5),            # ragged shapes exercise padding
    ])
    def test_candidates_contain_exact_topk(self, n, d, b, k):
        rng = np.random.default_rng(42)
        corpus = rng.normal(size=(n, d)).astype(np.float32)
        queries = _norm(rng.normal(size=(b, d)).astype(np.float32))
        cn = np.asarray(_norm(corpus))
        i8, rinv = quantize_rows(cn)
        xv, xi = cosine_topk_xla(jnp.asarray(cn), queries, min(k, n))
        cand = max(2 * k, k + 16, 32)
        qv, qi = cosine_topk_quant(jnp.asarray(i8), jnp.asarray(rinv),
                                   queries, cand)
        for r in range(b):
            got = set(np.asarray(qi)[r][np.asarray(qv)[r] > -1e29])
            assert set(np.asarray(xi)[r]) <= got

    def test_bias_masking(self):
        rng = np.random.default_rng(7)
        corpus = np.asarray(_norm(rng.normal(size=(256, 32))
                                  .astype(np.float32)))
        queries = _norm(rng.normal(size=(2, 32)).astype(np.float32))
        i8, rinv = quantize_rows(corpus)
        bias = np.zeros((256,), np.float32)
        bias[::2] = -1e30           # mask even rows
        qv, qi = cosine_topk_quant(jnp.asarray(i8), jnp.asarray(rinv),
                                   queries, 8, jnp.asarray(bias))
        live = np.asarray(qv) > -1e29
        assert np.all(np.asarray(qi)[live] % 2 == 1)

    def test_centered_quant_survives_anisotropy(self):
        """Real text encoders are anisotropic: every row = big shared
        component + small residual, and cosine gaps live entirely in
        the residual. Uncentered int8 spends its range on the shared
        component and candidate membership collapses; centered
        quantization (the engine's scheme) must keep the true top-k in
        the candidate set. Ranking-invariance: q·(x−μ) orders like q·x."""
        from cortex_tpu.ops.similarity import quantize_rows_centered
        rng = np.random.default_rng(21)
        d, n, b, k = 96, 4096, 8, 10
        common = _norm(rng.normal(size=(1, d)).astype(np.float32))
        resid = rng.normal(size=(n, d)).astype(np.float32) * 0.02
        corpus = np.asarray(_norm(common + resid))
        queries = np.asarray(_norm(common + rng.normal(size=(b, d))
                                   .astype(np.float32) * 0.02))
        xv, xi = cosine_topk_xla(jnp.asarray(corpus),
                                 jnp.asarray(queries), k)
        i8, rinv, mu = quantize_rows_centered(corpus)
        cand = max(2 * k, k + 16, 32)
        qv, qi = cosine_topk_quant(jnp.asarray(i8), jnp.asarray(rinv),
                                   jnp.asarray(queries), cand)
        for r in range(b):
            got = set(np.asarray(qi)[r][np.asarray(qv)[r] > -1e29])
            missing = set(np.asarray(xi)[r]) - got
            assert not missing, f"row {r}: true top-{k} rows {missing} " \
                                f"missing from centered candidates"
        # a stale / arbitrary shift is still ranking-correct
        i8b, rinvb, _ = quantize_rows_centered(corpus, mu * 0.5)
        qv2, qi2 = cosine_topk_quant(jnp.asarray(i8b), jnp.asarray(rinvb),
                                     jnp.asarray(queries), cand)
        for r in range(b):
            got = set(np.asarray(qi2)[r][np.asarray(qv2)[r] > -1e29])
            # half-centering halves the residual resolution; membership
            # of the top-1 (largest gap) must still survive
            assert int(np.asarray(xi)[r][0]) in got

    def test_quantize_roundtrip_error_bounded(self):
        rng = np.random.default_rng(5)
        x = np.asarray(_norm(rng.normal(size=(64, 384)).astype(np.float32)))
        i8, rinv = quantize_rows(x)
        back = i8.astype(np.float32) * rinv[:, None]
        # per-element error bounded by half a quantization step
        assert np.max(np.abs(back - x)) <= np.max(rinv) * 0.5 + 1e-7

    def test_approx_topk_matches_exact(self):
        from cortex_tpu.ops.similarity import cosine_topk_approx
        rng = np.random.default_rng(11)
        corpus = _norm(rng.normal(size=(2048, 64)).astype(np.float32))
        queries = _norm(rng.normal(size=(8, 64)).astype(np.float32))
        xv, xi = cosine_topk_xla(corpus, queries, 10)
        av, ai = cosine_topk_approx(corpus, queries, 10, over=256)
        # with over >> k the candidate set contains the exact top-10
        recall = np.mean([
            len(set(np.asarray(xi)[r]) & set(np.asarray(ai)[r])) / 10
            for r in range(8)])
        assert recall >= 0.99
        np.testing.assert_allclose(np.asarray(av), np.asarray(xv),
                                   atol=1e-5)

    def test_approx_topk_respects_bias(self):
        from cortex_tpu.ops.similarity import cosine_topk_approx
        rng = np.random.default_rng(12)
        corpus = _norm(rng.normal(size=(1024, 32)).astype(np.float32))
        queries = _norm(rng.normal(size=(2, 32)).astype(np.float32))
        bias = np.zeros((1, 1024), np.float32)
        bias[:, ::2] = -1e30
        av, ai = cosine_topk_approx(corpus, queries, 8,
                                    jnp.asarray(bias), over=128)
        assert np.all(np.asarray(ai) % 2 == 1)

    def test_bf16_corpus(self):
        from cortex_tpu.ops.similarity import cosine_topk_approx
        rng = np.random.default_rng(9)
        corpus = _norm(rng.normal(size=(512, 64)).astype(np.float32))
        queries = _norm(rng.normal(size=(4, 64)).astype(np.float32))
        xv, xi = cosine_topk_xla(corpus, queries, 5)
        pv, pi = cosine_topk_approx(
            jnp.asarray(corpus, jnp.bfloat16), queries, 5, over=128)
        # bf16 rounding can permute near-ties; require >=4/5 overlap
        overlap = np.mean([
            len(set(np.asarray(xi)[r]) & set(np.asarray(pi)[r])) / 5
            for r in range(4)])
        assert overlap >= 0.8
        np.testing.assert_allclose(np.asarray(pv), np.asarray(xv),
                                   atol=0.01)


class TestDispatcher:
    def test_k_larger_than_n(self):
        rng = np.random.default_rng(3)
        corpus = _norm(rng.normal(size=(4, 8)).astype(np.float32))
        queries = _norm(rng.normal(size=(2, 8)).astype(np.float32))
        v, i = cosine_topk(corpus, queries, 10)
        assert v.shape == (2, 10)
        assert np.all(v[:, 4:] < -1e29)
