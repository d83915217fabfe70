"""Dispatch-outside-the-lock protocol races (max-effort review pass):
a remove landing between dispatch and fetch must not resurrect the row
as a ghost hit, and a full re-upload swapping the bf16 centering shift
must not corrupt an in-flight search's absolute scores."""

import numpy as np

from cortex_tpu.vector.shard import DeviceCorpus


def _norm(v):
    return v / np.linalg.norm(v)


class TestRemoveRacesRescore:
    def test_removed_row_never_returns_as_ghost(self):
        """Quant path: dispatch, then remove a top hit BEFORE the
        fetch. The host re-rank reads the CURRENT mirror where the row
        is zeroed — q.0 = 0.0 used to outrank real negative-cosine
        hits and surface as (0.0, None) inside the top-k."""
        rng = np.random.default_rng(0)
        dim = 32
        c = DeviceCorpus(dim, search_path="quant")
        q = _norm(rng.standard_normal(dim).astype(np.float32))
        # the best hit aligns with q; everything else anti-aligns, so
        # a ghost 0.0 would beat every legitimate remaining candidate
        c.upsert("best", q.copy(), "fact", "a")
        for i in range(30):
            v = _norm(-q + 0.05 * rng.standard_normal(dim)
                      ).astype(np.float32)
            c.upsert(f"n{i}", v, "fact", "a")
        finish = c.topk_async(q[None, :], 5)
        c.remove("best")                 # races the in-flight fetch
        scores, ids = finish()
        assert "best" not in ids[0]
        for j, nid in enumerate(ids[0]):
            if nid is None:
                assert scores[0][j] <= -1e29
            else:
                # every surviving hit carries its true (negative)
                # cosine — no 0.0 ghost displaced them
                assert scores[0][j] < 0.5


class TestBf16MuSnapshot:
    def test_in_flight_scores_use_dispatch_time_mu(self):
        """bf16 storage: a full re-upload (growth) recomputes the
        centering mean mu; an in-flight search compensated with the
        NEW mu returned scores off by q.(mu_new - mu_old)."""
        rng = np.random.default_rng(1)
        dim = 32
        c = DeviceCorpus(dim, search_path="exact",
                         storage_dtype="bfloat16")
        vecs = {}
        for i in range(64):
            v = _norm(rng.standard_normal(dim)).astype(np.float32)
            c.upsert(f"n{i}", v, "fact", "a")
            vecs[f"n{i}"] = v
        q = _norm(rng.standard_normal(dim)).astype(np.float32)
        finish = c.topk_async(q[None, :], 5)
        # force a full re-upload with a VERY different mean: grow past
        # capacity (1024) with rows biased along +1
        bias = np.ones(dim, np.float32)
        ids = [f"m{i}" for i in range(1100)]
        vs = np.stack([_norm(bias + 0.1 * rng.standard_normal(dim))
                       for _ in range(1100)]).astype(np.float32)
        c.upsert_batch(ids, vs, ["fact"] * 1100, ["a"] * 1100)
        c.sync()                          # re-upload, new mu
        scores, got = finish()
        for j, nid in enumerate(got[0]):
            if nid is None or nid not in vecs:
                continue
            true = float(q @ vecs[nid])
            assert abs(scores[0][j] - true) < 0.02, \
                f"{nid}: {scores[0][j]} vs true {true} (mu race)"
