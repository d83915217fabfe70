"""Transparent re-dispatch on lost device responses (VERDICT r4 #7).

r4's batch-1 soaks recorded one 35-40 s outlier in 50 reps at both 1M
and 10M: a response the tunnel delivered just under the fixed 45 s
watchdog, so no retry ever fired and the request ate the full stall.
The serving path now bounds the FIRST fetch with an adaptive deadline
(~10x recent p95, >= 2 s) and re-dispatches on expiry; retries keep
the full deadline so a slow-but-alive device still completes.
"""

import numpy as np
import pytest

import cortex_tpu.vector.shard as shard
from cortex_tpu.vector.index import TpuFlatIndex
from cortex_tpu.vector.shard import DeviceFetchTimeout


def _mk_index(n=500, dim=32):
    idx = TpuFlatIndex(dim=dim)
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = [f"n{i:04d}" for i in range(n)]
    idx.insert_batch(ids, vecs)
    return idx, ids, vecs


class TestAdaptiveDeadline:
    def test_full_deadline_until_warm(self):
        idx, _, _ = _mk_index()
        co = idx._corpus
        co._fetch_times.clear()
        assert co._first_fetch_deadline() == shard.FETCH_TIMEOUT_S

    def test_tracks_p95_with_floor_and_cap(self):
        idx, _, _ = _mk_index()
        co = idx._corpus
        co._fetch_times.clear()
        co._fetch_times.extend([0.01] * 100)     # healthy 10 ms fetches
        assert co._first_fetch_deadline() == 2.0   # floor
        co._fetch_times.clear()
        co._fetch_times.extend([0.8] * 100)      # degraded link
        assert co._first_fetch_deadline() == pytest.approx(8.0)
        co._fetch_times.clear()
        co._fetch_times.extend([30.0] * 100)     # worse than the cap
        assert co._first_fetch_deadline() == shard.FETCH_TIMEOUT_S

    def test_fetches_feed_the_window(self):
        idx, _, vecs = _mk_index()
        co = idx._corpus
        before = len(co._fetch_times)
        idx.search_batch(vecs[:2], 5)
        assert len(co._fetch_times) > before


class TestFaultInjection:
    def test_one_lost_response_is_transparent(self, monkeypatch):
        """Drop the first response: the request must still return the
        correct results via re-dispatch, count the event, and raise
        nothing to the caller."""
        idx, ids, vecs = _mk_index()
        co = idx._corpus
        want = idx.search_batch(vecs[:1], 5)     # healthy baseline
        state = {"drops": 1}
        real = shard._fetch_array

        def flaky(x, timeout=None):
            if state["drops"] > 0:
                state["drops"] -= 1
                raise DeviceFetchTimeout("injected lost response")
            return real(x, timeout=timeout)

        monkeypatch.setattr(shard, "_fetch_array", flaky)
        got = idx.search_batch(vecs[:1], 5)
        assert [i for i, _ in got[0]] == [i for i, _ in want[0]]
        assert co.fetch_redispatches == 1
        assert state["drops"] == 0

    def test_two_lost_responses_still_transparent(self, monkeypatch):
        idx, ids, vecs = _mk_index()
        want = idx.search_batch(vecs[3:4], 5)
        state = {"drops": 2}
        real = shard._fetch_array

        def flaky(x, timeout=None):
            if state["drops"] > 0:
                state["drops"] -= 1
                raise DeviceFetchTimeout("injected lost response")
            return real(x, timeout=timeout)

        monkeypatch.setattr(shard, "_fetch_array", flaky)
        got = idx.search_batch(vecs[3:4], 5)
        assert [i for i, _ in got[0]] == [i for i, _ in want[0]]
