"""Regression: search dispatch outside the corpus lock vs donating sync.

r3 moved `_dispatch_search` OUTSIDE the corpus lock (a cold XLA compile
blocks the call for ~tens of seconds on a tunneled device; holding the
lock across it turned the linker's first at-scale cycle into a serving
outage). That opened a race: the dispatch uses device-array handles
captured under the lock, and a concurrent search's `sync()` runs the
donating `_scatter_update` (donate_argnums) on those same handles —
the runtime then rejects the stale handle ("Buffer has been deleted").
The fix routes that rejection into the existing recapture-and-retry
path (`_donated_buffer_race`), with a final attempt that dispatches
while HOLDING the lock so sync() cannot interleave.

This test makes the race deterministic by widening the capture->
dispatch window with a sleep hook, then hammering two searcher threads
against a writer that keeps rows dirty. Without the fix, searches die
with "INVALID_ARGUMENT: Invalid buffer passed to Execute()".
"""

import threading
import time

import numpy as np

from cortex_tpu.vector import shard as shard_mod
from cortex_tpu.vector.shard import DeviceCorpus


class TestDonationRace:
    def test_search_survives_concurrent_donating_sync(self, monkeypatch):
        dim = 32
        rng = np.random.default_rng(0)
        corpus = DeviceCorpus(dim)
        ids = [f"n{i}" for i in range(256)]
        corpus.upsert_batch(ids, rng.standard_normal((256, dim)),
                            ["fact"] * 256, ["a"] * 256)
        corpus.sync()

        # widen the capture->dispatch window (stands in for a cold
        # compile) so a concurrent sync() lands inside it
        real_dispatch = DeviceCorpus._dispatch_search

        def slow_dispatch(self, *a, **kw):
            time.sleep(0.02)
            return real_dispatch(self, *a, **kw)

        monkeypatch.setattr(DeviceCorpus, "_dispatch_search", slow_dispatch)

        raced = threading.Event()
        real_check = shard_mod._donated_buffer_race

        def counting_check(e):
            hit = real_check(e)
            if hit:
                raced.set()
            return hit

        monkeypatch.setattr(shard_mod, "_donated_buffer_race",
                            counting_check)

        errors = []
        stop = threading.Event()

        def writer():
            i = 0
            while not stop.is_set():
                row = i % 256
                corpus.upsert(ids[row], rng.standard_normal(dim),
                              "fact", "a")
                i += 1

        def searcher(seed):
            r = np.random.default_rng(seed)
            while not stop.is_set():
                try:
                    v, got = corpus.topk(
                        r.standard_normal((4, dim)), 5)
                    assert v.shape == (4, 5)
                    for row in got:
                        for nid in row:
                            assert nid is None or nid in corpus
                except Exception as e:  # noqa: BLE001
                    errors.append(repr(e))
                    return

        threads = [threading.Thread(target=writer)] + [
            threading.Thread(target=searcher, args=(s,)) for s in (1, 2)]
        for t in threads:
            t.start()
        deadline = time.monotonic() + 6.0
        # run until the race has actually fired at least once (vacuous
        # otherwise) or the window closes
        while time.monotonic() < deadline and not raced.is_set() \
                and not errors:
            time.sleep(0.05)
        stop.set()
        for t in threads:
            t.join(timeout=30)

        assert not errors, errors[:3]
        assert raced.is_set(), (
            "donating sync never hit an in-flight dispatch; the race "
            "window this test guards was not exercised")
