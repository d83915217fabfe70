"""Device-side capacity growth (r3 mixed-workload fix #2).

Crossing a capacity-ladder boundary used to set _full_resync, which
re-uploads the ENTIRE corpus from the host mirror at the new capacity —
a 3 GB transfer through a tunneled device, measured as a recurring
~150-190 s p99 search stall in benches/mixed_workload_bench.py whenever
streaming writes crossed the boundary mid-serving. Growth now pads the
resident device arrays in HBM (the data is already there) and lets the
normal bucketed scatter fill the new rows.
"""

import numpy as np
import pytest

from cortex_tpu.vector.index import TpuFlatIndex
from cortex_tpu.vector.shard import DeviceCorpus, MIN_CAP


def build(n, dim=16, **kw):
    idx = TpuFlatIndex(dim, **kw)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    idx.insert_batch([f"n{i}" for i in range(n)], vecs)
    return idx, vecs


class TestGrowOnDevice:
    def test_growth_does_not_full_reupload(self, monkeypatch):
        idx, vecs = build(MIN_CAP)             # exactly at capacity
        idx.search_batch(vecs[:1], 5)          # resident now
        co = idx._corpus
        calls = []
        orig = DeviceCorpus._upload_full

        def spy(self, quant):
            calls.append(True)
            return orig(self, quant)

        monkeypatch.setattr(DeviceCorpus, "_upload_full", spy)
        rng = np.random.default_rng(1)
        nv = rng.normal(size=(8, co.dim)).astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(8)], nv)  # crosses cap
        idx.search_batch(nv[:1], 3)
        assert co._cap > MIN_CAP, "capacity must have grown"
        assert not calls, "growth must pad on device, not re-upload"

    def test_grown_corpus_searches_old_and_new_rows(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)
        rng = np.random.default_rng(2)
        nv = rng.normal(size=(5, 16)).astype(np.float32) + 3.0
        idx.insert_batch([f"g{i}" for i in range(5)], nv)
        # new rows searchable
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"
        # old rows intact with exact scores
        hits = idx.search_batch(vecs[7:8], 3)[0]
        assert hits[0][0] == "n7"
        q = vecs[7] / np.linalg.norm(vecs[7])
        want = float(q @ (vecs[7] / np.linalg.norm(vecs[7])))
        assert abs(hits[0][1] - want) < 1e-5

    def test_growth_with_quant_shadow(self):
        # search_path="quant" maintains the int8 shadow on CPU too
        idx, vecs = build(MIN_CAP, search_path="quant")
        idx.search_batch(vecs[:1], 5)
        co = idx._corpus
        assert co._dev_q is not None
        nv = np.random.default_rng(3).normal(size=(4, 16)) \
            .astype(np.float32) + 2.0
        idx.insert_batch([f"g{i}" for i in range(4)], nv)
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"
        assert co._dev_q[0].shape[0] == co._cap

    def test_multiple_ladder_steps_accumulate(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)
        co = idx._corpus
        rng = np.random.default_rng(4)
        # enough to cross SEVERAL doublings before the next sync
        n_new = MIN_CAP * 3
        nv = rng.normal(size=(n_new, 16)).astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(n_new)], nv)
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"
        assert len(co._live_h) == co._cap
        assert co._dev[1].shape[0] == co._cap

    def test_removal_then_growth_keeps_dead_rows_dead(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)
        idx.remove("n3")
        nv = np.random.default_rng(5).normal(size=(6, 16)) \
            .astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(6)], nv)
        hits = idx.search_batch(vecs[3:4], MIN_CAP)[0]
        assert "n3" not in {h for h, _ in hits}


class TestSubclassesKeepFullResync:
    def test_sharded_growth_full_resyncs(self):
        from cortex_tpu.parallel import ShardedFlatIndex
        idx = ShardedFlatIndex(16)
        rng = np.random.default_rng(6)
        vecs = rng.normal(size=(MIN_CAP, 16)).astype(np.float32)
        idx.insert_batch([f"n{i}" for i in range(MIN_CAP)], vecs)
        idx.search_batch(vecs[:1], 5)
        co = idx._corpus
        nv = rng.normal(size=(4, 16)).astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(4)], nv)
        # the sharded layout re-places on growth (GSPMD) — the device
        # pad shortcut must not engage
        assert co._grow_pad == 0
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"

    def test_ivf_growth_keeps_rebuild_path(self):
        from cortex_tpu.vector.ivf import TpuIvfIndex
        idx = TpuIvfIndex(16, nlist=4, nprobe=4)
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(MIN_CAP, 16)).astype(np.float32)
        idx.insert_batch([f"n{i}" for i in range(MIN_CAP)], vecs)
        idx.search_batch(vecs[:1], 5)
        nv = rng.normal(size=(4, 16)).astype(np.float32) + 2.0
        idx.insert_batch([f"g{i}" for i in range(4)], nv)
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"


class TestGrowthWarmup:
    def test_warm_then_grow(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)          # resident
        co = idx._corpus
        assert co.warm_growth_programs() is True
        # the warmed step then executes correctly
        nv = np.random.default_rng(8).normal(size=(4, 16)) \
            .astype(np.float32) + 3.0
        idx.insert_batch([f"g{i}" for i in range(4)], nv)
        hits = idx.search_batch(nv[:1], 3)[0]
        assert hits[0][0] == "g0"

    def test_warm_is_shape_only_noop_on_state(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)
        co = idx._corpus
        cap, grow_pad = co._cap, co._grow_pad
        co.warm_growth_programs()
        assert (co._cap, co._grow_pad) == (cap, grow_pad)

    def test_warm_declines_for_nonresident_and_subclasses(self):
        from cortex_tpu.vector.ivf import TpuIvfIndex
        idx = TpuFlatIndex(16)
        rng = np.random.default_rng(9)
        idx.insert_batch(["a"], rng.normal(size=(1, 16)).astype(np.float32))
        assert idx._corpus.warm_growth_programs() is False  # not resident
        ivf = TpuIvfIndex(16, nlist=2, nprobe=2)
        ivf.insert_batch([f"n{i}" for i in range(64)],
                         rng.normal(size=(64, 16)).astype(np.float32))
        ivf.search_batch(rng.normal(size=(1, 16)).astype(np.float32), 3)
        assert ivf._corpus.warm_growth_programs() is False  # IVF layout


class TestWarmAhead:
    def test_warm_covers_the_crossing_search_programs(self):
        """After warm_growth_programs, the post-growth search at the
        new capacity must hit the jit dispatch cache — no new compile
        of the search program on the serving path."""
        from cortex_tpu.vector import shard as sh
        idx, vecs = build(MIN_CAP)
        q = vecs[:1]
        idx.search_batch(q, 5)                 # resident + logged
        co = idx._corpus
        assert co._dispatch_log, "dispatch log must record the search"
        assert co.warm_growth_programs() is True
        fn = sh._WARMABLE["search"]
        before = fn._cache_size()
        nv = np.random.default_rng(10).normal(size=(8, 16)) \
            .astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(8)], nv)  # crosses cap
        idx.search_batch(q, 5)                 # same combo at new cap
        assert fn._cache_size() == before, \
            "post-growth search compiled a program the warm missed"

    def test_replay_dedups_stale_cap_entries(self):
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)
        co = idx._corpus
        # grow twice so the log holds entries at two old capacities
        rng = np.random.default_rng(11)
        for step in range(2):
            nv = rng.normal(size=(co._cap, 16)).astype(np.float32)
            idx.insert_batch([f"s{step}-{i}" for i in range(len(nv))], nv)
            idx.search_batch(vecs[:1], 5)
        caps = set(co._dispatch_log.values())
        assert len(caps) >= 2
        assert co.warm_growth_programs() is True  # replays without error


class TestScatterChunking:
    def test_large_dirty_sets_scatter_in_chunks(self, monkeypatch):
        from cortex_tpu.vector import shard as sh
        idx, vecs = build(MIN_CAP)
        idx.search_batch(vecs[:1], 5)          # resident
        monkeypatch.setattr(sh, "MAX_SCATTER_ROWS", 64)
        co = idx._corpus
        rng = np.random.default_rng(12)
        # re-write 300 existing rows (> 4 chunks of 64) in one wave
        ids = [f"n{i}" for i in range(300)]
        nv = rng.normal(size=(300, 16)).astype(np.float32)
        idx.insert_batch(ids, nv)
        # every rewritten row must serve its NEW vector exactly
        hits = idx.search_batch(nv[7:8], 1)[0]
        assert hits[0][0] == "n7"
        q = nv[7] / np.linalg.norm(nv[7])
        assert abs(hits[0][1] - 1.0) < 1e-5
        # untouched rows unchanged
        hits = idx.search_batch(vecs[500:501], 1)[0]
        assert hits[0][0] == "n500"


class TestHostPregrow:
    def test_pregrow_swap_with_catchup(self):
        """_grow must consume the background-built mirrors and re-copy
        rows mutated during the build."""
        idx, vecs = build(MIN_CAP - 8)     # leave free rows
        co = idx._corpus
        co._pregrow_host()                 # build synchronously
        assert co._pregrown is not None
        assert co._pregrown[0] == MIN_CAP and co._pregrown[1] == 2 * MIN_CAP
        # mutate AFTER the build: must be caught up at swap
        rng = np.random.default_rng(13)
        nv = rng.normal(size=(1, 16)).astype(np.float32) + 5.0
        idx.insert_batch(["late"], nv)     # overwrites... no: new row
        late_row = co._row_of["late"]
        assert late_row in co._pregrow_touched
        old_emb = co._emb_h

        def boom(*a, **k):
            raise AssertionError("synchronous grow copy must not run")

        import numpy as _np
        orig = _np.vstack
        _np.vstack = boom
        try:
            nv2 = rng.normal(size=(40, 16)).astype(np.float32)
            idx.insert_batch([f"g{i}" for i in range(40)], nv2)  # crosses
        finally:
            _np.vstack = orig
        assert co._cap == 2 * MIN_CAP
        assert co._emb_h is not old_emb
        assert co._pregrown is None and co._pregrow_touched is None
        # catch-up row correct
        hits = idx.search_batch(nv, 1)[0]
        assert hits[0][0] == "late"
        # and the crossing rows searchable
        hits = idx.search_batch(nv2[:1], 1)[0]
        assert hits[0][0] == "g0"

    def test_pregrow_removed_row_stays_dead_after_swap(self):
        idx, vecs = build(MIN_CAP)
        co = idx._corpus
        co._pregrow_host()
        idx.remove("n3")                   # mutation mid-tracking
        rng = np.random.default_rng(14)
        nv = rng.normal(size=(40, 16)).astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(40)], nv)  # crosses
        hits = idx.search_batch(vecs[3:4], co._cap)[0]
        assert "n3" not in {h for h, _ in hits}

    def test_pregrow_abandons_on_compact_mid_build(self, monkeypatch):
        """compact() reshuffles every row at an UNCHANGED capacity (in
        the >=85%-occupancy regime that triggers pre-growth), so the
        builder's cap check alone cannot see it — a mixed-layout mirror
        would be published and silently swapped in by the next _grow.
        The builder owns its touched-set by IDENTITY; compact replacing
        it with None is the abandon signal."""
        import threading

        import cortex_tpu.vector.shard as shard_mod

        idx, vecs = build(MIN_CAP)          # full: compact keeps cap
        co = idx._corpus
        hit, resume = threading.Event(), threading.Event()
        orig_zeros = np.zeros

        def zeros_hook(*a, **k):
            # pause the builder AFTER it registered its touched-set
            # but BEFORE any chunk copies, so compact lands mid-build
            if (threading.current_thread().name == "pregrow-test"
                    and not hit.is_set()):
                hit.set()
                assert resume.wait(10)
            return orig_zeros(*a, **k)

        monkeypatch.setattr(shard_mod.np, "zeros", zeros_hook)
        t = threading.Thread(target=co._pregrow_host,
                             name="pregrow-test")
        t.start()
        assert hit.wait(10)
        co.compact()                        # every row moved, same cap
        assert co._cap == MIN_CAP
        resume.set()
        t.join(10)
        assert not t.is_alive()
        assert co._pregrown is None         # mixed build NOT published

    def test_maybe_pregrow_starts_exactly_one_builder(self, monkeypatch):
        """The pending flag is tested-and-set under the corpus lock:
        searches dispatch lock-free, so two concurrent callers could
        otherwise both start builders and the second's fresh
        touched-set would orphan the first's mutation log."""
        import cortex_tpu.vector.shard as shard_mod

        idx, _ = build(MIN_CAP - 8)         # >= 85% occupancy
        co = idx._corpus
        started = []

        class FakeThread:
            def __init__(self, *a, **k):
                started.append(k.get("name"))

            def start(self):
                pass

            def join(self, *a):
                pass

            def is_alive(self):
                return False

        monkeypatch.setattr(shard_mod.threading, "Thread", FakeThread)
        try:
            co._maybe_pregrow_host()
            co._maybe_pregrow_host()        # pending: must not respawn
        finally:
            co._pregrow_pending = False
        assert started == ["cortex-host-pregrow"]

    def test_pregrow_abandoned_when_capacity_changes_mid_build(self):
        idx, vecs = build(MIN_CAP)
        co = idx._corpus
        with co._lock:
            cap = co._cap
            co._pregrow_touched = set()
        # simulate: capacity changed under the builder's feet
        rng = np.random.default_rng(15)
        nv = rng.normal(size=(40, 16)).astype(np.float32)
        idx.insert_batch([f"g{i}" for i in range(40)], nv)  # grows now
        assert co._cap > cap
        co._pregrow_pending = True
        co._pregrow_pending = False
        # a build started at the OLD cap must not publish
        co._pregrown = None
        co._pregrow_host()                 # builds at the NEW cap fine
        assert co._pregrown is None or co._pregrown[0] == co._cap


class TestServerGrowthSoak:
    """Server-level: concurrent HTTP writes push the index across TWO
    capacity-ladder boundaries while searches run — the crossing must
    neither error, nor drop writes, nor fall back to a full device
    re-upload (the r3 mixed-workload finding)."""

    def test_http_load_across_ladder_crossings(self, monkeypatch):
        import asyncio
        from aiohttp.test_utils import TestClient, TestServer
        from cortex_tpu.api import Cortex
        from cortex_tpu.server.http import create_app
        from cortex_tpu.server.state import ServerState

        async def scenario():
            cx = Cortex.in_memory()
            state = ServerState(cortex=cx)
            state.enable_batched_admission(max_batch=8, max_wait_ms=2)
            state.enable_batched_search(max_batch=8, max_wait_ms=2)
            client = TestClient(TestServer(create_app(state)))
            await client.start_server()
            errors: list = []
            created: list = []

            # seed to just under capacity, then make the corpus
            # resident so the crossing exercises the device-pad path
            r = np.random.default_rng(0)
            ids = [f"seed{i}" for i in range(MIN_CAP - 16)]
            cx.index.insert_batch(
                ids, r.normal(size=(len(ids),
                                    cx.embedder.dimension)).astype(
                                        np.float32))
            cx.index.search_batch(
                r.normal(size=(1, cx.embedder.dimension)).astype(
                    np.float32), 5)
            co = cx.index._corpus
            uploads = []
            orig = DeviceCorpus._upload_full

            def spy(self, quant):
                uploads.append(True)
                return orig(self, quant)

            monkeypatch.setattr(DeviceCorpus, "_upload_full", spy)

            async def writer(wid):
                for i in range(MIN_CAP // 2):  # 2 writers -> +1024 rows
                    resp = await client.post(
                        "/nodes?gate=skip",
                        headers={"x-gate-override": "true"},
                        json={"kind": "fact",
                              "title": f"Grow soak w{wid} row {i} "
                                       f"topic {i % 7}",
                              "body": "A sufficiently long body for "
                                      f"writer {wid} entry {i}."})
                    if resp.status == 201:
                        created.append((await resp.json())["data"]["id"])
                    else:
                        errors.append(("write", resp.status))
                    if i % 64 == 0:
                        await asyncio.sleep(0)

            async def searcher():
                for i in range(60):
                    resp = await client.get(
                        "/search", params={"q": f"grow soak topic {i % 7}",
                                           "limit": 5})
                    if resp.status != 200:
                        errors.append(("search", resp.status))
                    else:
                        await resp.json()
                    await asyncio.sleep(0)

            await asyncio.gather(writer(0), writer(1),
                                 searcher(), searcher())
            assert not errors, errors[:5]
            assert co._cap >= 2 * MIN_CAP, "must have crossed the ladder"
            assert not uploads, \
                "ladder crossings must pad on device, not re-upload"
            # every accepted write is searchable at its exact title
            probe = created[-1]
            node = cx.get_node(probe)
            hits = await client.get("/search",
                                    params={"q": node.title, "limit": 3})
            got = {h["node"]["id"] for h in (await hits.json())["data"]}
            assert probe in got
            await client.close()

        asyncio.run(scenario())
