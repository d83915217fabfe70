"""Regression tests for the round-2 advisor findings (ADVICE.md r2).

1. (medium) linker/dedup store+index mutations run under the Cortex
   persist lock, so a concurrent index-snapshot capture can never
   certify an index missing a node whose index_seq bump it records.
2. (low) live snapshot checkpoints honor snapshot_min_delta; clean
   close still saves any change.
3. (low) gRPC batched search falls back to the direct path when the
   batcher is closed (shutdown race), not INTERNAL.
4. (low) malformed token_cost / response_time_ms observations return
   400, not 500.
5. (low) host frontier BFS clamps to the device path's 8-hop ceiling
   so hybrid graph scores do not depend on the routing heuristic.
"""

import asyncio
import json
import os
import threading
import time

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from cortex_tpu.api import Cortex
from cortex_tpu.server.http import create_app
from cortex_tpu.server.state import ServerState
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def _node(title, agent="t", kind="fact", embedding=None):
    n = Node.new(kind, title, f"{title} body text", Source(agent=agent))
    n.embedding = embedding
    return n


class TestLinkerPersistLock:
    def test_linker_and_dedup_share_cortex_lock(self):
        cx = Cortex.in_memory()
        assert cx.linker.persist_lock is cx._persist_lock

    def test_ensure_embeddings_blocks_on_persist_lock(self):
        """The store+index pair in the linker's embedding backfill must
        not interleave with a snapshot capture holding the lock."""
        cx = Cortex.in_memory()
        raw = _node("node stored without an embedding yet")
        cx.storage.put_node(raw)            # bypasses the index on purpose
        assert raw.id not in cx.index

        entered = threading.Event()
        done = threading.Event()

        def backfill():
            entered.set()
            cx.linker._ensure_embeddings([raw])
            done.set()

        with cx._persist_lock:
            t = threading.Thread(target=backfill, daemon=True)
            t.start()
            entered.wait(5)
            time.sleep(0.2)
            # lock held -> neither the store write landed in the index
            # nor is the pair half-applied
            assert not done.is_set()
            assert raw.id not in cx.index
        t.join(5)
        assert done.is_set()
        assert raw.id in cx.index

    def test_dedup_merge_holds_lock(self):
        cx = Cortex.in_memory()
        a = _node("duplicate content about the same exact topic")
        b = _node("duplicate content about the same exact topic!")
        cx.store(a)
        cx.store(b)
        from cortex_tpu.linker.dedup import DedupScanner
        scanner = DedupScanner(cx.storage, cx.index,
                               cx.config.auto_linker.similarity,
                               persist_lock=cx._persist_lock)
        assert scanner.persist_lock is cx._persist_lock
        scanner.merge_nodes(a.id, b.id)
        # pair applied atomically: tombstone and index removal agree
        assert cx.storage.get_node(b.id).deleted
        assert b.id not in cx.index


class TestSnapshotMinDelta:
    def test_live_checkpoint_skips_small_delta(self, tmp_path):
        db = str(tmp_path / "c.db")
        cx = Cortex.open(db)
        cx.store(_node("first node for the snapshot test"))
        cx.save_index_snapshot()            # close-style: always saves
        meta_path = db + ".index.npz.meta"
        with open(meta_path) as f:
            seq0 = json.load(f)["index_seq"]

        cx.store(_node("second node, a single mutation"))
        cx.save_index_snapshot(min_delta=64)    # live checkpoint: skip
        with open(meta_path) as f:
            assert json.load(f)["index_seq"] == seq0

        cx.save_index_snapshot()            # close-style: must save now
        # published as an incremental delta against the unchanged base
        from cortex_tpu.vector.index import TpuFlatIndex
        dmeta = TpuFlatIndex.read_delta_meta(db + ".index.npz.delta.npz")
        assert dmeta["base_seq"] == seq0
        assert dmeta["index_seq"] > seq0
        with open(meta_path) as f:
            assert json.load(f)["index_seq"] == seq0   # base untouched
        cx.close()

    def test_boot_uses_snapshot_after_delta_skip(self, tmp_path):
        """A skipped live checkpoint leaves a stale marker; boot must
        detect the seq mismatch and rebuild, never load it silently."""
        db = str(tmp_path / "c.db")
        cx = Cortex.open(db)
        cx.store(_node("node one for boot test"))
        cx.save_index_snapshot()
        n2 = _node("node two, after the snapshot")
        cx.store(n2)
        cx.storage.close()                  # crash: no close-time save

        cx2 = Cortex.open(db)               # stale marker -> rebuild
        assert n2.id in cx2.index
        cx2.close()


class TestGrpcBatcherClosedFallback:
    def test_search_falls_back_when_batcher_closed(self):
        """A RuntimeError from the coalescer (racing shutdown) serves
        via the direct path instead of propagating INTERNAL."""
        from cortex_tpu.server import cortex_pb2 as pb
        from cortex_tpu.server.grpc_service import CortexServiceImpl

        cx = Cortex.in_memory()
        cx.store(_node("searchable content for the fallback test"))

        from cortex_tpu.server.batcher import BatcherClosed

        class ClosedBatcher:
            async def search(self, *a, **k):
                raise BatcherClosed("batcher is closed")

        state = ServerState(cortex=cx)
        state.search_batcher = ClosedBatcher()

        async def run():
            state.loop = asyncio.get_running_loop()
            svc = CortexServiceImpl(state)
            req = pb.SimilaritySearchRequest(query="searchable content",
                                             limit=5)
            # handler runs on a gRPC worker thread in production
            return await asyncio.to_thread(svc.SimilaritySearch, req, None)
        resp = asyncio.run(run())
        assert len(resp.hits) >= 1


class TestObserveBadMetrics:
    def _post(self, payload):
        async def s():
            cx = Cortex.in_memory()
            cx.store(Cortex.agent("kai", "Kai the test agent"))
            from cortex_tpu.prompt import PromptContent
            pid = cx.prompts.create_prompt(PromptContent(slug="helper"))
            cx.create_edge(Edge.new(
                next(n for n in cx.list_nodes() if n.kind == "agent").id,
                pid, "uses", 0.5, EdgeProvenance.manual("t")))
            payload.setdefault("variant_id", pid)
            client = TestClient(TestServer(create_app(ServerState(cx))))
            await client.start_server()
            try:
                r = await client.post("/agents/kai/observe", json=payload)
                return r.status
            finally:
                await client.close()
        return asyncio.run(s())

    def test_non_integer_token_cost_400(self):
        assert self._post({"sentiment_score": 0.5,
                           "token_cost": "abc"}) == 400

    def test_list_response_time_400(self):
        assert self._post({"sentiment_score": 0.5,
                           "response_time_ms": [1, 2]}) == 400

    def test_numeric_strings_accepted(self):
        assert self._post({"sentiment_score": 0.5, "token_cost": "120",
                           "response_time_ms": 45}) == 200


class TestHostBfsHopClamp:
    def test_host_path_clamps_to_device_ceiling(self):
        cx = Cortex.in_memory()
        ids = []
        for i in range(12):
            n = _node(f"chain member number {i} of the hop clamp test")
            cx.store(n)
            ids.append(n.id)
        for a, b in zip(ids, ids[1:]):
            cx.create_edge(Edge.new(a, b, "led_to", 0.5,
                                    EdgeProvenance.manual("t")))
        cx.graph.invalidate()
        depths = cx.mirror.depths_from([ids[0]], max_hops=11)
        assert depths[ids[8]] == 8          # at the ceiling: present
        assert ids[9] not in depths         # beyond HOP_CAP: clamped
        per = cx.mirror.per_anchor_depths([ids[0]], max_hops=11)
        assert ids[9] not in per
