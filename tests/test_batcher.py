"""Batched-admission tests: concurrent writes share embed batches."""

import asyncio

import numpy as np
import pytest

from cortex_tpu.server.batcher import EmbedBatcher
from cortex_tpu.vector.embedding import HashingEmbedder


class CountingEmbedder(HashingEmbedder):
    def __init__(self):
        super().__init__(dim=32)
        self.calls = 0

    def embed_batch(self, texts):
        self.calls += 1
        return super().embed_batch(texts)


class TestEmbedBatcher:
    def test_concurrent_requests_share_one_batch(self):
        async def scenario():
            emb = CountingEmbedder()
            b = EmbedBatcher(emb, max_batch=64, max_wait_ms=20)
            outs = await asyncio.gather(
                *[b.embed(f"text number {i}") for i in range(10)])
            return emb, outs
        emb, outs = asyncio.run(scenario())
        assert emb.calls == 1               # ONE device call for all 10
        assert len(outs) == 10
        # results routed to the right waiters
        solo = HashingEmbedder(dim=32)
        np.testing.assert_allclose(outs[3], solo.embed("text number 3"),
                                   atol=1e-6)

    def test_full_batch_flushes_immediately(self):
        async def scenario():
            emb = CountingEmbedder()
            b = EmbedBatcher(emb, max_batch=4, max_wait_ms=10_000)
            outs = await asyncio.gather(
                *[b.embed(f"item {i}") for i in range(8)])
            return emb, outs
        emb, outs = asyncio.run(scenario())
        assert emb.calls == 2               # two full batches, no timeout
        assert len(outs) == 8

    def test_embedder_failure_propagates(self):
        class Broken:
            def embed_batch(self, texts):
                raise RuntimeError("device gone")

        async def scenario():
            b = EmbedBatcher(Broken(), max_batch=2, max_wait_ms=5)
            with pytest.raises(RuntimeError, match="device gone"):
                await asyncio.gather(b.embed("a"), b.embed("b"))
        asyncio.run(scenario())

    def test_http_write_path_uses_batcher(self):
        """End-to-end through the HTTP app with admission batching on."""
        from aiohttp.test_utils import TestClient, TestServer
        from cortex_tpu.api import Cortex
        from cortex_tpu.server.http import create_app
        from cortex_tpu.server.state import ServerState

        async def scenario():
            cx = Cortex.in_memory()
            state = ServerState(cortex=cx)
            state.enable_batched_admission(max_batch=8, max_wait_ms=10)
            client = TestClient(TestServer(create_app(state)))
            await client.start_server()
            try:
                resps = await asyncio.gather(*[
                    client.post("/nodes", json={
                        "kind": "fact",
                        "title": f"Concurrent write number {i}",
                        "body": "Body long enough for the write gate "
                                f"to accept entry {i}.",
                    }) for i in range(6)])
                assert all(r.status == 201 for r in resps)
                assert state.batcher.items == 6
                assert state.batcher.batches <= 2   # shared batches
                assert cx.stats().node_count == 6
                # stored nodes are searchable (embeddings correct)
                hits = cx.search("concurrent write number", limit=6)
                assert len(hits) == 6
                # admission batching surfaces in /metrics
                r = await client.get("/metrics")
                text = await r.text()
                assert "cortex_admission_items_total 6" in text
            finally:
                await state.batcher.close()
                await client.close()
        asyncio.run(scenario())


class CountingIndex:
    """Wraps a real index, counting search_batch dispatches."""

    def __init__(self, inner):
        self.inner = inner
        self.batch_calls = 0
        self.batch_sizes = []

    def __getattr__(self, name):
        return getattr(self.inner, name)

    def search_batch(self, vectors, k, flt=None):
        self.batch_calls += 1
        self.batch_sizes.append(len(vectors))
        return self.inner.search_batch(vectors, k, flt)


class TestSearchBatcher:
    def _cortex(self):
        from cortex_tpu.api import Cortex
        from cortex_tpu.types import Node, Source
        cx = Cortex.in_memory()
        for i in range(20):
            cx.store(Node.new("fact", f"Fact number {i} about topic {i % 4}",
                              f"The body of fact {i} long enough to pass "
                              "the write gate checks.",
                              Source(agent="test")))
        return cx

    def test_concurrent_searches_share_one_dispatch(self):
        from cortex_tpu.server.batcher import SearchBatcher

        async def scenario():
            cx = self._cortex()
            idx = CountingIndex(cx.index)
            b = SearchBatcher(idx, cx.embedder, max_batch=64,
                              max_wait_ms=20)
            outs = await asyncio.gather(
                *[b.search(f"topic {i % 4}", 9) for i in range(12)])
            return cx, idx, outs
        cx, idx, outs = asyncio.run(scenario())
        assert idx.batch_calls == 1          # ONE device scan for all 12
        assert idx.batch_sizes == [12]
        # each caller got exactly its own query's hits
        for i, hits in enumerate(outs):
            solo = cx.index.search(cx.embedder.embed(f"topic {i % 4}"), 9)
            assert [h[0] for h in hits] == [h[0] for h in solo]

    def test_filter_groups_dispatch_separately_but_share_embed(self):
        from cortex_tpu.server.batcher import SearchBatcher
        from cortex_tpu.vector import VectorFilter

        async def scenario():
            cx = self._cortex()
            idx = CountingIndex(cx.index)
            class CountingWrap:
                def __init__(self, inner):
                    self.inner, self.calls = inner, 0

                def embed_batch(self, texts):
                    self.calls += 1
                    return self.inner.embed_batch(texts)
            emb = CountingWrap(cx.embedder)
            b = SearchBatcher(idx, emb, max_batch=64, max_wait_ms=20)
            flt = VectorFilter(kinds=["fact"])
            outs = await asyncio.gather(
                b.search("topic 1", 5),
                b.search("topic 2", 8, flt),
                b.search("topic 3", 3, flt),
                b.search("topic 0", 5))
            return idx, emb, outs
        idx, emb, outs = asyncio.run(scenario())
        assert emb.calls == 1                # one embed batch for all 4
        assert idx.batch_calls == 2          # one scan per filter group
        assert sorted(idx.batch_sizes) == [2, 2]
        # per-request k respected within the shared (kmax) scan
        assert len(outs[1]) == 8 and len(outs[2]) == 3

    def test_batched_result_equals_direct_search(self):
        """Through finish_search the batched path must produce exactly
        what Cortex.search produces (scores and order)."""
        from cortex_tpu.server.batcher import SearchBatcher

        async def scenario():
            cx = self._cortex()
            b = SearchBatcher(cx.index, cx.embedder, max_batch=8,
                              max_wait_ms=10)
            qs = [f"fact number {i}" for i in range(6)]
            raw = await asyncio.gather(
                *[b.search(q, cx.overfetch_k(4)) for q in qs])
            batched = [cx.finish_search(r, 4, record_access=False)
                       for r in raw]
            direct = [cx.search(q, 4, record_access=False) for q in qs]
            return batched, direct
        batched, direct = asyncio.run(scenario())
        for got, want in zip(batched, direct):
            assert [(n.id, pytest.approx(s, abs=1e-5)) for s, n in got] \
                == [(n.id, s) for s, n in want]

    def test_http_search_uses_batcher(self):
        from aiohttp.test_utils import TestClient, TestServer
        from cortex_tpu.server.http import create_app
        from cortex_tpu.server.state import ServerState

        async def scenario():
            cx = self._cortex()
            state = ServerState(cortex=cx)
            state.enable_batched_search(max_batch=8, max_wait_ms=10)
            client = TestClient(TestServer(create_app(state)))
            await client.start_server()
            try:
                resps = await asyncio.gather(*[
                    client.get(f"/search?q=topic+{i % 4}&limit=3")
                    for i in range(8)])
                assert all(r.status == 200 for r in resps)
                bodies = [await r.json() for r in resps]
                assert all(len(b["data"]) == 3 for b in bodies)
                assert state.search_batcher.items == 8
                assert state.search_batcher.batches <= 2
                r = await client.get("/metrics")
                assert "cortex_search_batch_items_total 8" in await r.text()
            finally:
                await state.search_batcher.close()
                await client.close()
        asyncio.run(scenario())

    def test_index_failure_propagates_to_all_waiters(self):
        from cortex_tpu.server.batcher import SearchBatcher

        class Boom:
            def search_batch(self, vectors, k, flt=None):
                raise RuntimeError("scan failed")

        async def scenario():
            b = SearchBatcher(Boom(), HashingEmbedder(dim=16),
                              max_batch=4, max_wait_ms=5)
            with pytest.raises(RuntimeError, match="scan failed"):
                await asyncio.gather(b.search("a", 3), b.search("b", 3))
        asyncio.run(scenario())


class TestGrpcSearchThroughBatcher:
    def test_grpc_search_joins_shared_batches(self):
        """A gRPC SimilaritySearch routed through a running event loop
        coalesces with the HTTP batcher and returns exactly what the
        direct path returns."""
        import threading
        import grpc as _grpc
        from cortex_tpu.api import Cortex
        from cortex_tpu.server import cortex_pb2 as pb
        from cortex_tpu.server.grpc_service import (GrpcClient,
                                                    create_grpc_server)
        from cortex_tpu.server.state import ServerState
        from cortex_tpu.types import Node, Source

        cx = Cortex.in_memory()
        for i in range(12):
            cx.store(Node.new("fact", f"Grpc batch fact {i}",
                              f"Body long enough for checks {i}.",
                              Source(agent="t")))
        state = ServerState(cortex=cx)
        state.enable_batched_search(max_batch=8, max_wait_ms=5)
        idx = CountingIndex(cx.index)
        state.search_batcher.index = idx

        loop = __import__("asyncio").new_event_loop()
        t = threading.Thread(target=loop.run_forever, daemon=True)
        t.start()
        state.loop = loop
        server = create_grpc_server(state, addr="127.0.0.1:0")
        port = server.add_insecure_port("127.0.0.1:0")
        server.start()
        client = GrpcClient(f"127.0.0.1:{port}")
        try:
            resp = client.SimilaritySearch(pb.SimilaritySearchRequest(
                query="grpc batch fact", limit=3))
            assert len(resp.hits) == 3
            assert idx.batch_calls == 1          # went through the batcher
            direct = cx.search("grpc batch fact", 3, record_access=False)
            assert [h.node.title for h in resp.hits] \
                == [n.title for _, n in direct]
        finally:
            client.close()
            server.stop(0)
            loop.call_soon_threadsafe(loop.stop)
            t.join(timeout=5)

    def test_grpc_search_falls_back_without_loop(self):
        """No running loop (plain test rig): the direct path serves."""
        from cortex_tpu.api import Cortex
        from cortex_tpu.server import cortex_pb2 as pb
        from cortex_tpu.server.grpc_service import (GrpcClient,
                                                    create_grpc_server)
        from cortex_tpu.server.state import ServerState
        from cortex_tpu.types import Node, Source

        cx = Cortex.in_memory()
        cx.store(Node.new("fact", "Fallback path fact title",
                          "Body long enough for the gate checks.",
                          Source(agent="t")))
        state = ServerState(cortex=cx)
        state.enable_batched_search()           # batcher set, but no loop
        server = create_grpc_server(state, addr="127.0.0.1:0")
        port = server.add_insecure_port("127.0.0.1:0")
        server.start()
        client = GrpcClient(f"127.0.0.1:{port}")
        try:
            resp = client.SimilaritySearch(pb.SimilaritySearchRequest(
                query="fallback path", limit=1))
            assert len(resp.hits) == 1
        finally:
            client.close()
            server.stop(0)


class TestFlushRearm:
    """Regression: a request arriving WHILE a flush awaits the device
    saw a not-yet-done flusher task and scheduled nothing — with no
    later traffic it stranded forever (observed as wedged tail
    requests under live gRPC/HTTP load)."""

    def test_embed_arrival_during_flush_not_stranded(self):
        import time as _t

        class SlowEmbedder(HashingEmbedder):
            def __init__(self):
                super().__init__(dim=16)
                self.calls = 0

            def embed_batch(self, texts):
                self.calls += 1
                _t.sleep(0.08)          # keep the first flush in flight
                return super().embed_batch(texts)

        async def scenario():
            emb = SlowEmbedder()
            b = EmbedBatcher(emb, max_batch=64, max_wait_ms=1)
            first = asyncio.create_task(b.embed("first request text"))
            await asyncio.sleep(0.03)   # flush now awaiting the embedder
            second = asyncio.create_task(b.embed("second request text"))
            # NO further traffic — the second must still complete
            outs = await asyncio.wait_for(
                asyncio.gather(first, second), timeout=5)
            return emb, outs
        emb, outs = asyncio.run(scenario())
        assert emb.calls == 2
        assert len(outs) == 2

    def test_search_arrival_during_flush_not_stranded(self):
        import time as _t
        from cortex_tpu.server.batcher import SearchBatcher

        class SlowIndex:
            def __init__(self, inner):
                self.inner = inner

            def search_batch(self, vectors, k, flt=None):
                _t.sleep(0.08)
                return self.inner.search_batch(vectors, k, flt)

        async def scenario():
            cx = TestSearchBatcher._cortex(TestSearchBatcher())
            b = SearchBatcher(SlowIndex(cx.index), cx.embedder,
                              max_batch=64, max_wait_ms=1)
            first = asyncio.create_task(b.search("topic 0", 5))
            await asyncio.sleep(0.03)
            second = asyncio.create_task(b.search("topic 1", 5))
            outs = await asyncio.wait_for(
                asyncio.gather(first, second), timeout=5)
            return outs
        outs = asyncio.run(scenario())
        assert len(outs) == 2 and all(len(o) == 5 for o in outs)
