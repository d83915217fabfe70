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
