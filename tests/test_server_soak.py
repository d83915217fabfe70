"""Server-level mixed soak: concurrent writes, searches, and deletes
through the real HTTP app with BOTH batchers on — stresses the
admission batcher, the search batcher's flush re-arm, and the
store→index visibility discipline under churn.

In-process complement to tests/test_concurrency_soak.py (which drives
the embedded API); this one goes through the aiohttp handlers, so the
asyncio interleavings of the coalescing paths are exercised.
"""

import asyncio
import random

import pytest


class TestServerSoak:
    def test_mixed_http_load_consistency(self):
        from aiohttp.test_utils import TestClient, TestServer
        from cortex_tpu.api import Cortex
        from cortex_tpu.server.http import create_app
        from cortex_tpu.server.state import ServerState

        async def scenario():
            cx = Cortex.in_memory()
            state = ServerState(cortex=cx)
            state.enable_batched_admission(max_batch=8, max_wait_ms=3)
            state.enable_batched_search(max_batch=8, max_wait_ms=3)
            client = TestClient(TestServer(create_app(state)))
            await client.start_server()
            rng = random.Random(42)
            created: list = []
            deleted: set = set()
            errors: list = []

            async def writer(wid):
                for i in range(25):
                    r = await client.post(
                        "/nodes?gate=skip",
                        headers={"x-gate-override": "true"},
                        json={"kind": "fact",
                              "title": f"Soak fact w{wid} i{i} "
                                       f"topic {i % 5}",
                              "body": "A body long enough for the "
                                      f"checks, writer {wid} entry {i}."})
                    if r.status == 201:
                        created.append((await r.json())["data"]["id"])
                    else:
                        errors.append(("write", r.status))
                    await asyncio.sleep(0)

            async def searcher(sid):
                for i in range(40):
                    r = await client.get(
                        "/search",
                        params={"q": f"soak topic {i % 5}", "limit": 5})
                    if r.status != 200:
                        errors.append(("search", r.status))
                    else:
                        await r.json()
                    await asyncio.sleep(0)

            async def deleter():
                for _ in range(15):
                    await asyncio.sleep(0.01)
                    if created:
                        nid = rng.choice(created)
                        if nid in deleted:
                            continue
                        r = await client.delete(f"/nodes/{nid}")
                        if r.status == 200:
                            deleted.add(nid)
                        elif r.status != 404:
                            errors.append(("delete", r.status))

            try:
                await asyncio.wait_for(asyncio.gather(
                    *[writer(w) for w in range(4)],
                    *[searcher(s) for s in range(4)],
                    deleter()), timeout=120)

                assert errors == [], errors[:5]
                live = {nid for nid in created if nid not in deleted}
                # exact store/index agreement after the dust settles
                # (the r1 soak allowed an off-by-one; exactness is the
                # r2 bar)
                assert cx.stats().node_count == len(live)
                assert len(cx.index) == len(live)
                for nid in deleted:
                    assert nid not in cx.index
                # deleted nodes never come back from search
                hits = cx.search("soak topic", limit=100,
                                 record_access=False)
                returned = {n.id for _, n in hits}
                assert not (returned & deleted)
                assert returned <= live
                # both batchers actually coalesced under this load
                assert state.batcher.items >= 100
                assert state.search_batcher.items >= 160
                assert state.search_batcher.batches \
                    < state.search_batcher.items
            finally:
                await state.batcher.close()
                await state.search_batcher.close()
                await client.close()
        asyncio.run(scenario())
