"""Batched admission: concurrent write requests share one embed batch.

SURVEY §3.2's TPU consequence: the reference embeds per request
(~30ms CPU ONNX each); here concurrent `POST /nodes` handlers queue
their texts and a micro-batcher flushes them as ONE `embed_batch`
device call when the batch fills or a few milliseconds elapse —
per-request latency stays flat while write throughput scales with
batch size instead of dispatch count.
"""

from __future__ import annotations

import asyncio
from typing import List, Optional, Tuple

import numpy as np


class EmbedBatcher:
    def __init__(self, embedder, *, max_batch: int = 64,
                 max_wait_ms: float = 5.0):
        self.embedder = embedder
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._pending: List[Tuple[str, asyncio.Future]] = []
        self._flusher: Optional[asyncio.Task] = None
        self.batches = 0
        self.items = 0

    async def embed(self, text: str) -> np.ndarray:
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._pending.append((text, fut))
        if len(self._pending) >= self.max_batch:
            await self._flush()
        elif self._flusher is None or self._flusher.done():
            self._flusher = asyncio.create_task(self._delayed_flush())
        return await fut

    async def _delayed_flush(self) -> None:
        await asyncio.sleep(self.max_wait)
        await self._flush()

    async def _flush(self) -> None:
        if not self._pending:
            return
        batch, self._pending = self._pending, []
        texts = [t for t, _ in batch]
        try:
            embs = await asyncio.to_thread(self.embedder.embed_batch,
                                           texts)
            self.batches += 1
            self.items += len(batch)
            for j, (_, fut) in enumerate(batch):
                if not fut.done():
                    fut.set_result(np.asarray(embs[j], np.float32))
        except BaseException as e:  # incl. CancelledError — a swapped
            for _, fut in batch:    # batch must never strand its waiters
                if not fut.done():
                    fut.set_exception(
                        e if isinstance(e, Exception)
                        else RuntimeError("embed batch cancelled"))
            if not isinstance(e, Exception):
                raise
        finally:
            # items that arrived WHILE this flush awaited saw a
            # not-yet-done flusher task and scheduled nothing — without
            # this re-arm they strand forever if no later request comes
            if self._pending:
                self._flusher = asyncio.create_task(self._delayed_flush())

    async def close(self) -> None:
        # let in-flight (possibly re-armed) flushes finish — cancelling
        # one mid-batch would error its waiters — then drain leftovers;
        # finally cancel an idle re-armed flusher so loop teardown
        # doesn't log a destroyed-pending-task warning
        for _ in range(16):
            f = self._flusher
            if f is not None and not f.done():
                try:
                    await f
                except Exception:  # noqa: BLE001
                    pass
            if self._pending:
                await self._flush()
            f = self._flusher
            if (f is None or f.done()) and not self._pending:
                return
        if self._flusher is not None and not self._flusher.done():
            self._flusher.cancel()


def _filter_key(flt) -> tuple:
    """Canonical grouping key for a VectorFilter: the device scan's
    masks are per-batch, so only identically-filtered queries can share
    a dispatch."""
    if flt is None:
        return ()
    return (tuple(sorted(flt.kinds)) if flt.kinds else None,
            flt.source_agent,
            tuple(sorted(flt.exclude_ids)) if flt.exclude_ids else None)


class SearchBatcher:
    """Read-side coalescing: concurrent search requests arriving within
    a few ms share ONE embed_batch + ONE search_batch device dispatch
    per filter group. The reference serves each query as its own HNSW
    walk (http/routes.rs:887-988); on TPU a [B,d]x[d,N] batched scan
    costs barely more than [1,d] — the bench-measured batch-64 rate is
    ~36k QPS vs ~2-3k at batch 1 through a dispatch-latency-bound
    transport — so the server should aggregate its own concurrency
    instead of paying one dispatch per request.

    Per-request tails (decay re-rank, node hydration, access recording)
    stay per-caller: this only shares the device work.
    """

    def __init__(self, index, embedder, *, max_batch: int = 64,
                 max_wait_ms: float = 3.0):
        self.index = index
        self.embedder = embedder
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._pending: List[Tuple[str, int, object, asyncio.Future]] = []
        self._flusher: Optional[asyncio.Task] = None
        self.batches = 0
        self.items = 0

    async def search(self, text: str, k: int, flt=None):
        """Returns the [(node_id, score)] hit list for this query alone."""
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self._pending.append((text, k, flt, fut))
        if len(self._pending) >= self.max_batch:
            await self._flush()
        elif self._flusher is None or self._flusher.done():
            self._flusher = asyncio.create_task(self._delayed_flush())
        return await fut

    async def _delayed_flush(self) -> None:
        await asyncio.sleep(self.max_wait)
        await self._flush()

    async def _flush(self) -> None:
        if not self._pending:
            return
        batch, self._pending = self._pending, []
        try:
            embs = await asyncio.to_thread(
                self.embedder.embed_batch, [t for t, _, _, _ in batch])
            embs = np.asarray(embs, np.float32)
            groups: dict = {}
            for j, (_, k, flt, _) in enumerate(batch):
                groups.setdefault(_filter_key(flt), []).append(j)
            for idx in groups.values():
                flt = batch[idx[0]][2]
                kmax = max(batch[j][1] for j in idx)
                rows = await asyncio.to_thread(
                    self.index.search_batch, embs[idx], kmax, flt)
                for j, hits in zip(idx, rows):
                    fut = batch[j][3]
                    if not fut.done():
                        fut.set_result(hits[:batch[j][1]])
            self.batches += 1
            self.items += len(batch)
        except BaseException as e:
            for _, _, _, fut in batch:
                if not fut.done():
                    fut.set_exception(
                        e if isinstance(e, Exception)
                        else RuntimeError("search batch cancelled"))
            if not isinstance(e, Exception):
                raise
        finally:
            # re-arm for items that arrived while this flush awaited
            # (they saw a not-yet-done flusher and scheduled nothing)
            if self._pending:
                self._flusher = asyncio.create_task(self._delayed_flush())

    async def close(self) -> None:
        # same drain discipline as EmbedBatcher.close
        for _ in range(16):
            f = self._flusher
            if f is not None and not f.done():
                try:
                    await f
                except Exception:  # noqa: BLE001
                    pass
            if self._pending:
                await self._flush()
            f = self._flusher
            if (f is None or f.done()) and not self._pending:
                return
        if self._flusher is not None and not self._flusher.done():
            self._flusher.cancel()
