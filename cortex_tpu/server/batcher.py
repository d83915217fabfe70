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

    async def close(self) -> None:
        # let an in-flight flush finish (cancelling it would only force
        # the stranded-waiter path); then flush whatever is left
        if self._flusher is not None and not self._flusher.done():
            try:
                await self._flusher
            except Exception:  # noqa: BLE001
                pass
        await self._flush()
