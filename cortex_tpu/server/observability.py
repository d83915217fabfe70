"""SSE event bus: every graph mutation streams to subscribers.

Parity: cortex-server/src/observability/mod.rs:9-87 — GraphEvent
{event_type, timestamp, data}; bounded broadcast bus (cap 1024, slow
subscribers drop); EventBusHook bridges the HookRegistry to the bus;
event types node/edge x created/updated/deleted; ?events= filtering at
the route layer.
"""

from __future__ import annotations

import asyncio
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..hooks import MutationHook
from ..types import Edge, Node

EVENT_TYPES = ["node_created", "node_updated", "node_deleted",
               "edge_created", "edge_updated", "edge_deleted"]


@dataclass
class GraphEvent:
    event_type: str
    timestamp: float
    data: Dict[str, Any]

    def to_sse(self) -> str:
        payload = json.dumps({"event_type": self.event_type,
                              "timestamp": self.timestamp,
                              "data": self.data})
        return f"event: {self.event_type}\ndata: {payload}\n\n"


class EventBus:
    """Fan-out bus with per-subscriber bounded queues.

    Thread model: hooks fire inside cx.store, which the server runs on
    WORKER THREADS (asyncio.to_thread, gRPC executors, linker cycles) —
    but asyncio.Queue is not thread-safe, and waking a blocked SSE
    getter from another thread schedules the callback without writing
    the loop's self-pipe (delivery stalls until the next unrelated
    wakeup, and a racing wait_for timeout can raise InvalidStateError).
    `attach_loop` pins the serving loop; off-loop publishes then hop
    through call_soon_threadsafe."""

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self._subs: List[asyncio.Queue] = []
        self._loop: Optional[asyncio.AbstractEventLoop] = None

    def attach_loop(self, loop: asyncio.AbstractEventLoop) -> None:
        self._loop = loop

    def subscribe(self) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue(maxsize=self.capacity)
        self._subs.append(q)
        if self._loop is None:
            # first subscriber on an unattached bus (embedded/test use):
            # adopt its running loop
            try:
                self._loop = asyncio.get_running_loop()
            except RuntimeError:
                pass
        return q

    def unsubscribe(self, q: asyncio.Queue) -> None:
        if q in self._subs:
            self._subs.remove(q)

    @property
    def subscriber_count(self) -> int:
        return len(self._subs)

    def publish(self, event: GraphEvent) -> None:
        loop = self._loop
        try:
            running = asyncio.get_running_loop()
        except RuntimeError:
            running = None
        if loop is not None and running is not loop and loop.is_running():
            loop.call_soon_threadsafe(self._fanout, event)
        else:
            self._fanout(event)

    def _fanout(self, event: GraphEvent) -> None:
        for q in list(self._subs):
            try:
                q.put_nowait(event)
            except asyncio.QueueFull:
                pass    # slow subscriber: drop (broadcast lag semantics)


class EventBusHook(MutationHook):
    """HookRegistry -> EventBus bridge (observability/mod.rs:48+)."""

    def __init__(self, bus: EventBus):
        self.bus = bus

    def on_node_mutation(self, action: str, node: Node) -> None:
        self.bus.publish(GraphEvent(
            event_type=f"node_{action}", timestamp=time.time(),
            data={"id": node.id, "kind": node.kind, "title": node.title}))

    def on_edge_mutation(self, action: str, edge: Edge) -> None:
        self.bus.publish(GraphEvent(
            event_type=f"edge_{action}", timestamp=time.time(),
            data={"id": edge.id, "from": edge.from_id, "to": edge.to_id,
                  "relation": edge.relation, "weight": edge.weight}))
