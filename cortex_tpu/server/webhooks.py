"""Webhook dispatch: mutation events POSTed to configured URLs.

Parity: reference [[webhooks]] config block (cortex-server config.rs).
A `WebhookHook` bridges the HookRegistry to HTTP like EventBusHook
bridges it to SSE: every node/edge mutation becomes a JSON POST,
fire-and-forget from a background worker thread (delivery failures are
logged-and-dropped, never block the write path).
"""

from __future__ import annotations

import json
import logging
import queue
import threading
from typing import List, Optional, Sequence

from ..hooks import MutationHook
from ..types import Edge, Node

log = logging.getLogger("cortex.webhooks")

QUEUE_CAP = 1024


class WebhookEndpoint:
    def __init__(self, url: str, events: Optional[Sequence[str]] = None,
                 timeout: float = 5.0):
        self.url = url
        self.events = set(events or ())      # empty = all events
        self.timeout = timeout

    def wants(self, event_type: str) -> bool:
        return not self.events or event_type in self.events


class WebhookHook(MutationHook):
    """Queues events; one daemon worker drains to all endpoints."""

    def __init__(self, endpoints: List[WebhookEndpoint], *,
                 transport=None):
        self.endpoints = endpoints
        self._q: "queue.Queue" = queue.Queue(maxsize=QUEUE_CAP)
        self._transport = transport or self._post
        self.delivered = 0
        self.dropped = 0
        self.failed = 0
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="cortex-webhooks")
        self._worker.start()

    # ------------------------------------------------------- hook surface
    def on_node_mutation(self, action: str, node: Node) -> None:
        self._enqueue(f"node_{action}", {
            "id": node.id, "kind": node.kind, "title": node.title})

    def on_edge_mutation(self, action: str, edge: Edge) -> None:
        self._enqueue(f"edge_{action}", {
            "id": edge.id, "from": edge.from_id, "to": edge.to_id,
            "relation": edge.relation, "weight": edge.weight})

    def _enqueue(self, event_type: str, data: dict) -> None:
        import time
        try:
            self._q.put_nowait({"event_type": event_type,
                                "timestamp": time.time(), "data": data})
        except queue.Full:
            self.dropped += 1

    # ------------------------------------------------------------ worker
    def _run(self) -> None:
        while True:
            ev = self._q.get()
            if ev is None:       # shutdown sentinel
                return
            body = json.dumps(ev).encode()
            for ep in self.endpoints:
                if not ep.wants(ev["event_type"]):
                    continue
                try:
                    self._transport(ep, body)
                    self.delivered += 1
                except Exception as e:  # noqa: BLE001 — never crash
                    self.failed += 1
                    log.debug("webhook %s failed: %s", ep.url, e)

    @staticmethod
    def _post(ep: WebhookEndpoint, body: bytes) -> None:
        import urllib.request
        req = urllib.request.Request(ep.url, data=body, method="POST")
        req.add_header("content-type", "application/json")
        with urllib.request.urlopen(req, timeout=ep.timeout):
            pass

    def close(self) -> None:
        # never block shutdown behind a full backlog draining through
        # slow endpoints: drop one queued event if needed to make room
        # for the sentinel (delivery is already best-effort/lossy)
        try:
            self._q.put_nowait(None)
        except queue.Full:
            try:
                self._q.get_nowait()
            except queue.Empty:
                pass
            try:
                self._q.put_nowait(None)
            except queue.Full:
                pass
        self._worker.join(timeout=2.0)


def from_config(webhook_configs) -> Optional[WebhookHook]:
    endpoints = [WebhookEndpoint(w.url, w.events)
                 for w in webhook_configs if w.url]
    return WebhookHook(endpoints) if endpoints else None
