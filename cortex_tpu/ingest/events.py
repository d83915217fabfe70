"""Ingest abstraction: events in, nodes out.

Parity: cortex-core/src/ingest.rs:10-40 (`IngestEvent`, `IngestAdapter`
trait) and cortex-server/src/ingest/stdin.rs (JSONL-on-stdin adapter).
Adapters normalize an external payload to an `IngestEvent`; the serve
loop converts events to nodes and batch-stores them (one device embed
per batch — the idiomatic TPU admission path instead of the reference's
per-event embed).
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Iterator, List, Optional

from ..types import Node, Source


@dataclass
class IngestEvent:
    """Normalized external event (ingest.rs:10-28)."""

    kind: str
    title: str
    body: str = ""
    agent: str = "ingest"
    session: Optional[str] = None
    channel: Optional[str] = None
    importance: float = 0.5
    tags: List[str] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)

    def to_node(self) -> Node:
        n = Node.new(self.kind, self.title, self.body or self.title,
                     Source(agent=self.agent, session=self.session,
                            channel=self.channel),
                     self.importance)
        n.tags = list(self.tags)
        n.metadata = dict(self.metadata)
        return n

    @staticmethod
    def from_json(d: Dict[str, Any]) -> "IngestEvent":
        return IngestEvent(
            kind=d.get("kind", "event"),
            title=d.get("title", ""),
            body=d.get("body", ""),
            agent=d.get("agent", d.get("source_agent", "ingest")),
            session=d.get("session"),
            channel=d.get("channel"),
            importance=float(d.get("importance", 0.5)),
            tags=list(d.get("tags", [])),
            metadata=dict(d.get("metadata", {})),
        )


class IngestAdapter:
    """Source of IngestEvents (ingest.rs:33-40)."""

    name: str = "adapter"

    def poll(self) -> List[IngestEvent]:  # pragma: no cover - interface
        raise NotImplementedError


class StdinJsonlAdapter(IngestAdapter):
    """Reads JSONL events from a stream, one event per line
    (cortex-server/src/ingest/stdin.rs). Malformed lines are skipped,
    not fatal — matches the reference's log-and-continue posture."""

    name = "stdin"

    def __init__(self, stream=None):
        self.stream = stream if stream is not None else sys.stdin
        self.errors = 0

    def iter_events(self) -> Iterator[IngestEvent]:
        for line in self.stream:
            line = line.strip()
            if not line:
                continue
            try:
                yield IngestEvent.from_json(json.loads(line))
            except (json.JSONDecodeError, TypeError, ValueError):
                self.errors += 1

    def poll(self) -> List[IngestEvent]:
        return list(self.iter_events())
