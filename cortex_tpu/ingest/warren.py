"""Warren event ingest: tagged agent-system events -> nodes.

Parity: crates/warren-adapter/src/types.rs:7-60+ (`WarrenEvent` tagged
enum: stage.advanced, item.completed, evidence.submitted,
gate.approved/rejected, interaction.created, task.picked, ...) and the
NATS consumer (warren-adapter/src/nats.rs, cortex-server/src/nats/
ingest.rs). The NATS transport runs through the official `nats-py`
client when installed, falling back to the in-repo core-protocol
client (ingest/nats_client.py) otherwise; any other transport
(webhook, stdin JSONL with `type` fields, tests) can feed warren
events through the same conversion.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..types import Node, Source

# event type -> (node kind, importance)
_EVENT_MAP: Dict[str, tuple] = {
    "stage.advanced": ("event", 0.5),
    "item.completed": ("event", 0.6),
    "evidence.submitted": ("fact", 0.6),
    "gate.approved": ("decision", 0.7),
    "gate.rejected": ("decision", 0.7),
    "interaction.created": ("observation", 0.4),
    "task.picked": ("event", 0.4),
}


@dataclass
class WarrenEvent:
    """Tagged warren event (warren-adapter/src/types.rs:7-60)."""

    event_type: str
    agent: str = "warren"
    session: Optional[str] = None
    title: str = ""
    detail: str = ""
    tags: List[str] = field(default_factory=list)
    payload: Dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def from_json(d: Dict[str, Any]) -> "WarrenEvent":
        return WarrenEvent(
            event_type=d.get("type", d.get("event_type", "")),
            agent=d.get("agent", "warren"),
            session=d.get("session"),
            title=d.get("title", ""),
            detail=d.get("detail", d.get("body", "")),
            tags=list(d.get("tags", [])),
            payload=dict(d.get("payload", {})),
        )


def warren_event_to_node(ev: WarrenEvent) -> Optional[Node]:
    """Convert a warren event into a graph node; unknown event types are
    dropped (nats/ingest.rs log-and-skip posture)."""
    mapped = _EVENT_MAP.get(ev.event_type)
    if mapped is None:
        return None
    kind, importance = mapped
    title = ev.title or f"{ev.event_type} ({ev.agent})"
    body = ev.detail or title
    n = Node.new(kind, title[:256], body,
                 Source(agent=ev.agent, session=ev.session,
                        channel="warren"),
                 importance)
    n.tags = ["warren", ev.event_type.replace(".", "-")] + list(ev.tags)
    n.metadata = {"warren_event": ev.event_type, **ev.payload}
    return n
