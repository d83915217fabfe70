"""Per-agent briefing cache: hit requires graph-version match AND TTL
freshness (crates/cortex-core/src/briefing/cache.rs:5-49)."""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, Optional, TYPE_CHECKING

if TYPE_CHECKING:
    from .engine import Briefing


@dataclass
class _Entry:
    briefing: "Briefing"
    stored_at: float
    graph_version: int


class BriefingCache:
    def __init__(self, ttl_secs: float = 300.0):
        self.ttl = ttl_secs
        self._entries: Dict[str, _Entry] = {}

    def get(self, agent_id: str, current_version: int) -> Optional["Briefing"]:
        e = self._entries.get(agent_id)
        if e is None:
            return None
        if e.graph_version != current_version:
            return None
        if time.monotonic() - e.stored_at >= self.ttl:
            return None
        return e.briefing

    def put(self, agent_id: str, briefing: "Briefing", version: int) -> None:
        self._entries[agent_id] = _Entry(
            briefing=briefing, stored_at=time.monotonic(),
            graph_version=version)

    def invalidate(self, agent_id: str) -> None:
        self._entries.pop(agent_id, None)
