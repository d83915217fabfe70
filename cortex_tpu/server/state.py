"""Shared server state: the embedded Cortex + observability plumbing."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..api import Cortex
from .metrics import CortexMetrics
from .observability import EventBus, EventBusHook


@dataclass
class ServerState:
    cortex: Cortex
    metrics: CortexMetrics = field(default_factory=CortexMetrics)
    bus: EventBus = field(default_factory=EventBus)
    auth_token: Optional[str] = None
    batcher: Optional[object] = None         # EmbedBatcher, set by serve boot
    search_batcher: Optional[object] = None  # SearchBatcher, set by serve boot
    loop: Optional[object] = None            # serve's asyncio loop — lets
    #                                          thread-pool gRPC handlers join
    #                                          the shared search batches

    def __post_init__(self):
        self.cortex.add_hook(EventBusHook(self.bus))
        if self.auth_token is None:
            self.auth_token = self.cortex.config.security.auth_token

    def enable_batched_admission(self, *, max_batch: int = 64,
                                 max_wait_ms: float = 5.0) -> None:
        from .batcher import EmbedBatcher
        self.batcher = EmbedBatcher(self.cortex.embedder,
                                    max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)

    def enable_batched_search(self, *, max_batch: int = 64,
                              max_wait_ms: float = 3.0) -> None:
        from .batcher import SearchBatcher
        self.search_batcher = SearchBatcher(self.cortex.index,
                                            self.cortex.embedder,
                                            max_batch=max_batch,
                                            max_wait_ms=max_wait_ms)
