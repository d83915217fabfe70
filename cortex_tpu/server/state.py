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

    def __post_init__(self):
        self.cortex.add_hook(EventBusHook(self.bus))
        if self.auth_token is None:
            self.auth_token = self.cortex.config.security.auth_token
