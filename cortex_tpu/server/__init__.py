from .metrics import CortexMetrics
from .observability import EventBus, EventBusHook, GraphEvent
from .state import ServerState

__all__ = ["CortexMetrics", "EventBus", "EventBusHook", "GraphEvent",
           "ServerState"]
