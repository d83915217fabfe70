from .tracing import span, timed, profile_trace, SpanStats
from .device import preflight_device

__all__ = ["span", "timed", "profile_trace", "SpanStats",
           "preflight_device"]
