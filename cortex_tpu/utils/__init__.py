from .tracing import span, timed, profile_trace, SpanStats

__all__ = ["span", "timed", "profile_trace", "SpanStats"]
