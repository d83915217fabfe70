"""Tracing / profiling utilities.

Parity: reference tracing + per-cycle Instant timing + Prometheus
histograms (SURVEY §5: tracing-subscriber at main.rs:24-29, linker
timing auto_linker.rs:186,203). Here: `span()` timed-scope logging with
aggregate stats, and `profile_trace()` wrapping `jax.profiler` for
device timeline capture (the rebuild's flamegraph analog).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator

log = logging.getLogger("cortex.trace")


@dataclass
class SpanStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return (self.total_s / self.count * 1e3) if self.count else 0.0


_stats: Dict[str, SpanStats] = defaultdict(SpanStats)


def stats() -> Dict[str, SpanStats]:
    return dict(_stats)


def reset_stats() -> None:
    _stats.clear()


@contextlib.contextmanager
def span(name: str, *, level: int = logging.DEBUG) -> Iterator[None]:
    """Timed scope: logs duration and feeds the aggregate table."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _stats[name]
        s.count += 1
        s.total_s += dt
        s.max_s = max(s.max_s, dt)
        log.log(level, "%s took %.1fms", name, dt * 1e3)


def timed(name: str = ""):
    """Decorator form of span()."""
    def deco(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with span(label):
                return fn(*args, **kwargs)
        return wrapper
    return deco


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX device profile (TensorBoard trace) for the scope.
    No-ops gracefully when the profiler can't start (e.g. nested)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # noqa: BLE001
        log.warning("profiler unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # noqa: BLE001
                pass
