"""cortex_memory — Python SDK for the cortex_tpu graph memory engine.

Parity: reference sdks/python/cortex_memory/ (client.py:12-217,
testing.py:35+, models.py). Two modes:

- ``Cortex("http://host:9091")`` — remote client over REST (stdlib
  urllib only, zero dependencies).
- ``Cortex.open(path)`` — embedded library mode; imports the
  ``cortex_tpu`` engine in-process (the reference spawned a local
  server subprocess; in-process is the idiomatic Python equivalent
  since the engine IS Python).

``MockCortex`` / ``mock_cortex()`` give hermetic in-memory fakes for
agent tests, matching the reference testing module's substring-match
search semantics.
"""

from .client import Cortex, CortexClientError
from .models import Briefing, NodeData, SearchHit, TraversalResult
from .testing import MockCortex, mock_cortex

__all__ = [
    "Cortex", "CortexClientError",
    "NodeData", "SearchHit", "Briefing", "TraversalResult",
    "MockCortex", "mock_cortex",
]
__version__ = "0.1.0"
