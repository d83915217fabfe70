"""Native host kernels (C++/ctypes) with build-on-demand and Python
fallback.

`load()` returns the ctypes library or None; callers must keep a pure
Python/numpy path (the native tier is an accelerator, never a
dependency). Set CORTEX_NATIVE=0 to disable.
"""

from .build import available, lib_path, load
from .graph import (bfs_depths, components_native, dijkstra_maxprod,
                    decay_sweep_native, rerank_topk_native)

__all__ = ["available", "lib_path", "load", "bfs_depths",
           "components_native", "dijkstra_maxprod", "decay_sweep_native",
           "rerank_topk_native"]
