"""Build + load the native graphcore library.

Compiles graphcore.cpp with the system g++ on first use (result cached
next to the source; rebuilt when the source is newer). No
pybind/setuptools: plain `g++ -O3 -shared -fPIC` + ctypes, per the
environment's native-toolchain constraints.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("cortex.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphcore.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def lib_path() -> str:
    return os.path.join(_DIR, "libgraphcore.so")


def _compile() -> bool:
    out = lib_path()
    try:
        if (os.path.exists(out)
                and os.path.getmtime(out) >= os.path.getmtime(_SRC)):
            return True
    except OSError:
        # .so present but the .cpp pruned (packaged deployment): the
        # existing library is usable — never crash the Python fallback
        # contract over a missing SOURCE file
        return os.path.exists(out)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", out, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.info("native graphcore unavailable (%s); using Python paths", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("CORTEX_NATIVE", "1") == "0":
            return None
        if not _compile():
            return None
        try:
            lib = ctypes.CDLL(lib_path())
        except OSError as e:
            log.info("failed to load graphcore: %s", e)
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gc_bfs.restype = ctypes.c_int64
        lib.gc_bfs.argtypes = [i32p, i32p, ctypes.c_int32, i32p,
                               ctypes.c_int32, ctypes.c_int32,
                               ctypes.c_int64, i32p, i32p]
        lib.gc_dijkstra_maxprod.restype = ctypes.c_int32
        lib.gc_dijkstra_maxprod.argtypes = [
            i32p, i32p, f32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double)]
        lib.gc_components.restype = ctypes.c_int32
        lib.gc_components.argtypes = [i32p, i32p, ctypes.c_int32, i32p]
        lib.gc_decay_sweep.restype = ctypes.c_int64
        lib.gc_decay_sweep.argtypes = [f32p, f32p, f32p, ctypes.c_int64,
                                       ctypes.c_float, ctypes.c_float, u8p]
        lib.gc_rerank_topk.restype = ctypes.c_int32
        lib.gc_rerank_topk.argtypes = [f32p, ctypes.c_int64,
                                       ctypes.c_int32, f32p,
                                       ctypes.c_int32, i32p,
                                       ctypes.c_int32, u8p,
                                       ctypes.c_int32, f32p, i32p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None
