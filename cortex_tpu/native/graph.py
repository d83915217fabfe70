"""Numpy-facing wrappers over the native graph kernels.

Each wrapper returns None when the native library is unavailable so
callers fall back to their Python implementation.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from .build import load


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bfs_depths(indptr: np.ndarray, indices: np.ndarray,
               sources: np.ndarray, *, max_depth: int = -1,
               max_visited: int = 0, want_parents: bool = False
               ) -> Optional[Tuple[np.ndarray, bool, Optional[np.ndarray]]]:
    """Multi-source BFS over CSR. Returns (depths [-1=unreached],
    truncated, parents|None) or None without the native lib."""
    lib = load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    sources = np.ascontiguousarray(sources, np.int32)
    depths = np.empty(n, np.int32)
    parents = np.empty(n, np.int32) if want_parents else None
    rc = lib.gc_bfs(_i32(indptr), _i32(indices), n, _i32(sources),
                    len(sources), max_depth, max_visited, _i32(depths),
                    _i32(parents) if parents is not None else None)
    return depths, rc < 0, parents


def dijkstra_maxprod(indptr: np.ndarray, indices: np.ndarray,
                     weights: np.ndarray, src: int, dst: int, *,
                     max_len: int = 0
                     ) -> Optional[Tuple[np.ndarray, float]]:
    """Max-product path src->dst. Returns (node_rows, product) with an
    empty array when unreachable, or None without the native lib."""
    lib = load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    cap = n + 1
    out = np.empty(cap, np.int32)
    w = ctypes.c_double(0.0)
    ln = lib.gc_dijkstra_maxprod(_i32(indptr), _i32(indices),
                                 _f32(weights), n, src, dst, max_len,
                                 _i32(out), cap, ctypes.byref(w))
    if ln <= 0:
        return np.empty(0, np.int32), 0.0
    return out[:ln].copy(), float(w.value)


def components_native(indptr: np.ndarray, indices: np.ndarray
                      ) -> Optional[np.ndarray]:
    """Connected-component labels over an undirected CSR, or None."""
    lib = load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    comp = np.empty(n, np.int32)
    lib.gc_components(_i32(indptr), _i32(indices), n, _i32(comp))
    return comp


def rerank_topk_native(corpus: np.ndarray, queries: np.ndarray,
                       cand_rows: np.ndarray, valid: np.ndarray,
                       k: int) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded exact fp32 re-rank of [B, cand] candidate rows against
    the corpus mirror. Returns (scores [B,k], rows [B,k]) — invalid
    slots score -1e30 — or None without the native lib. Tie order
    matches numpy's stable argsort of -scores."""
    lib = load()
    if lib is None:
        return None
    corpus = np.ascontiguousarray(corpus, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    cand_rows = np.ascontiguousarray(cand_rows, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    b, cand = cand_rows.shape
    scores = np.empty((b, k), np.float32)
    rows = np.empty((b, k), np.int32)
    lib.gc_rerank_topk(
        _f32(corpus), corpus.shape[0], corpus.shape[1], _f32(queries),
        b, _i32(cand_rows), cand,
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), k,
        _f32(scores), _i32(rows))
    return scores, rows


def decay_sweep_native(weights: np.ndarray, eff_rates: np.ndarray,
                       days: np.ndarray, delete_below: float,
                       prune_below: float
                       ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """In-place decay over [E] edge arrays. Returns (new_weights, flags
    [0 keep / 1 prune / 2 delete]) or None without the native lib."""
    lib = load()
    if lib is None:
        return None
    weights = np.ascontiguousarray(weights, np.float32)
    eff_rates = np.ascontiguousarray(eff_rates, np.float32)
    days = np.ascontiguousarray(days, np.float32)
    flags = np.empty(weights.shape[0], np.uint8)
    lib.gc_decay_sweep(
        _f32(weights), _f32(eff_rates), _f32(days), weights.shape[0],
        delete_below, prune_below,
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return weights, flags
