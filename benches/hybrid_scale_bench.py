"""Hybrid search at scale (BASELINE config #4): 1M nodes / 5M edges,
vector top-50 x 2-hop anchor proximity, batch 64.

Legs, measured through the REAL engine components:
  vector   centered-int8 scan + exact re-rank candidates, 1M x 768
           (ops.similarity.cosine_topk_quant — the serving path)
  graph    DeviceGraphMirror.batch_graph_scores over a 5M-edge
           adjacency: the frontier host BFS (cost ~ deg^hops per
           anchor set, INDEPENDENT of N — the r2 routing fix; the r1
           device min-plus relaxation measured ~460ms/pass at 1M
           because XLA serializes the [N,deg] gather)
  combine  w*vec + (1-w)/(1+depth), final top-10 (numpy)

In pipelined serving the two legs overlap (host BFS during the device
scan), so sustained throughput is max(leg) and reported alongside the
strictly-sequential rate. Reference: per-query host flow at <100 QPS
class (ARCHITECTURE.md:306-307: <10ms search + <5ms BFS per query).

Run: python benches/hybrid_scale_bench.py [--nodes N] [--edges E]
"""

import argparse
import json
import os
import sys
import time
from collections import namedtuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cortex_tpu.graph.csr import DeviceGraphMirror
from cortex_tpu.ops.similarity import cosine_topk_quant

B, M, K, HOPS, ANCHORS = 64, 50, 10, 2, 4
ROUNDS = 30

E_ = namedtuple("E_", "neighbor")


class ShimCache:
    """AdjacencyCache-shaped view over a prebuilt edge array (the real
    cache builds the same dicts from storage; building 5M Edge rows in
    SQLite first would bench the loader, not the engine)."""

    def __init__(self, n, src, dst):
        self.version = 0
        ids = [f"n{i}" for i in range(n)]
        self._ids = ids
        self._out = {}
        self._in = {}
        for s, d in zip(src.tolist(), dst.tolist()):
            self._out.setdefault(ids[s], []).append(E_(ids[d]))
            self._in.setdefault(ids[d], []).append(E_(ids[s]))

    def outgoing(self, nid):
        return self._out.get(nid, [])

    def incoming(self, nid):
        return self._in.get(nid, [])

    def all_node_ids(self):
        return list({*self._out, *self._in})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--edges", type=int, default=5_000_000)
    ap.add_argument("--dim", type=int, default=768)
    args = ap.parse_args()
    n, e, d = args.nodes, args.edges, args.dim

    key = jax.random.PRNGKey(0)
    kc, kq, ke = jax.random.split(key, 3)
    corpus = jax.random.normal(kc, (n, d), jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    cc = corpus - jnp.mean(corpus, axis=0)[None, :]
    rscale = 127.0 / jnp.maximum(jnp.max(jnp.abs(cc), axis=1), 1e-12)
    c_i8 = jnp.clip(jnp.round(cc * rscale[:, None]), -127, 127
                    ).astype(jnp.int8)
    rinv = (1.0 / rscale).astype(jnp.float32)
    del cc

    rng = np.random.default_rng(0)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    t0 = time.perf_counter()
    cache = ShimCache(n, src, dst)
    mirror = DeviceGraphMirror(cache)
    build_s = time.perf_counter() - t0
    # the 10M-object adjacency graph otherwise makes every GC cycle a
    # multi-hundred-ms pause INSIDE the timing loops (the first run of
    # this bench read 403ms/batch on a 2ms scan because collections
    # triggered by np.asarray allocations scanned the whole cache);
    # production serve does the same after boot (server/serve.py)
    import gc
    gc.collect()
    gc.freeze()

    queries = jax.random.normal(kq, (B, d), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    q_h = np.asarray(queries)
    anchors = [f"n{i}" for i in
               rng.integers(0, n, ANCHORS)]

    gather_vecs = jax.jit(lambda c, r: c[r.reshape(-1)])

    def round_once():
        v, rows = cosine_topk_quant(c_i8, rinv, queries, M)
        cv = gather_vecs(corpus, rows)          # dispatched, async
        rows_h = np.asarray(rows)
        ids = [[f"n{r}" for r in rows_h[b]] for b in range(B)]
        gsc = mirror.batch_graph_scores(anchors, HOPS, ids)
        g = np.asarray(cv).reshape(B, M, d)
        exact = np.einsum("bmd,bd->bm", g, q_h)
        comb = 0.7 * exact + 0.3 * gsc
        order = np.argsort(-comb, axis=1)[:, :K]
        return np.take_along_axis(rows_h, order, axis=1)

    round_once()                                 # warm compiles
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        out = round_once()
    dt = (time.perf_counter() - t0) / ROUNDS
    seq_qps = B / dt

    # leg rates (pipelined serving sustains max(leg)); best of 3
    # repeats per leg — single tunnel-dispatched loops carry transient
    # multi-x jitter
    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, (time.perf_counter() - t0) / ROUNDS * 1000)
        return best

    def scan_loop():
        for _ in range(ROUNDS):
            v, _ = cosine_topk_quant(c_i8, rinv, queries, M)
        np.asarray(v[-1, -1])
    scan_ms = best_of(scan_loop)
    _, rows = cosine_topk_quant(c_i8, rinv, queries, M)
    rows_h = np.asarray(rows)
    ids = [[f"n{r}" for r in rows_h[b]] for b in range(B)]

    def bfs_loop():
        for _ in range(ROUNDS):
            mirror.batch_graph_scores(anchors, HOPS, ids)
    bfs_ms = best_of(bfs_loop)
    sustained = B / (max(scan_ms, bfs_ms) / 1000)

    print(json.dumps({
        "metric": f"hybrid search @ {n} nodes / {e} edges (vector "
                  f"top-{M} x {HOPS}-hop proximity from {ANCHORS} "
                  f"anchors, batch {B})",
        "value": round(sustained, 1), "unit": "queries/sec (sustained, "
                 "legs overlap)",
        "sequential_qps": round(seq_qps, 1),
        "scan_ms_per_batch": round(scan_ms, 2),
        "proximity_ms_per_batch": round(bfs_ms, 2),
        "adjacency_build_secs": round(build_s, 1),
        "vs_baseline": round(sustained / 100.0, 1)}), flush=True)


if __name__ == "__main__":
    main()
