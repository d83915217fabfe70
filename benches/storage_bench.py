"""Storage micro-benchmarks mirroring the reference criterion suite
(crates/cortex-core/benches/storage.rs:25-224: single insert,
lookup-by-id among 1k, batch-insert 1k, filter-by-kind, BFS traversal,
shortest path). Host-only, runs anywhere.

Run: python benches/storage_bench.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.graph import BOTH, GraphEngine, PathRequest, TraversalRequest
from cortex_tpu.storage import NodeFilter, SqliteStorage
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


def mknode(i):
    return Node.new("fact" if i % 3 else "decision",
                    f"bench node number {i}",
                    f"body of bench node {i} with enough text",
                    Source(agent=f"a{i % 5}"), 0.5)


def timed(metric, unit, fn, n_ops=1, reference_ops=None):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    rate = n_ops / dt
    out = {"metric": metric, "value": round(rate, 1), "unit": unit}
    if reference_ops:
        out["vs_baseline"] = round(rate / reference_ops, 2)
    print(json.dumps(out))


def main():
    with tempfile.TemporaryDirectory() as d:
        s = SqliteStorage(os.path.join(d, "bench.db"))
        nodes = [mknode(i) for i in range(1000)]

        timed("single node insert (durable)", "inserts/sec",
              lambda: s.put_node(mknode(9999)), 1,
              reference_ops=1000)     # ref claims <1ms => 1k/s

        timed("batch insert 1k (one txn)", "inserts/sec",
              lambda: s.put_nodes_batch(nodes), 1000)

        ids = [n.id for n in nodes]
        timed("lookup by id among 1k", "lookups/sec",
              lambda: [s.get_node(i) for i in ids], 1000,
              reference_ops=10_000)   # ref claims <0.1ms => 10k/s

        timed("filter by kind over 1k", "queries/sec",
              lambda: [s.list_nodes(NodeFilter(kinds=["decision"]))
                       for _ in range(50)], 50)

        # chain + cross edges for graph benches
        for a, b in zip(ids, ids[1:]):
            s.put_edge(Edge.new(a, b, "led_to", 0.9,
                                EdgeProvenance.manual("b")))
        g = GraphEngine(s)
        timed("BFS traversal depth 3", "traversals/sec",
              lambda: [g.traverse(TraversalRequest(
                  start=[ids[0]], max_depth=3, direction=BOTH))
                  for _ in range(50)], 50,
              reference_ops=200)      # ref claims <5ms => 200/s

        timed("shortest path across a 1k chain", "paths/sec",
              lambda: [g.find_paths(PathRequest(from_id=ids[0],
                                                to_id=ids[500]))
                       for _ in range(20)], 20)
        s.close()


if __name__ == "__main__":
    main()
