"""Graph queries: traversal, paths, analytics, query DSL.

Parity: reference crates/cortex-core/examples/graph_queries.rs.
Run: python examples/graph_queries.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.graph import BOTH, PathRequest, TraversalRequest
from cortex_tpu.types import Edge, EdgeProvenance


def main():
    cx = Cortex.in_memory()

    # a small decision chain
    d1 = cx.store(Cortex.decision("Pick gRPC for the wire",
                                  "gRPC chosen for typed contracts."))
    d2 = cx.store(Cortex.decision("Generate SDKs from proto",
                                  "SDKs are generated from the schema."))
    e1 = cx.store(Cortex.event("First SDK released",
                               "The python SDK shipped to users."))
    cx.create_edge(Edge.new(d1, d2, "led_to", 0.9,
                            EdgeProvenance.manual("ex")))
    cx.create_edge(Edge.new(d2, e1, "led_to", 0.8,
                            EdgeProvenance.manual("ex")))

    sub = cx.traverse(TraversalRequest(start=[d1], max_depth=3,
                                       direction=BOTH))
    print(f"traverse from d1: {len(sub.nodes)} nodes "
          f"(depths {sorted(sub.depths.values())})")

    result = cx.find_paths(PathRequest(from_id=d1, to_id=e1))
    for p in result.paths:
        print(f"path ({len(p.nodes)} nodes, weight {p.total_weight:.2f}):",
              " -> ".join(n[:8] for n in p.nodes))

    print("components:", [len(c) for c in cx.graph.components()])
    print("most connected:", [(i[:8], d)
                              for i, d in cx.graph.most_connected(3)])

    print("DSL query:", [n.title for n in cx.query("kind:decision")])

    cx.close()


if __name__ == "__main__":
    main()
