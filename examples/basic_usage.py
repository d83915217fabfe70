"""Basic embedded usage — store, search, relate, traverse.

Parity: reference crates/cortex-core/examples/basic_usage.rs, in the
framework's host language. Run: python examples/basic_usage.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.types import Edge, EdgeProvenance


def main():
    cx = Cortex.in_memory()

    # store typed memories
    decision = Cortex.decision(
        "Use blue-green deployments",
        "We deploy with blue-green switchover and automated rollback.")
    event = Cortex.event(
        "v2.1 deployed to production",
        "The v2.1 release went out via the blue-green path at 14:02.")
    fact = Cortex.fact("The deploy pipeline runs on region us-east1")
    for node in (decision, event, fact):
        cx.store(node)
    print(f"stored {cx.stats().node_count} nodes")

    # relate them
    cx.create_edge(Edge.new(decision.id, event.id, "led_to", 0.8,
                            EdgeProvenance.manual("example")))

    # semantic search (device cosine + decay re-rank)
    for score, node in cx.search("how do we deploy releases", limit=3):
        print(f"  {score:.3f}  [{node.kind}] {node.title}")

    # graph traversal
    sub = cx.neighborhood(decision.id, depth=1)
    print(f"neighborhood of decision: {len(sub.nodes)} nodes, "
          f"{len(sub.edges)} edges")

    cx.close()


if __name__ == "__main__":
    main()
