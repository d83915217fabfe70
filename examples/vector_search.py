"""Vector search: filters, thresholds, hybrid fusion.

Parity: reference crates/cortex-core/examples/vector_search.rs.
Run: python examples/vector_search.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.vector import VectorFilter


def main():
    cx = Cortex.in_memory()

    notes = [
        ("fact", "Redis caches session tokens",
         "The session layer stores short-lived tokens in redis."),
        ("fact", "Postgres holds the user table",
         "Primary user records live in the postgres users table."),
        ("decision", "Adopt redis for rate limiting",
         "Rate limiting uses redis sliding-window counters."),
        ("event", "Cache outage on Tuesday",
         "The redis cluster failed over during the Tuesday incident."),
    ]
    ids = [cx.store(Cortex._make(k, t, b, 0.6)) for k, t, b in notes]

    print("-- plain search --")
    for score, n in cx.search("redis cache", limit=3):
        print(f"  {score:.3f}  [{n.kind}] {n.title}")

    print("-- kind-filtered (facts only) --")
    for score, n in cx.search("redis cache", limit=3,
                              flt=VectorFilter(kinds=["fact"])):
        print(f"  {score:.3f}  [{n.kind}] {n.title}")

    print("-- hybrid: anchored to the outage event --")
    for r in cx.search_hybrid("redis", anchors=[ids[3]], limit=3):
        print(f"  combined={r.combined_score:.3f} "
              f"(vec={r.vector_score:.3f} graph={r.graph_score:.3f}) "
              f"{r.node.title}")

    cx.close()


if __name__ == "__main__":
    main()
