"""Auto-linker: similarity links, structural rules, decay.

Parity: reference crates/cortex-core/examples/auto_linker.rs.
Run: python examples/auto_linker.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.api import Cortex


def main():
    cx = Cortex.in_memory()

    cx.store(Cortex.fact("Kubernetes pods restart on OOM"))
    cx.store(Cortex.fact("Pods get OOM-killed when memory limits are low"))
    cx.store(Cortex.observation(
        "The checkout service restarts nightly",
        "Observed the checkout pods cycling around 2am."))
    cx.store(Cortex.pattern(
        "Memory pressure causes pod churn",
        "Recurring: low limits -> OOM kills -> restart loops."))

    metrics = cx.run_linker_cycle()
    print(metrics.summary())

    for nid in [n.id for n in cx.list_nodes()]:
        for e in cx.storage.edges_from(nid):
            a = cx.get_node(e.from_id).title[:38]
            b = cx.get_node(e.to_id).title[:38]
            print(f"  {a!r} -[{e.relation} {e.weight:.2f} "
                  f"{e.provenance.kind}]-> {b!r}")

    cx.close()


if __name__ == "__main__":
    main()
