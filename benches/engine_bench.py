"""Secondary benchmarks (BASELINE configs #1/#5 companions to the
headline bench.py): auto-link throughput, streaming ingest, decay
sweep. Prints one JSON line per metric.

Run: python benches/engine_bench.py [--n NODES]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.api import Cortex
from cortex_tpu.config import CortexConfig
from cortex_tpu.types import Edge, EdgeProvenance, Node, Source


_WORDS = [f"w{j:03d}" for j in range(400)]


def mknode(i, rng):
    # diverse synthetic corpus: wide vocabulary so pair similarity has a
    # realistic distribution (most ANN candidates fail the 0.75 link
    # threshold) — measuring the SCAN, not a degenerate everything-links
    # corpus that just benchmarks edge writes
    t = [_WORDS[int(x)] for x in rng.integers(0, len(_WORDS), 6)]
    # unique agent + sparse tags: the structural rules fire rarely, so
    # the metric measures the SCAN (search + rule evaluation), not the
    # per-cycle edge-write budget
    # no shared template words: shared tokens would give every pair a
    # high hash-embedding baseline similarity and re-degenerate the scan
    n = Node.new("fact", f"{t[0]} {t[1]} {t[2]} item{i}",
                 f"{' '.join(t)} detail{i}",
                 Source(agent=f"agent-{i}"), 0.5)
    n.tags = [t[0]]
    return n


def bench_ingest(cx, n, rng):
    nodes = [mknode(i, rng) for i in range(n)]
    t0 = time.perf_counter()
    B = 1000
    for i in range(0, n, B):
        cx.store_batch(nodes[i:i + B], actor="bench")
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"streaming ingest (store_batch, embed+persist+index)",
        "value": round(n / dt, 1), "unit": "inserts/sec",
        "vs_baseline": round((n / dt) / 33.0, 2),   # ~30ms/embed ref path
    }))
    return nodes


def bench_autolink(cx, new_count, rng):
    base = cx.stats().edge_count
    cx.linker.config.max_nodes_per_cycle = new_count
    # bulk-ingested nodes all fall in the temporal-proximity window, so
    # the default 2000-edge budget would stop the cycle after ~40 nodes
    # and the metric would measure the write cap, not the scan
    cx.linker.config.max_edges_per_cycle = 1_000_000
    # steady-state protocol: cycle_count > 0 so the periodic decay/dedup
    # passes (every 60 / 360 cycles) don't pollute the scan measurement,
    # and one warm-up cycle first so jit compiles are excluded — the
    # reference's ~1s/100-node figure is likewise steady-state
    cx.linker.cycle_count = 1
    warm = [mknode(20_000 + i, rng) for i in range(new_count)]
    cx.store_batch(warm, actor="bench")
    cx.run_linker_cycle()
    fresh = [mknode(10_000 + i, rng) for i in range(new_count)]
    cx.store_batch(fresh, actor="bench")
    t0 = time.perf_counter()
    m = cx.run_linker_cycle()
    dt = time.perf_counter() - t0
    pairs = m.cycle_nodes_processed * cx.linker.config.candidate_k
    print(json.dumps({
        "metric": f"auto-link scan ({m.cycle_nodes_processed} nodes x "
                  f"k={cx.linker.config.candidate_k}, "
                  f"{m.cycle_edges_created} edges created)",
        "value": round(pairs / dt, 1), "unit": "pairs/sec",
        "vs_baseline": round((pairs / dt) / 10_000.0, 2),
        # ref: ~1s per 100 nodes at k=100 => 10k pairs/s (ARCH.md:308)
    }))
    return base


def bench_decay(cx, rng):
    ids = [n.id for n in cx.list_nodes()][:2000]
    created = 0
    for i in range(0, len(ids) - 1, 1):
        if created >= 5000:
            break
        try:
            cx.storage.put_edge(Edge.new(
                ids[i], ids[(i * 7 + 1) % len(ids)], "related_to",
                float(rng.uniform(0.2, 1.0)),
                EdgeProvenance.auto_similarity(0.8)))
            created += 1
        except Exception:
            continue
    e = cx.stats().edge_count
    cx.linker.decay_engine.apply_decay(now=time.time() + 1 * 86400)  # warm
    t0 = time.perf_counter()
    cx.linker.decay_engine.apply_decay(now=time.time() + 40 * 86400)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"edge decay sweep over {e} edges",
        "value": round(e / dt, 1), "unit": "edges/sec",
        "vs_baseline": round((e / dt) / 100_000.0, 2),
        # ref: ~100ms / 10k edges => 100k edges/s (ARCH.md:309)
    }))


def bench_index_build(n, d, rng):
    """Index build wall-clock (BASELINE primary metric): cold device
    index from n stored embeddings + first search. The reference
    rebuilds HNSW at boot (serve.rs:100-123) with O(N log N) insert
    cost; here build = normalize + one device upload."""
    from cortex_tpu.vector import TpuFlatIndex
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    ids = [f"b{i}" for i in range(n)]
    # warm the jit caches at this capacity so the measured build is
    # upload + bookkeeping, not XLA compilation
    warm = TpuFlatIndex(d)
    warm.insert_batch(ids, vecs)
    warm.search_batch(vecs[:1], 10)
    t0 = time.perf_counter()
    idx = TpuFlatIndex(d)
    idx.insert_batch(ids, vecs)
    idx.search_batch(vecs[:1], 10)     # forces sync + dispatch
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"index build from {n}x{d} embeddings "
                  f"(upload + first search, compile excluded from rate)",
        "value": round(n / dt, 1), "unit": "vectors/sec",
        "vs_baseline": round((n / dt) / 5000.0, 2),
        # HNSW insert ~200us/vector at M=16 => ~5k vectors/s build
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--new", type=int, default=500)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    cfg = CortexConfig()
    cfg.auto_linker.interval_secs = 1e9
    cx = Cortex.in_memory(cfg)
    bench_ingest(cx, args.n, rng)
    bench_autolink(cx, args.new, rng)
    bench_decay(cx, rng)
    bench_index_build(100_000, 384, rng)


if __name__ == "__main__":
    main()
