"""BASELINE config #2: 100k nodes x 384d, a 1,000-query batched stream.

Streams 1k queries through the REAL serving index (DeviceCorpus via
TpuFlatIndex, centered storage, serving search path) in batches of 64,
measuring sustained QPS and recall@10 against the BruteForceIndex
fp32 oracle on the same data. The reference's equivalent is its HNSW
(`instant-distance`) at default build params, whose recall is tuned,
not exact; the flat serving path's recall target here is 1.0.

Run: python benches/query_stream_bench.py [--nodes 100000] [--dim 384]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cortex_tpu.vector.index import BruteForceIndex, TpuFlatIndex

B, K, NQ = 64, 10, 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    args = ap.parse_args()
    n, d = args.nodes, args.dim

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = [f"n{i}" for i in range(n)]
    kinds = ["fact"] * n
    agents = ["bench"] * n

    idx = TpuFlatIndex(dim=d)
    t0 = time.perf_counter()
    idx.insert_batch(ids, vecs, kinds=kinds, agents=agents)
    build_s = time.perf_counter() - t0

    queries = rng.normal(size=(NQ, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    idx.search_batch(queries[:B], K)          # warm compile
    # pipelined stream, per-batch drain: dispatch every batch
    # back-to-back (device execution is in-order), then fetch each
    # batch's result — each fetch pays a host<->device round trip,
    # which dominates through a network-tunneled TPU (RTT ~100x the
    # scan itself)
    t0 = time.perf_counter()
    pending = [idx.search_batch_async(queries[s:s + B], K)
               for s in range(0, NQ, B)]
    per_batch = []
    for f in pending:
        per_batch.extend(f())
    per_batch_s = time.perf_counter() - t0

    # single-drain stream (r3): all chunks dispatched, results
    # concatenated ON DEVICE, one fetch — transport cost is one RTT
    # for the whole stream, so this reflects engine capability
    idx.search_stream(queries, K)   # warm the stream-chunk compile
    t0 = time.perf_counter()
    got = idx.search_stream(queries, K)
    stream_s = time.perf_counter() - t0

    # --- RTT accounting (r3 VERDICT #6): the numbers above measure a
    # network-tunneled device; a deployment co-locates the host with
    # the chip. Three measured ingredients make the engine-attached
    # projection explicit instead of hand-waved:
    #   rtt_s           — measured tunnel round-trip (tiny dispatch +
    #                     scalar fetch, p50 of 30)
    #   device_stream_s — device execution per full 1k-query stream,
    #                     amortized: M streams' chunks dispatched
    #                     back-to-back in-order, ONE drain at the end,
    #                     total/M (transport leaves the loop)
    #   projection      — NQ / (device_stream_s + LOCAL_RTT_S), where
    #                     LOCAL_RTT_S is a documented PCIe-class
    #                     dispatch+fetch allowance (0.5 ms — generous;
    #                     measured local JAX dispatch overhead is
    #                     ~0.1-0.3 ms)
    import jax.numpy as jnp
    probe = jnp.zeros((), jnp.float32)
    rtts = []
    for i in range(30):
        t0r = time.perf_counter()
        np.asarray(probe + np.float32(i))
        rtts.append(time.perf_counter() - t0r)
    rtt_s = sorted(rtts)[len(rtts) // 2]

    M = 5
    t0 = time.perf_counter()
    pend = []
    for _ in range(M):
        pend += [idx.search_batch_async(queries[s:s + B], K)
                 for s in range(0, NQ, B)]
    pend[-1]()                       # in-order: drains every stream
    device_stream_s = (time.perf_counter() - t0) / M
    LOCAL_RTT_S = 0.0005
    engine_attached_qps = NQ / (device_stream_s + LOCAL_RTT_S)

    # recall vs the fp32 oracle on a query subsample (oracle is host
    # numpy — full 1k x 100k on host is slow but exact)
    oracle = BruteForceIndex(dim=d)
    oracle.insert_batch(ids[:n], vecs, kinds=kinds, agents=agents)
    sample = range(0, NQ, 20)                  # 50 queries
    hits = 0
    for qi in sample:
        want = {h[0] for h in oracle.search(queries[qi], K)}
        have = {h[0] for h in got[qi][:K]}
        hits += len(want & have)
    recall = hits / (len(list(sample)) * K)

    print(json.dumps({
        "metric": f"query stream @ {n}x{d} (1,000 queries, top-{K}, "
                  f"serving path, single drain)",
        "value": round(NQ / stream_s, 1),
        "unit": "queries/sec",
        "recall_at_10_vs_fp32_oracle": round(recall, 4),
        "per_batch_drain_qps": round(NQ / per_batch_s, 1),
        "index_build_secs": round(build_s, 2),
        "tunnel_rtt_ms_p50": round(rtt_s * 1e3, 1),
        "device_stream_ms": round(device_stream_s * 1e3, 1),
        "engine_attached_qps_at_0.5ms_rtt": round(engine_attached_qps, 1),
        "vs_baseline": round(NQ / stream_s / 100.0, 1)}), flush=True)


if __name__ == "__main__":
    main()
