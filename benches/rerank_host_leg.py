"""Standalone host exact re-rank timing at the 10M mirror scale.

Pure numpy — no JAX in the process — so it can run beside a busy
device and measures exactly what the quant-only-residency serving path
pays per batch: gather CAND rows per query from a 30 GB fp32 mirror +
BLAS matvec + partial sort. Complements benches/scale10m_bench.py
--skip-host-leg (the device legs).

Run: python benches/rerank_host_leg.py [--rows 10000000]
"""

import argparse
import json
import sys
import time

import numpy as np

D, K, CAND = 768, 10, 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()
    n = args.rows

    t0 = time.perf_counter()
    mirror = np.empty((n, D), np.float32)
    block = np.random.default_rng(1).standard_normal(
        (1_000_000, D)).astype(np.float32)
    for s in range(0, n, len(block)):
        e = min(n, s + len(block))
        mirror[s:e] = block[:e - s]
    print(f"# {n}x{D} mirror ({n * D * 4 / 2**30:.1f} GiB) filled in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(2)
    for B in (64, 512):
        idx = rng.integers(0, n, size=(B, CAND)).astype(np.int64)
        q = rng.standard_normal((B, D)).astype(np.float32)

        def rerank():
            g = mirror[idx.reshape(-1)].reshape(B, CAND, D)
            exact = np.matmul(g, q[:, :, None])[:, :, 0]
            sel = np.argsort(-exact, axis=1)[:, :K]
            return np.take_along_axis(idx, sel, axis=1)

        rerank()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                rerank()
            best = min(best, (time.perf_counter() - t0) / 5)
        print(json.dumps({
            "metric": f"host exact re-rank vs {n}-row mirror, batch {B} "
                      f"(cand {CAND})",
            "value": round(best * 1e3, 3), "unit": "ms/batch",
            "qps_leg": round(B / best, 1)}), flush=True)


if __name__ == "__main__":
    main()
